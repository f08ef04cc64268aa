import os
import sys

# Tests run on a virtual 8-device CPU mesh so sharding logic is exercised
# without TPU hardware.  The axon sitecustomize pins jax_platforms to
# "axon,cpu" at interpreter start, so we must override the live config, not
# just the env var.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
