import os
import sys

# Tests run on a virtual 8-device CPU mesh so sharding logic is exercised
# without TPU hardware.  The axon sitecustomize pins jax_platforms to
# "axon,cpu" at interpreter start, so we must override the live config, not
# just the env var.
plat = os.environ.get("OPUS_TPU_TEST_PLATFORM", "cpu")
os.environ["JAX_PLATFORMS"] = plat
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", plat)

# the fused on-device codec graphs are large; cache compilations across
# test processes so the cost is paid once per machine
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
