"""opus-tpu: a TPU-native (JAX/XLA/Pallas) audio codec framework with the
capabilities of xiph/opus (RFC 6716 / RFC 8251 + the 1.5-era neural extensions).

Layering (mirrors the reference layer map in SURVEY.md §1, re-designed TPU-first):

- ``opus_tpu.bitstream``  — range coder, Laplace coder, packet/TOC/extension layer
  (exact integer domain; host-side scalar + batched variants).
- ``opus_tpu.celt``       — the MDCT transform codec core (mode tables, MDCT,
  band energies, allocation, PVQ, synthesis).
- ``opus_tpu.silk``       — the LPC speech codec core.
- ``opus_tpu.dnn``        — the neural extension stack (DRED/RDOVAE, FARGAN deep
  PLC, OSCE enhancement) as batched JAX modules.
- ``opus_tpu.ops``        — shared numeric kernels (FFT/MDCT, fixed-point helpers,
  Pallas kernels for the hot loops).
- ``opus_tpu.parallel``   — mesh/sharding utilities: streams are the batch axis,
  sharded over devices with ``jax.sharding``.
- ``opus_tpu.models``     — top-level OpusEncoder/OpusDecoder state machines and
  the multistream/projection layers.
"""

__version__ = "0.1.0"
