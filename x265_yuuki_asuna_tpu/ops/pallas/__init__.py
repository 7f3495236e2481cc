"""Pallas TPU kernels (SURVEY.md L7 hot ops).

Contents:
  me_sad — K1 displacement-sweep SAD kernel (VMEM-resident reference rows,
           manual DMA, VPU block reductions); parity-tested against the
           XLA sweep in tests/test_pallas_me.py.

Runtime gating: the axon tunnel backend does not always lower Pallas, so
kernels are opt-in via ASUNA_PALLAS=1 (checked in ops/me.sad_sweep_multi);
bench.py may enable it after a canary compile succeeds on the attached
device.
"""

from . import me_sad  # noqa: F401
