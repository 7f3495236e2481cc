"""Pallas ME sweep kernel (ops/pallas/me_sad): parity with the XLA
formulation, including MV tie-breaking — run in interpret mode on CPU
(the kernel language's portable executor; real-TPU execution is gated at
runtime in ops/me)."""
import numpy as np
import pytest

import jax.numpy as jnp

from x265_yuuki_asuna_tpu.ops import me
from x265_yuuki_asuna_tpu.ops.pallas.me_sad import sad_sweep_multi_pallas


def test_pallas_sweep_matches_xla():
    rng = np.random.default_rng(2)
    H, W, R = 64, 96, 6
    src = rng.integers(0, 256, (H, W)).astype(np.int32)
    # reference = shifted src + noise so real motion exists
    ref = np.roll(src, (2, -3), (0, 1))
    ref[20:40, 30:60] = rng.integers(0, 256, (20, 30))
    a = me.sad_sweep_multi(jnp.asarray(ref), jnp.asarray(src),
                           (8, 16, 32), R, lambda_bits=2)
    b = sad_sweep_multi_pallas(jnp.asarray(ref), jnp.asarray(src),
                               (8, 16, 32), R, lambda_bits=2,
                               interpret=True)
    for n in (8, 16, 32):
        for i, name in enumerate(("mvx", "mvy", "sad")):
            assert np.array_equal(np.asarray(a[n][i]), np.asarray(b[n][i])), \
                f"size {n} {name} differs"
