"""Video scaler (K22 / reference scaler.cpp analog): separable fixed-point
polyphase resize, batched elementwise — VPU work on TPU via the xp dual path.

Bicubic (Catmull-Rom, a=-0.5) kernel sampled at 32 phases, 4 taps, 7-bit
fixed point — matching the reference scaler's precision class.
"""

from __future__ import annotations

import numpy as np

PHASES = 32
TAPS = 4
PREC = 7           # coefficient fixed-point bits


def _cubic(x: float, a: float = -0.5) -> float:
    x = abs(x)
    if x < 1.0:
        return (a + 2) * x ** 3 - (a + 3) * x ** 2 + 1
    if x < 2.0:
        return a * x ** 3 - 5 * a * x ** 2 + 8 * a * x - 4 * a
    return 0.0


def _filter_bank() -> np.ndarray:
    """[PHASES, TAPS] int coefficients summing to 1<<PREC per phase."""
    bank = np.zeros((PHASES, TAPS), np.int32)
    for p in range(PHASES):
        frac = p / PHASES
        w = np.array([_cubic(frac + 1), _cubic(frac), _cubic(1 - frac),
                      _cubic(2 - frac)])
        w = w / w.sum()
        q = np.round(w * (1 << PREC)).astype(np.int32)
        q[1] += (1 << PREC) - q.sum()        # exact DC preservation
        bank[p] = q
    return bank


_BANK = _filter_bank()


def _resize_axis(plane, dst: int, xp):
    """Resize the last axis from src to dst with the polyphase bank."""
    src = plane.shape[-1]
    if dst == src:
        return plane
    # source position of each dst sample (center-aligned mapping)
    pos = (xp.arange(dst) + 0.5) * (src / dst) - 0.5
    base = xp.floor(pos).astype(xp.int32)
    phase = xp.clip((((pos - base) * PHASES) + 0.5).astype(xp.int32), 0,
                    PHASES - 1)
    bank = _BANK if xp is np else xp.asarray(_BANK)
    coef = bank[phase]                               # [dst, TAPS]
    idx = base[:, None] + xp.arange(-1, TAPS - 1)[None, :]
    idx = xp.clip(idx, 0, src - 1)                   # edge replicate
    gathered = xp.take(plane, idx, axis=-1)          # [..., dst, TAPS]
    acc = (gathered.astype(xp.int32) * coef).sum(axis=-1)
    return xp.right_shift(acc + (1 << (PREC - 1)), PREC)


def resize_plane(plane, dst_h: int, dst_w: int, bit_depth: int = 8, xp=np):
    """Bicubic resize of one [H, W] plane (or batched [..., H, W])."""
    p = plane.astype(xp.int32)
    p = _resize_axis(p, dst_w, xp)
    p = xp.swapaxes(_resize_axis(xp.swapaxes(p, -1, -2), dst_h, xp), -1, -2)
    return xp.clip(p, 0, (1 << bit_depth) - 1)


def resize_frame(y, u, v, dst_w: int, dst_h: int, bit_depth: int = 8, xp=np):
    """4:2:0 frame resize; chroma planes scale to the halved geometry."""
    dt = y.dtype
    return (resize_plane(y, dst_h, dst_w, bit_depth, xp).astype(dt),
            resize_plane(u, dst_h // 2, dst_w // 2, bit_depth, xp).astype(dt),
            resize_plane(v, dst_h // 2, dst_w // 2, bit_depth, xp).astype(dt))
