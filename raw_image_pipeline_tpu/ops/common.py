"""Shared fixed-point helpers matching OpenCV integer conventions."""

from __future__ import annotations

import jax.numpy as jnp


def descale(x, n: int):
    """OpenCV CV_DESCALE: (x + (1 << (n-1))) >> n (round half up for x>=0)."""
    return (x + (1 << (n - 1))) >> n


def avg2(a, b):
    """(a + b + 1) >> 1 in integer dtype (OpenCV bilinear demosaic rounding)."""
    return (a + b + 1) >> 1


def avg4(a, b, c, d):
    """(a + b + c + d + 2) >> 2 (OpenCV bilinear demosaic rounding)."""
    return (a + b + c + d + 2) >> 2


def saturate_u8(x):
    """Clamp an integer/float array to [0, 255] and cast to uint8."""
    return jnp.clip(x, 0, 255).astype(jnp.uint8)


def round_u8(x):
    """OpenCV saturate_cast<uchar>(float): rint (half-to-even) then clamp.

    jnp.rint uses round-half-to-even, same as cvRound on x86.
    """
    return jnp.clip(jnp.rint(x), 0, 255).astype(jnp.uint8)


def lut_select(idx, table):
    """table[idx] via a binary select tree instead of a gather.

    XLA's TPU gather runs at scalar rate (~9 ns/element — 56 ms/frame for a
    256-entry LUT at 1080p); a log2(n)-deep tree of elementwise selects on
    the index bits fuses into a single VPU pass and is effectively free.
    `table` may be a traced array (each entry becomes a traced scalar), so
    LUT contents stay runtime parameters — no recompile when values change.

    idx: integer array, values in [0, len(table)); table: 1-D, length a
    power of two (pad with the last entry if needed).
    """
    n = table.shape[0]
    assert n & (n - 1) == 0, f"table length {n} must be a power of two"
    cur = [table[i] for i in range(n)]
    level = 0
    while len(cur) > 1:
        b = (idx >> level) & 1
        cur = [jnp.where(b == 0, cur[i], cur[i + 1]) for i in range(0, len(cur), 2)]
        level += 1
    return cur[0]
