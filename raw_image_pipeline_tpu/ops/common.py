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
