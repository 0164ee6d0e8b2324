"""HSV color enhancement (reference: modules/color_enhancer.cpp:38-47).

BGR -> HSV (u8), per-channel gain multiply with cv::multiply rounding
(round-half-even + saturate, verified exact vs cv2), HSV -> BGR.

Note the reference's gain plumbing is cross-wired (setHueGain writes
value_gain_ etc., color_enhancer.cpp:23-33 — SURVEY.md §8.4). This op takes
the three gains at face value; the pipeline layer decides how config keys
map onto them.

Multiplying H by a gain wraps hue mod 256 in u8 arithmetic only via
saturation in the reference (cv::multiply saturates, it does not wrap); we
saturate identically.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from raw_image_pipeline_tpu.ops.colorspace import (
    bgr_to_hsv_planes,
    bgr_to_hsv_u8,
    hsv_to_bgr_planes,
    hsv_to_bgr_u8,
)
from raw_image_pipeline_tpu.ops.common import round_u8


def enhance_planes(b: jax.Array, g: jax.Array, r: jax.Array, gains: jax.Array):
    """Planar form: three u8 planes -> three u8 planes. Same arithmetic as
    `enhance` (the packed op slices/stacks around the same planar cores)."""
    f32 = jnp.float32
    h, s, v = bgr_to_hsv_planes(b, g, r)
    # materialize the forward half (same finding as vignetting's
    # correct_planes: the fully-fused HSV roundtrip mega-kernel is slower
    # than two passes — in-chain 1469 -> 1440 us/frame at 1080p B=128).
    # Identity op; bit-exactness unaffected.
    h, s, v = jax.lax.optimization_barrier((h, s, v))
    h = round_u8(h.astype(f32) * gains[0].astype(f32))
    s = round_u8(s.astype(f32) * gains[1].astype(f32))
    v = round_u8(v.astype(f32) * gains[2].astype(f32))
    return hsv_to_bgr_planes(h, s, v)


@jax.jit
def enhance(image: jax.Array, gains: jax.Array) -> jax.Array:
    """image: [..., 3] uint8 BGR; gains: [3] float (hue, saturation, value)."""
    hsv = bgr_to_hsv_u8(image)
    scaled = round_u8(hsv.astype(jnp.float32) * gains.astype(jnp.float32))
    return hsv_to_bgr_u8(scaled)
