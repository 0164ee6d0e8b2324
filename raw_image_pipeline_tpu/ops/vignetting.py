"""Polynomial vignetting correction (reference: modules/vignetting_correction.cpp).

Mask: k(r) = a2*r^2 + a4*r^4 with r the distance from the image center,
normalized by its max, scaled, plus one (vignetting_correction.cpp:32-63).
Apply: BGR -> Lab, L(float32) * mask, saturate back to u8, Lab -> BGR
(vignetting_correction.cpp:68-93).

The reference recomputes the mask every frame for non-square images due to
a swapped cache-guard (line 33, SURVEY.md §8.5) — output-invariant, so we
fix it: the mask is precomputed once on host (float64, like the reference's
double loop) and closed over as a constant.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from raw_image_pipeline_tpu.ops.colorspace import (
    bgr_to_lab_planes,
    bgr_to_lab_u8,
    lab_to_bgr_planes,
    lab_to_bgr_u8,
)
from raw_image_pipeline_tpu.ops.common import round_u8


def build_vignetting_mask(height: int, width: int, scale: float, a2: float, a4: float) -> np.ndarray:
    """[H, W] float32 multiplier mask (host-side, init time)."""
    cy = height / 2.0
    cx = width / 2.0
    y = np.arange(height, dtype=np.float64)[:, None]
    x = np.arange(width, dtype=np.float64)[None, :]
    r2 = (y - cy) ** 2 + (x - cx) ** 2
    k = r2 * a2 + r2 * r2 * a4
    mx = k.max()
    if mx > 0:
        k = k / mx
    k = k * scale + 1.0
    return k.astype(np.float32)


def correct_planes(b: jax.Array, g: jax.Array, r: jax.Array, mask: jax.Array):
    """Planar form: three u8 planes + broadcast-compatible f32 mask ->
    three u8 planes. Same arithmetic as `correct` (bit-identical; the
    packed op slices/stacks around the same planar cores)."""
    L, a, bb = bgr_to_lab_planes(b, g, r)
    # materialize the forward half's u8 planes: letting XLA fuse the whole
    # roundtrip into one kernel costs ~40 us/frame MORE than the two-pass
    # form at 1080p B=128 on v5e (286 vs 246 us/frame, interleaved A/B) —
    # the fused mega-kernel spills; two u8 [H,W,B] passes are cheaper than
    # the register pressure. Identity op, bit-exactness unaffected.
    L, a, bb = jax.lax.optimization_barrier((L, a, bb))
    L = round_u8(L.astype(jnp.float32) * mask.astype(jnp.float32))
    return lab_to_bgr_planes(L, a, bb)


@jax.jit
def correct(image: jax.Array, mask: jax.Array) -> jax.Array:
    """image: [..., H, W, 3] uint8 BGR; mask: [H, W] float32."""
    lab = bgr_to_lab_u8(image)
    L = lab[..., 0].astype(jnp.float32) * mask.astype(jnp.float32)
    lab = lab.at[..., 0].set(round_u8(L))
    return lab_to_bgr_u8(lab)
