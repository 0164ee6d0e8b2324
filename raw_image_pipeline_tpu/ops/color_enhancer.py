"""HSV color enhancement (reference: modules/color_enhancer.cpp:38-47).

BGR -> HSV (u8), per-channel gain multiply with cv::multiply rounding
(round-half-even + saturate), HSV -> BGR.

cv::multiply(u8, Scalar) forms each product in DOUBLE and cvRounds it;
the device multiply is f32, which rounds differently at up to 6 of the
256 channel values for ~0.06% of gains (round-5 extreme-gain fuzz; a
500k-point gain sweep bounds the disagreement at 6 entries). The exact
semantics are restored by `gain_corrections`: the host enumerates the
disagreeing entries in f64 at param-set time and ships them as 8
padded (idx, val) runtime slots per channel, applied as compare-selects
after the multiply — same no-recompile correction pattern as the
gamma/vignetting tables (ops/lut.py).

cv2's HSV->BGR runs TWO row kernels: the 32-px SIMD vector kernel (final
*255 truncated) and the scalar tail kernel for the last `width % 32`
pixels of every row (final *255 rounded) — whole rows below 32 px are all
scalar. Both kernels are replicated bit-exactly (ops/colorspace) and mixed
here by column, so the enhancer is bit-exact vs cv2 at EVERY frame size —
including the reference's native 720x540 (16-px scalar tail per row),
which previously sat in a <=1 LSB envelope. Widths divisible by 32 (the
1080p headline) take the pure-SIMD path unchanged. The 32-px split point
matches this repo's x86 AVX2 cv2 5.0 oracle; a NEON build of the
reference would split at 16 (CV_SIMD_PX).

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
    hsv_to_bgr_planes_scalar,
)
from raw_image_pipeline_tpu.ops.common import round_u8

# cv2's row-vector width in PIXELS for the u8 HSV->BGR kernel (x86 AVX2
# build of the cv2 5.0 oracle; empirically determined — see module doc)
CV_SIMD_PX = 32

# correction slots per channel for the f32-vs-f64 multiply disagreement
# (measured max 6 over a 500k-point gain sweep in [0, 3]; 8 gives margin)
GAIN_CORR_SLOTS = 8


def gain_corrections(gains):
    """Host-side: enumerate the channel values where the device's f32
    multiply+rint disagrees with cv::multiply's f64 product + cvRound.

    gains: 3 floats (H, S, V) — the f64 config values.
    Returns (idx [3,8] int32 padded with -1, val [3,8] int32): runtime
    arrays, no recompile when gains change."""
    import numpy as np

    idx = np.full((3, GAIN_CORR_SLOTS), -1, np.int32)
    val = np.zeros((3, GAIN_CORR_SLOTS), np.int32)
    i = np.arange(256)
    for c, g in enumerate(np.asarray(gains, np.float64)):
        ref = np.clip(np.rint(i * g), 0, 255).astype(np.int64)
        got = np.clip(
            np.float64(np.rint(i.astype(np.float32) * np.float32(g))), 0, 255
        ).astype(np.int64)
        bad = np.where(ref != got)[0]
        if len(bad) > GAIN_CORR_SLOTS:  # unreachable per the sweep bound
            raise ValueError(
                f"gain {g} needs {len(bad)} corrections > {GAIN_CORR_SLOTS}"
            )
        idx[c, : len(bad)] = bad
        val[c, : len(bad)] = ref[bad]
    return idx, val


def _apply_gain_corr(pre_u8, scaled_u8, idx_c, val_c):
    """scaled with the <=8 (idx, val) slots patched in; idx pads of -1
    never match a u8 value, so unused slots are no-ops."""
    ii = pre_u8.astype(jnp.int32)
    out = scaled_u8
    for k in range(GAIN_CORR_SLOTS):
        out = jnp.where(ii == idx_c[k], val_c[k].astype(jnp.uint8), out)
    return out


def _hsv_to_bgr_mixed(h, s, v, w_axis: int):
    """cv2's per-row kernel mix: SIMD columns then the scalar tail."""
    w = h.shape[w_axis]
    t = w % CV_SIMD_PX
    if t == 0:
        return hsv_to_bgr_planes(h, s, v)
    ax = w_axis if w_axis >= 0 else h.ndim + w_axis

    def head(x):
        return jax.lax.slice_in_dim(x, 0, w - t, axis=ax)

    def tail(x):
        return jax.lax.slice_in_dim(x, w - t, w, axis=ax)

    if t == w:  # width < 32: all scalar
        return hsv_to_bgr_planes_scalar(h, s, v)
    hd = hsv_to_bgr_planes(head(h), head(s), head(v))
    tl = hsv_to_bgr_planes_scalar(tail(h), tail(s), tail(v))
    return tuple(
        jnp.concatenate([a, b], axis=ax) for a, b in zip(hd, tl)
    )


def enhance_planes(b: jax.Array, g: jax.Array, r: jax.Array, gains: jax.Array,
                   w_axis: int = -1, corr=None):
    """Planar form: three u8 planes -> three u8 planes. Same arithmetic as
    `enhance` (the packed op slices/stacks around the same planar cores).

    w_axis: which plane axis is the frame's W (cv2's kernel mix is per
    ROW): -1 for [..., H, W] batch-major planes, 1 for the pipeline's
    batch-minor [H, W, B] planes.
    corr: optional (idx [3,8] i32, val [3,8] i32) from gain_corrections —
    patches the f32 multiply up to cv::multiply's f64 rounding."""
    f32 = jnp.float32
    h, s, v = bgr_to_hsv_planes(b, g, r)
    # materialize the forward half (same finding as vignetting's
    # correct_planes: the fully-fused HSV roundtrip mega-kernel is slower
    # than two passes — in-chain 1469 -> 1440 us/frame at 1080p B=128).
    # Identity op; bit-exactness unaffected.
    h, s, v = jax.lax.optimization_barrier((h, s, v))
    hs = round_u8(h.astype(f32) * gains[0].astype(f32))
    ss = round_u8(s.astype(f32) * gains[1].astype(f32))
    vs = round_u8(v.astype(f32) * gains[2].astype(f32))
    if corr is not None:
        ci, cv_ = corr
        hs = _apply_gain_corr(h, hs, ci[0], cv_[0])
        ss = _apply_gain_corr(s, ss, ci[1], cv_[1])
        vs = _apply_gain_corr(v, vs, ci[2], cv_[2])
    return _hsv_to_bgr_mixed(hs, ss, vs, w_axis)


def enhance(image: jax.Array, gains) -> jax.Array:
    """image: [..., H, W, 3] uint8 BGR; gains: [3] float (hue, saturation,
    value). For batch-minor packed layouts use enhance_packed(w_axis=...).

    Takes gains as HOST floats (not traced) so the f64 multiply
    corrections can be derived here; they ride along as runtime arrays —
    changing gains never recompiles."""
    import numpy as np

    g = np.asarray(gains, np.float64)
    ci, cv_ = gain_corrections(g)
    return enhance_packed(
        image, jnp.asarray(g.astype(np.float32)),
        corr=(jnp.asarray(ci), jnp.asarray(cv_)),
    )


from functools import partial as _partial


@_partial(jax.jit, static_argnames=("w_axis",))
def enhance_packed(image: jax.Array, gains: jax.Array,
                   w_axis: int = -2, corr=None) -> jax.Array:
    """Packed form; w_axis indexes the frame's W within `image`'s axes
    (default -2 for [..., H, W, 3]). corr as in enhance_planes."""
    planes = (image[..., 0], image[..., 1], image[..., 2])
    ax = w_axis + 1 if w_axis < 0 else w_axis  # channel axis dropped
    out = enhance_planes(*planes, gains, w_axis=ax, corr=corr)
    return jnp.stack(out, axis=-1)
