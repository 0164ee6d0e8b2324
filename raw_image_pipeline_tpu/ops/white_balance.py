"""Statistical white-balance methods: simple, grey_world, pca, learned.

The reference dispatches on a method string (modules/white_balance.hpp:46-86):
  * "simple"      -> cv::xphoto::SimpleWB with clipping percentile p
  * "grey_world"  -> cv::xphoto::GrayworldWB with saturation threshold
  * "learned"     -> cv::xphoto::LearningBasedWB
  * "pca"         -> custom 2x2 solve (white_balance.cpp:73-136)
  * "ccc"         -> FFCC library (see ops/ccc.py)

All methods are per-frame global reductions followed by a per-pixel affine —
on TPU the reductions are jnp sums/maxes over the spatial axes (batched over
frames; under spatial sharding they become psum-style collectives inserted
by GSPMD), and the pixel math fuses with neighboring stages.

PCA replicates the reference arithmetic exactly. simple/grey_world implement
the documented OpenCV xphoto algorithms; the installed cv2 wheel has no
xphoto module, so their bit parity cannot be asserted on this machine —
semantics follow opencv_contrib xphoto/src/simple_color_balance.cpp and
grayworld_white_balance.cpp. "learned" (LearningBasedWB) depends on an
OpenCV built-in trained model; we provide a principled stand-in (gray-world
/ white-patch blend) and mark it experimental.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from raw_image_pipeline_tpu.ops.common import round_u8


def _channel_hists(image: jax.Array) -> jax.Array:
    """[..., H, W, 3] uint8 -> [..., 3, 256] int32 histograms via scatter-add."""

    def hist1(flat):  # [N] int32 -> [256]
        return jnp.zeros((256,), jnp.int32).at[flat].add(1)

    lead = image.shape[:-3]
    n = image.shape[-3] * image.shape[-2]
    flat = image.astype(jnp.int32).reshape((-1, n, 3)).transpose(0, 2, 1)  # [B', 3, N]
    h = jax.vmap(jax.vmap(hist1))(flat)  # [B', 3, 256]
    return h.reshape(lead + (3, 256))


@partial(jax.jit, static_argnames=("p",))
def balance_white_simple(image: jax.Array, p: float) -> jax.Array:
    """SimpleWB: per-channel percentile stretch.

    Per channel: find the p/2 % low and high quantile values via a 256-bin
    histogram and linearly stretch [lo, hi] to [0, 255]
    (xphoto simple_color_balance.cpp semantics, inputMin/Max 0/255).
    """
    n = image.shape[-3] * image.shape[-2]
    hist = _channel_hists(image)
    cum = jnp.cumsum(hist, axis=-1)
    k = p / 200.0 * n
    # lo: smallest v with count(x <= v) > k; hi: largest v with count(x >= v) > k
    lo = jnp.argmax((cum > k).astype(jnp.int32), axis=-1)  # [..., 3]
    from_top = n - (cum - hist)  # count(x >= v)
    hi = 255 - jnp.argmax(jnp.flip(from_top > k, axis=-1).astype(jnp.int32), axis=-1)
    lo_f = lo.astype(jnp.float32)
    hi_f = hi.astype(jnp.float32)
    scale = jnp.where(hi_f > lo_f, 255.0 / (hi_f - lo_f), 1.0)
    xf = image.astype(jnp.float32)
    out = (xf - lo_f[..., None, None, :]) * scale[..., None, None, :]
    return round_u8(out)


@partial(jax.jit, static_argnames=("thresh",))
def balance_white_grey_world(image: jax.Array, thresh: float) -> jax.Array:
    """GrayworldWB: channel means over low-saturation pixels, gains toward
    the mean of means (xphoto grayworld_white_balance.cpp semantics)."""
    x = image.astype(jnp.float32)
    b, g, r = x[..., 0], x[..., 1], x[..., 2]
    mx = jnp.maximum(jnp.maximum(b, g), r)
    mn = jnp.minimum(jnp.minimum(b, g), r)
    sat = jnp.where(mx > 0, (mx - mn) / mx, 0.0)
    m = (sat <= thresh).astype(jnp.float32)

    sb = jnp.sum(b * m, axis=(-2, -1))
    sg = jnp.sum(g * m, axis=(-2, -1))
    sr = jnp.sum(r * m, axis=(-2, -1))
    dmean = (sb + sg + sr) / 3.0
    gain_b = jnp.where(sb > 0, dmean / sb, 1.0)
    gain_g = jnp.where(sg > 0, dmean / sg, 1.0)
    gain_r = jnp.where(sr > 0, dmean / sr, 1.0)
    gains = jnp.stack([gain_b, gain_g, gain_r], axis=-1)  # [..., 3]
    return round_u8(x * gains[..., None, None, :])


@jax.jit
def balance_white_pca(image: jax.Array) -> jax.Array:
    """Exact replica of the reference PCA method (white_balance.cpp:73-136).

    Per frame, for C in {B, R} vs G:
        [sum(C^2)  sum(C); max(C^2)  max(C)] @ x = [sum(G); max(G)]
        C' = trunc255(x0*C^2 + x1*C), round to u8.
    The reference sums with cv::sum (double accumulator); we use float32
    data with jnp's tree reductions — gain deltas are ~1e-6 relative,
    well under 1 LSB on the output.
    """
    x = image.astype(jnp.float32)
    b, g, r = x[..., 0], x[..., 1], x[..., 2]
    b2 = b * b
    r2 = r * r
    red = lambda c: jnp.sum(c, axis=(-2, -1))
    mxd = lambda c: jnp.max(c, axis=(-2, -1))
    sg, mg = red(g), mxd(g)

    def solve(c, c2):
        # x = inv([[s2, s], [m2, m]]) @ [sg, mg]
        s2, s, m2, m = red(c2), red(c), mxd(c2), mxd(c)
        det = s2 * m - s * m2
        x0 = (m * sg - s * mg) / det
        x1 = (-m2 * sg + s2 * mg) / det
        return x0, x1

    b_x0, b_x1 = solve(b, b2)
    r_x0, r_x1 = solve(r, r2)
    bb = b_x0[..., None, None] * b2 + b_x1[..., None, None] * b
    rr = r_x0[..., None, None] * r2 + r_x1[..., None, None] * r
    # THRESH_TRUNC at 255 then convertTo(CV_8U) = cvRound + saturate
    bb = jnp.minimum(bb, 255.0)
    rr = jnp.minimum(rr, 255.0)
    out = jnp.stack([bb, g, rr], axis=-1)
    return round_u8(out)


@partial(jax.jit, static_argnames=("thresh",))
def balance_white_learned(image: jax.Array, thresh: float) -> jax.Array:
    """LearningBasedWB stand-in (experimental).

    cv::xphoto::LearningBasedWB regresses illuminant chromaticity from
    histogram features with a model baked into OpenCV's binaries, which is
    not replicable without it. We blend the gray-world and white-patch
    chromaticity estimates over non-saturated pixels — the two dominant
    features of that model. Marked experimental in docs.
    """
    x = image.astype(jnp.float32)
    b, g, r = x[..., 0], x[..., 1], x[..., 2]
    mx = jnp.maximum(jnp.maximum(b, g), r)
    m = (mx < thresh * 255.0).astype(jnp.float32)

    stat = lambda c: (jnp.sum(c * m, axis=(-2, -1)), jnp.max(c * m, axis=(-2, -1)))
    (sb, mb), (sg_, mg_), (sr, mr) = stat(b), stat(g), stat(r)

    eps = 1e-6
    gw = jnp.stack([sb, sg_, sr], -1)
    wp = jnp.stack([mb, mg_, mr], -1)
    gw = gw / (jnp.sum(gw, -1, keepdims=True) + eps)
    wp = wp / (jnp.sum(wp, -1, keepdims=True) + eps)
    est = (gw + wp) / 2.0
    gains = est[..., 1:2] / (est + eps)  # normalize to green
    return round_u8(x * gains[..., None, None, :])
