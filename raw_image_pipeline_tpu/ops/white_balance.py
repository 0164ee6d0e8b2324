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

PCA replicates the reference arithmetic exactly. simple/grey_world were
reverse-engineered against the native libopencv_xphoto 4.6 oracle on this
machine (native/oracle/xphoto_oracle.cpp; tests/fixtures/wb_oracle/ holds
golden outputs):
  * grey_world: bit-exact — integer saturation mask
    (mx-mn)*255 <= cvRound(thr*255)*mx, integer channel sums, gains
    cvRound(256 * f32(smin)/f32(s)) applied as (v*gain) >> 8.
  * simple: bit-exact — histogram-walk quantiles (strict < against the
    f32 target p*total/100 from each end) and the convertTo stretch with
    double-computed, f32-cast (alpha, beta) coefficients applied as a
    single-rounded fma + half-even round (semantics read from the
    library's disassembly; tests/test_wb_oracle.py).
"learned" (LearningBasedWB) uses the REAL default model — trees extracted
from the library binary, features and consensus reverse-engineered; see
ops/learned_wb.py (bit-exact on the reference fixtures).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from raw_image_pipeline_tpu.ops.common import fma_f32, round_u8


def _channel_hists(image: jax.Array) -> jax.Array:
    """[..., H, W, 3] uint8 -> [..., 3, 256] int32 histograms via scatter-add."""

    def hist1(flat):  # [N] int32 -> [256]
        return jnp.zeros((256,), jnp.int32).at[flat].add(1)

    lead = image.shape[:-3]
    n = image.shape[-3] * image.shape[-2]
    flat = image.astype(jnp.int32).reshape((-1, n, 3)).transpose(0, 2, 1)  # [B', 3, N]
    h = jax.vmap(jax.vmap(hist1))(flat)  # [B', 3, 256]
    return h.reshape(lead + (3, 256))


# SimpleWB stretch coefficients: the library computes
#   alpha = (outputMax-outputMin)/(maxValue-minValue)   in DOUBLE,
#   beta  = outputMin - minValue*alpha                  in DOUBLE,
# hands them to cv::Mat::convertTo, which casts both to f32 and applies
# out = cvRound(fma(v, alpha32, beta32)) per pixel (disassembly of
# balanceWhiteSimple<uchar> in libopencv_xphoto 4.6). alpha/beta depend
# only on the per-frame scalars (p1, span), so exact f32 values for every
# combination are precomputed on the host; the device does 3 scalar
# lookups per frame.
_SIMPLE_SPAN = np.arange(257, dtype=np.float64)
_SIMPLE_SPAN[0] = 1.0
_SIMPLE_ALPHA64 = 255.0 / _SIMPLE_SPAN  # [257]
_SIMPLE_ALPHA32 = _SIMPLE_ALPHA64.astype(np.float32)
_SIMPLE_BETA32 = (
    -np.arange(256, dtype=np.float64)[:, None] * _SIMPLE_ALPHA64[None, :]
).astype(np.float32)  # [p1, span] -> f32(-p1 * alpha64)


@partial(jax.jit, static_argnames=("p",))
def balance_white_simple(image: jax.Array, p: float) -> jax.Array:
    """cv::xphoto::SimpleWB (setP(p)), 8u, default input/output ranges.

    Per channel (semantics from the libopencv_xphoto 4.6 oracle + its
    disassembly; bit-exact incl. the exact-.5 stretch positions):
      * 256-bin histogram; walk from each end while the cumulative count
        is strictly below the f32 target p*total/100 — stop bins p1/p2;
      * stretch out = cvRound(fma(v, alpha, beta)) with the
        double-computed, f32-cast convertTo coefficients above.
    """
    f32 = jnp.float32
    n = image.shape[-3] * image.shape[-2]
    hist = _channel_hists(image)  # [..., 3, 256] int32
    target = (f32(p) * f32(n)) / f32(100.0)

    cum = jnp.cumsum(hist, axis=-1).astype(f32)
    p1 = jnp.sum((cum < target).astype(jnp.int32), axis=-1)  # [..., 3]
    cum_top = jnp.cumsum(jnp.flip(hist, axis=-1), axis=-1).astype(f32)
    p2 = 255 - jnp.sum((cum_top < target).astype(jnp.int32), axis=-1)

    # degenerate p (>= ~50%): the f32 target can exceed the pixel count and
    # both walks run off the histogram (UB in the C++ loop); clamp to the
    # last bin instead of silently gathering a wrong coefficient
    p1 = jnp.clip(p1, 0, 255)
    p2 = jnp.clip(p2, 0, 255)
    span = jnp.maximum(p2 + 1 - p1, 1)
    alpha = jnp.asarray(_SIMPLE_ALPHA32)[span]  # [..., 3] scalar gathers
    beta = jnp.asarray(_SIMPLE_BETA32)[p1, span]
    x = image.astype(f32)
    out = fma_f32(x, alpha[..., None, None, :], beta[..., None, None, :])
    return round_u8(out)


@partial(jax.jit, static_argnames=("thresh",))
def balance_white_grey_world(image: jax.Array, thresh: float) -> jax.Array:
    """cv::xphoto::GrayworldWB (bit-exact vs the libopencv_xphoto 4.6
    oracle): integer saturation mask, integer channel sums, gains toward the
    minimum-sum channel in 8.8 fixed point with truncating descale."""
    i32 = jnp.int32
    f32 = jnp.float32
    v = image.astype(i32)
    b, g, r = v[..., 0], v[..., 1], v[..., 2]
    mx = jnp.maximum(jnp.maximum(b, g), r)
    mn = jnp.minimum(jnp.minimum(b, g), r)
    t255 = int(np.rint(np.float32(thresh) * 255))  # cvRound at init
    m = (mx - mn) * 255 <= t255 * mx

    # uint32 accumulation: exact for frames up to ~16.8 MP (255 * n < 2^32);
    # int32 would wrap above ~8.4 MP
    u32 = jnp.uint32
    sb = jnp.sum(jnp.where(m, b, 0).astype(u32), axis=(-2, -1))
    sg = jnp.sum(jnp.where(m, g, 0).astype(u32), axis=(-2, -1))
    sr = jnp.sum(jnp.where(m, r, 0).astype(u32), axis=(-2, -1))
    smin = jnp.minimum(jnp.minimum(sb, sg), sr)

    def gain_i(s):
        gi = jnp.rint(smin.astype(f32) / s.astype(f32) * f32(256.0)).astype(i32)
        return jnp.where(s > 0, gi, 256)

    gains = jnp.stack([gain_i(sb), gain_i(sg), gain_i(sr)], axis=-1)
    out = (v * gains[..., None, None, :]) >> 8
    return jnp.clip(out, 0, 255).astype(jnp.uint8)


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


def balance_white_learned(image: jax.Array, thresh: float) -> jax.Array:
    """cv::xphoto::LearningBasedWB with the REAL default model
    (reference: modules/white_balance.cpp:66-71 passes
    saturation_bright_thr as the saturation threshold).

    Full implementation — extracted tree ensemble + reverse-engineered
    simple-feature extraction — lives in ops/learned_wb.py; verified
    bit-exact against the native libopencv_xphoto on the reference
    fixtures (tests/test_learned_wb.py).
    """
    from raw_image_pipeline_tpu.ops.learned_wb import balance_white_learned_model

    return balance_white_learned_model(image, thresh)
