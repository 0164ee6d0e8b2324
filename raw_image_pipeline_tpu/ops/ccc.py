"""FFCC convolutional color constancy white balance.

TPU-native implementation of the reference CCC library
(raw_image_pipeline_white_balance/src/.../convolutional_color_constancy.cpp),
after Barron, "Fast Fourier Color Constancy", CVPR 2017.

Per frame (reference balanceWhite, ccc.cpp:91-113):
  1. resize to 360x270 (INTER_LINEAR), convert to float32;
  2. log-chroma histogram (256x256) over non-saturated, finite pixels
     (ccc.cpp:210-271): u = round((log g - log r - uv0)/bin),
     v = round((log g - log b - uv0)/bin), clamped to [0,255], each
     contributing weight 1/(rows*cols) — normalized by *all* pixels, not
     just surviving ones (reference quirk, ccc.cpp:235-236);
  3. response = IDFT(DFT(hist) * DFT(filter) + DFT(bias)), row-major argmax
     (ccc.cpp:273-298). cv::dft's CCS packing + mulSpectrums is
     mathematically identical to the complex rfft2 product; the inverse's
     missing 1/N scale does not move the argmax;
  4. optional Kalman smoothing of the (x=col, y=row) peak (ccc.cpp:300-340);
  5. gains: Lu = x*bin + uv0, Lv = y*bin + uv0, gain_r = exp(Lu),
     gain_g = 1, gain_b = exp(Lv), normalized by the min gain; the
     z=sqrt(...) normalizer is computed then overwritten to 1.0 in the
     reference and therefore omitted here (ccc.cpp:362-367);
  6. apply per-channel gains with saturating round-half-even multiply.

Orientation subtlety replicated exactly: hist is indexed [u, v] (row = u =
green/red axis), the model filter/bias are transposed at load
(ccc.cpp:131-132 — handled in models/ccc_model.py), and the *column*
coordinate of the argmax drives gain_r while the *row* drives gain_b
(ccc.cpp:359-370).

On TPU the 65536-bin histogram is a one-hot matmul on the MXU — a Pallas
kernel building bf16 one-hot factors in VMEM (the fast path; bitwise equal
to the f32 einsum, asserted on-chip by bench.py), with a fused f32 einsum
fallback for CPU and for spatial sharding (GSPMD psums partial histograms
across the space axis; it cannot partition a pallas_call — see
set_histogram_impl). The DFTs are real 256x256 matmul pairs, and
everything is batched over frames.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from raw_image_pipeline_tpu.models.ccc_model import CCCModel
from raw_image_pipeline_tpu.ops.colorspace import bgr_to_gray_f32
from raw_image_pipeline_tpu.ops.common import round_u8
from raw_image_pipeline_tpu.ops.resize import resize_linear_u8

# Reference constants (ccc.cpp:19-33)
SMALL_W, SMALL_H = 360, 270
BIN_SIZE = 1.0 / 64.0
UV0 = -1.421875
HIST_N = 256


def _round_half_away(x):
    """C++ round(): half away from zero."""
    return jnp.where(x >= 0, jnp.floor(x + 0.5), jnp.ceil(x - 0.5))


# Histogram implementation selector. "auto" uses the Pallas MXU kernel on
# TPU and the fused-einsum formulation elsewhere; force "einsum" for
# multi-device spatial sharding on real TPU hardware (GSPMD cannot
# partition a pallas_call — the einsum path lets it psum partial
# histograms across the space axis instead; see docs/scaling.md).
_HIST_IMPL = "auto"


def set_histogram_impl(impl: str) -> None:
    """Select the log-chroma histogram backend: "auto" | "einsum" | "pallas".

    Call BEFORE building pipelines: clearing log_chroma_histogram's own jit
    cache cannot retrace outer jitted programs (built pipelines,
    ccc_balance_white) that already embedded the previous selection —
    those keep the backend they were traced with. Pipelines built via
    build_pipeline(spatial_shards>1) pin "einsum" explicitly instead."""
    global _HIST_IMPL
    if impl not in ("auto", "einsum", "pallas"):
        raise ValueError(f"unknown histogram impl [{impl}]")
    _HIST_IMPL = impl
    # the selector is read at trace time; drop cached traces
    log_chroma_histogram.clear_cache()
    log_chroma_histogram_rt.clear_cache()


_HIST_ROWS, _HIST_PC = 8, 2048  # pallas kernel block: 8 chunks x 2048 pixels


def _hist_pallas_kernel(u_ref, v_ref, out_ref):
    """One grid step: accumulate 8 x 2048 pixels of one frame's joint
    (u, v) histogram via bf16 one-hot matmuls on the MXU.

    Exactness: the one-hot factors are exactly 0.0/1.0 in bfloat16, the MXU
    accumulates their products in float32, and every partial count is an
    integer < 2^24 — so the result is bitwise identical to the f32 einsum
    (integer sums in f32 are order-independent below 2^24; asserted on-chip
    against the einsum by bench.py every run). The one-hots are built
    sublane-major ([pc, 256]) and contracted over dim 0 of both operands —
    the lane-major/NT orientation measures ~100x slower under Mosaic."""
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        out_ref[0] = jnp.zeros((HIST_N, HIST_N), jnp.float32)

    pc = _HIST_PC
    iota = jax.lax.broadcasted_iota(jnp.int32, (pc, HIST_N), 1)
    acc = jnp.zeros((HIST_N, HIST_N), jnp.float32)
    for k in range(_HIST_ROWS):
        ut = u_ref[0, k:k + 1, :].reshape(pc, 1)
        vt = v_ref[0, k:k + 1, :].reshape(pc, 1)
        ou = (jnp.broadcast_to(ut, (pc, HIST_N)) == iota).astype(jnp.bfloat16)
        ov = (jnp.broadcast_to(vt, (pc, HIST_N)) == iota).astype(jnp.bfloat16)
        acc = acc + jax.lax.dot_general(
            ou, ov, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    out_ref[0] = out_ref[0] + acc


def _hist_counts_pallas(u_flat: jax.Array, vm_flat: jax.Array,
                        interpret: bool = False) -> jax.Array:
    """[B, P] int32 bin coords (invalid pixels encoded as v = HIST_N) ->
    [B, 256, 256] float32 counts. interpret=True runs the kernel in the
    Pallas interpreter (CPU test coverage)."""
    b, p = u_flat.shape
    blk = _HIST_ROWS * _HIST_PC
    pp = -(-p // blk) * blk
    if pp != p:
        u_flat = jnp.pad(u_flat, ((0, 0), (0, pp - p)))
        # pad v with the out-of-range sentinel so pad pixels count nothing
        vm_flat = jnp.pad(vm_flat, ((0, 0), (0, pp - p)),
                          constant_values=HIST_N)
    u3 = u_flat.reshape(b, pp // _HIST_PC, _HIST_PC)
    v3 = vm_flat.reshape(b, pp // _HIST_PC, _HIST_PC)
    return pl.pallas_call(
        _hist_pallas_kernel,
        out_shape=jax.ShapeDtypeStruct((b, HIST_N, HIST_N), jnp.float32),
        grid=(b, pp // blk),
        in_specs=[
            pl.BlockSpec((1, _HIST_ROWS, _HIST_PC), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, _HIST_ROWS, _HIST_PC), lambda i, j: (i, j, 0)),
        ],
        out_specs=pl.BlockSpec((1, HIST_N, HIST_N), lambda i, j: (i, 0, 0)),
        interpret=interpret,
    )(u3, v3)


@partial(jax.jit, static_argnames=("bright_thr", "dark_thr", "impl"))
def log_chroma_histogram(
    image: jax.Array, bright_thr: float = 0.9, dark_thr: float = 0.1,
    uv0: float = UV0, impl: Optional[str] = None,
) -> jax.Array:
    """[..., H, W, 3] uint8 BGR -> [..., 256, 256] float32 histogram.

    The image should already be the 360x270 working resize; H*W defines the
    reference's pixel_weight normalization. Thresholds/uv0 are trace-time
    floats here; the pipeline uses log_chroma_histogram_rt (runtime
    scalars — retuning never recompiles)."""
    return _log_chroma_histogram_core(
        image, 255.0 * bright_thr, 255.0 * dark_thr, uv0, impl
    )


@partial(jax.jit, static_argnames=("impl",))
def log_chroma_histogram_rt(
    image: jax.Array, bright_cut: jax.Array, dark_cut: jax.Array,
    uv0: jax.Array, impl: Optional[str] = None,
) -> jax.Array:
    """Runtime-parameter variant: bright_cut/dark_cut are the PRE-SCALED
    255*threshold values (f32 scalars — compute them with the float64
    product on host for bit-identity with the static path) and uv0 an f32
    scalar. Retuning the CCC thresholds / uv0 (the reference node's
    dynamic_reconfigure knobs, cfg/RawImagePipelineWhiteBalance.cfg:8-12)
    therefore never recompiles a built pipeline."""
    return _log_chroma_histogram_core(image, bright_cut, dark_cut, uv0, impl)


def _log_chroma_histogram_core(image, bright_cut, dark_cut, uv0, impl):
    f = image.astype(jnp.float32)
    gray = bgr_to_gray_f32(f)
    include = (gray <= bright_cut) & (gray > dark_cut)

    logs = jnp.log(f)
    log_b, log_g, log_r = logs[..., 0], logs[..., 1], logs[..., 2]
    finite = jnp.isfinite(log_r) & jnp.isfinite(log_g) & jnp.isfinite(log_b)
    valid = include & finite

    u = _round_half_away((log_g - log_r - uv0) / BIN_SIZE)
    v = _round_half_away((log_g - log_b - uv0) / BIN_SIZE)
    # non-finite logs produce nan bin coords; zero them before int cast
    # (they carry zero weight anyway)
    u = jnp.nan_to_num(u, nan=0.0, posinf=255.0, neginf=0.0)
    v = jnp.nan_to_num(v, nan=0.0, posinf=255.0, neginf=0.0)
    u = jnp.clip(u, 0, HIST_N - 1).astype(jnp.int32)
    v = jnp.clip(v, 0, HIST_N - 1).astype(jnp.int32)

    h, w = image.shape[-3], image.shape[-2]
    pixel_weight = jnp.float32(1.0 / (h * w))

    # TPU formulation: a scatter-add over 2^16 bins runs at scalar index
    # rate (~8 ns/pixel — ~0.8 ms/frame); instead build the joint histogram
    # as an MXU matmul of one-hot factor matrices:
    #   count[a, b] = sum_p [u_p == a] * valid_p * [v_p == b]
    # XLA fuses the one-hot comparisons into the dot operands, so nothing
    # [P, 256]-sized is materialized — but ONLY for f32 factors: casting
    # them to bfloat16 for the faster MXU path makes XLA materialize the
    # [B, P, 256] one-hots instead and runs 15 ms/batch SLOWER at B=64
    # (measured on v5e; negative result, see ROADMAP). So the factors stay
    # f32. Counts accumulate exactly (integers in f32 tree-sums); the single
    # final count*pixel_weight rounding is within ulps of the reference's
    # sequential `+= pixel_weight` loop (ccc.cpp:237-263), which itself is
    # order-dependent.
    lead = image.shape[:-3]
    u_flat = u.reshape((-1, h * w))
    v_flat = v.reshape((-1, h * w))
    valid_flat = valid.reshape((-1, h * w))
    impl = impl or _HIST_IMPL
    use_pallas = impl == "pallas" or (
        impl == "auto" and jax.default_backend() == "tpu"
    )
    if use_pallas:
        # invalid pixels carry the out-of-range bin HIST_N: their one-hot
        # row is all-zero, exactly like the einsum's `& valid` masking
        vm_flat = jnp.where(valid_flat, v_flat, HIST_N)
        counts = _hist_counts_pallas(
            u_flat, vm_flat, interpret=jax.default_backend() == "cpu"
        )
    else:
        iota = jnp.arange(HIST_N, dtype=jnp.int32)
        ou = (u_flat[..., None] == iota).astype(jnp.float32)
        ov = ((v_flat[..., None] == iota) & valid_flat[..., None]).astype(
            jnp.float32
        )
        counts = jnp.einsum(
            "bpu,bpv->buv", ou, ov, preferred_element_type=jnp.float32
        )
    hist = counts * pixel_weight
    return hist.reshape(lead + (HIST_N, HIST_N))


def _dft_matrices():
    """Real/imag parts of the 256-point DFT matrix (float32 constants)."""
    k = np.arange(HIST_N)
    ang = -2.0 * np.pi * np.outer(k, k) / HIST_N
    return np.cos(ang).astype(np.float32), np.sin(ang).astype(np.float32)


_DFT_RE, _DFT_IM = _dft_matrices()


# Response implementation selector, same convention as the histogram's:
# "auto" = fused Pallas kernel on TPU (all ten 256x256 DFT matmuls + the
# complex filter product + bias in one VMEM-resident kernel per frame),
# plain XLA matmuls elsewhere and under spatial sharding.
_RESP_IMPL = "auto"


def set_response_impl(impl: str) -> None:
    """Select the CCC response backend: "auto" | "xla" | "pallas".

    Call BEFORE building pipelines (same caveat as set_histogram_impl:
    outer jitted programs keep the backend they were traced with).
    Pipelines built via build_pipeline(spatial_shards>1) pin "xla"
    explicitly instead."""
    global _RESP_IMPL
    if impl not in ("auto", "xla", "pallas"):
        raise ValueError(f"unknown response impl [{impl}]")
    _RESP_IMPL = impl
    ccc_response.clear_cache()


def _response_pallas_kernel(x_ref, fr_ref, fi_ref, wr_ref, wi_ref, bias_ref,
                            out_ref):
    """One frame: resp = IDFT2(DFT2(hist) * filt_dft).real / N^2 + bias.

    The ten 256x256 matmuls run back-to-back on the MXU with every operand
    and intermediate resident in VMEM (one HBM read of the histogram, one
    HBM write of the response — the XLA formulation roundtrips each of the
    ~10 intermediates). bf16 operands with f32 accumulation match XLA's
    DEFAULT-precision semantics; the argmax this feeds is asserted equal to
    the HIGHEST-precision (6-pass f32) result on-chip by bench.py.
    """
    bf = jnp.bfloat16
    f32 = jnp.float32

    def mm(a, b):
        return jax.lax.dot_general(
            a.astype(bf), b.astype(bf), (((1,), (0,)), ((), ())),
            preferred_element_type=f32,
        )

    X = x_ref[0]
    Fr = fr_ref[:]
    Fi = fi_ref[:]
    A = mm(X, Fr)  # X F^T == X Fr (F symmetric)
    B = mm(X, Fi)
    Yr = mm(Fr, A) - mm(Fi, B)
    Yi = mm(Fr, B) + mm(Fi, A)
    Zr = Yr * wr_ref[:] - Yi * wi_ref[:]
    Zi = Yr * wi_ref[:] + Yi * wr_ref[:]
    Ar = mm(Fr, Zr) + mm(Fi, Zi)
    Ai = mm(Fr, Zi) - mm(Fi, Zr)
    R = mm(Ar, Fr) + mm(Ai, Fi)
    out_ref[0] = R * f32(1.0 / (HIST_N * HIST_N)) + bias_ref[:]


def _response_pallas(hist3: jax.Array, filt_re, filt_im, bias,
                     interpret: bool = False) -> jax.Array:
    b = hist3.shape[0]
    const = pl.BlockSpec((HIST_N, HIST_N), lambda i: (0, 0))
    return pl.pallas_call(
        _response_pallas_kernel,
        out_shape=jax.ShapeDtypeStruct((b, HIST_N, HIST_N), jnp.float32),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, HIST_N, HIST_N), lambda i: (i, 0, 0)),
            const, const, const, const, const,
        ],
        out_specs=pl.BlockSpec((1, HIST_N, HIST_N), lambda i: (i, 0, 0)),
        interpret=interpret,
    )(hist3, jnp.asarray(_DFT_RE), jnp.asarray(_DFT_IM),
      filt_re.astype(jnp.float32), filt_im.astype(jnp.float32),
      bias.astype(jnp.float32))


@partial(jax.jit, static_argnames=("precision", "impl"))
def ccc_response(hist: jax.Array, filt_dft_re: jax.Array, filt_dft_im: jax.Array,
                 bias_spatial: jax.Array, precision=None,
                 impl: Optional[str] = None) -> jax.Array:
    """response = IDFT2(DFT2(hist) * DFT2(filt)).real + bias, [..., 256, 256].

    Mathematically identical to the reference's
    dft/mulSpectrums/add/idft chain (ccc.cpp:283-292) up to the inverse
    scale (which cv::dft omits and which cannot move the argmax): the bias
    term passes through DFT->IDFT untouched, so it is added in the spatial
    domain directly.

    Implemented as 10 real 256x256 matmuls on the MXU instead of an FFT
    custom-call (unavailable on TPU): 2-D DFT2(X) = F X F^T done in
    real/imag parts, elementwise complex product with the precomputed
    filter DFT, then the real part of the inverse transform.
    """
    f32 = jnp.float32
    impl = impl or _RESP_IMPL
    use_pallas = precision is None and (
        impl == "pallas"
        or (impl == "auto" and jax.default_backend() == "tpu")
    )
    if use_pallas:
        lead = hist.shape[:-2]
        resp = _response_pallas(
            hist.astype(f32).reshape((-1, HIST_N, HIST_N)),
            filt_dft_re, filt_dft_im, bias_spatial,
            interpret=jax.default_backend() == "cpu",
        )
        return resp.reshape(lead + (HIST_N, HIST_N))

    Fr = jnp.asarray(_DFT_RE)
    Fi = jnp.asarray(_DFT_IM)
    X = hist.astype(f32)

    # DEFAULT matmul precision: the response only feeds an argmax, which is
    # bit-identical to the HIGHEST-precision (6-pass f32-emulation) result
    # on every histogram tested (200 synthetic + 64 random-frame, v5e) and
    # 3.4x faster; bench.py re-asserts the argmax equivalence on-chip every
    # run (ccc_response_precision_check). The CPU backend ignores precision
    # (always true f32), so the cv2-golden tests are unaffected.
    prec = jax.lax.Precision.DEFAULT if precision is None else precision

    def mm(a, b):
        return jnp.matmul(a, b, precision=prec, preferred_element_type=f32)

    # forward: Y = F X F^T  (X real)
    A = mm(X, Fr)          # X F^T == X Fr (F symmetric)
    B = mm(X, Fi)
    Yr = mm(Fr, A) - mm(Fi, B)
    Yi = mm(Fr, B) + mm(Fi, A)

    # elementwise complex product with the filter DFT
    Zr = Yr * filt_dft_re - Yi * filt_dft_im
    Zi = Yr * filt_dft_im + Yi * filt_dft_re

    # inverse: real(conj(F) Z conj(F)^T) / N^2
    # conj(F) = Fr - i Fi
    Ar = mm(Fr, Zr) + mm(Fi, Zi)
    Ai = mm(Fr, Zi) - mm(Fi, Zr)
    R = mm(Ar, Fr) + mm(Ai, Fi)
    resp = R * f32(1.0 / (HIST_N * HIST_N))
    return resp + bias_spatial.astype(f32)


@jax.jit
def response_argmax(response: jax.Array) -> jax.Array:
    """Row-major first-occurrence argmax -> [..., 2] int32 (x=col, y=row),
    matching cv::minMaxLoc's maxLoc Point convention (ccc.cpp:295)."""
    lead = response.shape[:-2]
    flat = response.reshape(lead + (-1,))
    idx = jnp.argmax(flat, axis=-1).astype(jnp.int32)
    row = idx // HIST_N
    col = idx % HIST_N
    return jnp.stack([col, row], axis=-1)


def gains_from_offsets(lu: float, lv: float, uv0: float = UV0) -> jax.Array:
    """Debug-UV-offset mode gains (setDebugUVOffset, ccc.cpp:349-357):
    Lu = lu - uv0, Lv = lv - uv0, then the same gain math as gains_from_uv."""
    Lu = lu - uv0
    Lv = lv - uv0
    import math

    gain_r = math.exp(Lu)  # libm exp = the reference's std::exp
    gain_b = math.exp(Lv)
    gains = np.array([gain_b, 1.0, gain_r], np.float32)
    return jnp.asarray(gains / gains.min())


def gains_from_uv(uv_pos: jax.Array, uv0: float = UV0) -> jax.Array:
    """uv_pos [..., 2] int (x, y) -> [..., 3] float32 BGR gains
    (ccc.cpp:342-381; z forced to 1, min-normalized)."""
    x = uv_pos[..., 0].astype(jnp.float32)
    y = uv_pos[..., 1].astype(jnp.float32)
    Lu = x * BIN_SIZE + uv0
    Lv = y * BIN_SIZE + uv0
    gain_r = jnp.exp(Lu)
    gain_b = jnp.exp(Lv)
    gain_g = jnp.ones_like(gain_r)
    gains = jnp.stack([gain_b, gain_g, gain_r], axis=-1)
    factor = jnp.min(gains, axis=-1, keepdims=True)
    return gains / factor


@jax.jit
def apply_gains(image: jax.Array, gains: jax.Array) -> jax.Array:
    """cv::multiply(image, Scalar(gain_b, gain_g, gain_r)) — saturating
    round-half-even (verified exact vs cv2)."""
    return round_u8(image.astype(jnp.float32) * gains[..., None, None, :])


def apply_gains_planes(planes, gains: jax.Array):
    """Planar form of apply_gains: tuple of [..., H, W] u8 planes (BGR
    order) -> tuple. Same arithmetic — bit-identical per channel."""
    return tuple(
        round_u8(p.astype(jnp.float32) * gains[..., c, None, None])
        for c, p in enumerate(planes)
    )


# ---------------------------------------------------------------------------
# Kalman temporal consistency (ccc.cpp:180-206, 300-340)
# ---------------------------------------------------------------------------
#
# cv::KalmanFilter(2, 2, 0) with F = I, Q = I, H = I, R = 10*I and
# errorCovPost initialized to 0. With everything isotropic the covariance
# stays p*I for a scalar p, so the exact recurrence is:
#     predict: p' = p + 1
#     gain:    k  = p' / (p' + 10)
#     update:  x  = x + k*(z - x);  p = (1 - k) * p'
# First measurement initializes x directly (statePost = z) and leaves p = 0.
# The reference then truncates the float estimate into the integer cv::Point
# (ccc.cpp:336-337) before computing gains — replicated via trunc().


@jax.tree_util.register_dataclass
@dataclass
class KalmanState:
    """Per-camera illuminant track. Fields broadcast over leading axes."""

    x: jax.Array  # [..., 2] float32 state (col, row)
    p: jax.Array  # [...] float32 isotropic covariance
    initialized: jax.Array  # [...] bool


def kalman_init(batch_shape=(), uv_init=(HIST_N // 2, HIST_N // 2)) -> KalmanState:
    """Fresh state (first_frame_=true). uv_init mirrors the reference's
    statePre/statePost prior of (height/2, width/2) (ccc.cpp:185-188)."""
    x = jnp.broadcast_to(jnp.asarray(uv_init, jnp.float32), batch_shape + (2,))
    return KalmanState(
        x=x,
        p=jnp.zeros(batch_shape, jnp.float32),
        initialized=jnp.zeros(batch_shape, bool),
    )


def kalman_scan(state: KalmanState, meas: jax.Array) -> Tuple[KalmanState, jax.Array]:
    """Advance one illuminant track through a time-ordered sequence of
    measurements in a single dispatch.

    meas: [T, ..., 2] int32 per-frame argmax peaks, time along axis 0;
    state fields broadcast over the trailing batch shape `...` (independent
    cameras). Returns (state after frame T-1, filtered uv [T, ..., 2]).

    This is the batched-streaming factorization of the reference's per-frame
    cv::KalmanFilter carry (ccc.cpp:300-340): the heavy CCC stages
    (resize/histogram/response/argmax) batch over T frames in one dispatch
    and only this 4-flop recurrence runs sequentially. The scan body is tiny
    ([...,2] floats), so the big-body scan compile pathology on this TPU
    stack does not apply.
    """
    return jax.lax.scan(kalman_update, state, meas)


@jax.jit
def kalman_update(state: KalmanState, meas: jax.Array) -> Tuple[KalmanState, jax.Array]:
    """One filter step. meas: [..., 2] int32 measured peak (x, y).
    Returns (new_state, filtered uv [..., 2] int32)."""
    z = meas.astype(jnp.float32)
    p_pred = state.p + 1.0
    k = p_pred / (p_pred + 10.0)
    x_upd = state.x + k[..., None] * (z - state.x)
    p_upd = (1.0 - k) * p_pred

    init = state.initialized
    new_x = jnp.where(init[..., None], x_upd, z)
    new_p = jnp.where(init, p_upd, state.p)
    new_state = KalmanState(
        x=new_x, p=new_p, initialized=jnp.ones_like(init) | init
    )
    uv = jnp.trunc(new_x).astype(jnp.int32)
    return new_state, uv


# ---------------------------------------------------------------------------
# Full per-frame CCC
# ---------------------------------------------------------------------------


def ccc_balance_white(
    image: jax.Array,
    model: CCCModel,
    bright_thr: float = 0.9,
    dark_thr: float = 0.1,
    state: Optional[KalmanState] = None,
    uv0: float = UV0,
):
    """Full CCC white balance on [..., H, W, 3] uint8 BGR frames.

    Returns (balanced image, new_state). With state=None (temporal
    consistency off) the raw per-frame argmax drives the gains and
    new_state is None.
    """
    small = resize_linear_u8(image, SMALL_H, SMALL_W)
    hist = log_chroma_histogram(small, bright_thr, dark_thr, uv0)
    resp = ccc_response(
        hist,
        jnp.asarray(model.filt_dft_re),
        jnp.asarray(model.filt_dft_im),
        jnp.asarray(model.bias),
    )
    uv = response_argmax(resp)
    if state is not None:
        state, uv = kalman_update(state, uv)
    gains = gains_from_uv(uv, uv0)
    return apply_gains(image, gains), state
