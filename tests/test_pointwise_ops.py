"""Parity tests for flip, gamma LUT, color calibration, colorspaces,
color enhancer, vignetting, and statistical white balance."""

import cv2
import jax.numpy as jnp
import numpy as np
import pytest

from raw_image_pipeline_tpu.ops import colorspace as cs
from raw_image_pipeline_tpu.ops.color_calibration import color_correct
from raw_image_pipeline_tpu.ops.color_enhancer import enhance
from raw_image_pipeline_tpu.ops.flip import flip
from raw_image_pipeline_tpu.ops.gamma import apply_lut, build_gamma_lut, gamma_correct
from raw_image_pipeline_tpu.ops.vignetting import build_vignetting_mask, correct
from raw_image_pipeline_tpu.ops.white_balance import (
    balance_white_grey_world,
    balance_white_pca,
    balance_white_simple,
)


def rand_img(shape=(37, 53, 3), seed=0):
    return np.random.default_rng(seed).integers(0, 256, shape, dtype=np.uint8)


# ---------------------------------------------------------------- flip

@pytest.mark.parametrize("angle", [0, 90, 180, 270, 45])
def test_flip_matches_cv2(angle):
    img = rand_img()
    if angle == 90:
        ref = cv2.flip(cv2.transpose(img), 1)
    elif angle == 180:
        ref = cv2.flip(img, -1)
    elif angle == 270:
        ref = cv2.flip(cv2.transpose(img), 0)
    else:
        ref = img
    out = np.asarray(flip(img, angle))
    np.testing.assert_array_equal(out, ref)


def test_flip_batched_and_bayer():
    imgs = rand_img((4, 16, 24, 3), 1)
    out = np.asarray(flip(imgs, 90))
    assert out.shape == (4, 24, 16, 3)
    np.testing.assert_array_equal(out[2], cv2.flip(cv2.transpose(imgs[2]), 1))
    bayer = rand_img((8, 10), 2)
    out1 = np.asarray(flip(bayer, 270, spatial_axes=(-2, -1)))
    np.testing.assert_array_equal(out1, cv2.flip(cv2.transpose(bayer), 0))


# ---------------------------------------------------------------- gamma

@pytest.mark.parametrize("k", [0.8, 0.9, 1.0, 1.8])
def test_gamma_lut_matches_cv2(k):
    # reference LUT build: gamma_correction.cpp:35-49
    lut = np.array(
        [min(255, max(0, round(float(np.float32((i / 255.0) ** k)) * 255.0))) for i in range(256)],
        dtype=np.uint8,
    )
    ours = build_gamma_lut(k)
    np.testing.assert_array_equal(ours, lut)
    img = rand_img(seed=3)
    ref = cv2.LUT(img, ours)
    out = np.asarray(gamma_correct(img, k))
    np.testing.assert_array_equal(out, ref)


@pytest.mark.parametrize("k", [0.3, 0.5, 0.8, 0.9, 1.0, 1.2, 1.8, 2.4, 3.0])
def test_gamma_poly_path_exact(k):
    """The pipeline's poly-served gamma (fit_branch_poly + corrections) must
    reproduce the exact reference LUT for every practical k; fit failure
    (falling back to pow) is only tolerated, not expected."""
    from raw_image_pipeline_tpu.ops.gamma import (
        gamma_apply_poly,
        gamma_corrections_poly,
        gamma_poly_coeffs,
    )

    fit = gamma_poly_coeffs(k)
    assert fit is not None, f"poly fit failed for k={k}"
    co, root = fit
    idx, val = gamma_corrections_poly(k, co, root)
    n_corr = int((np.asarray(idx) >= 0).sum())
    assert n_corr <= 24, f"k={k}: {n_corr} corrections (select chain too deep)"
    full = np.arange(256, dtype=np.uint8).reshape(16, 16)
    out = np.asarray(
        gamma_apply_poly(jnp.asarray(full), jnp.asarray(co),
                         jnp.asarray(idx), jnp.asarray(val), root=root)
    )
    np.testing.assert_array_equal(out, build_gamma_lut(k).reshape(16, 16))


# ---------------------------------------------------------------- color calibration

def test_color_calibration_matches_reference_math():
    img = rand_img(seed=4)
    M = np.array([[2.4276948, 0.21479778, -0.30818],
                  [0.09277014, 1.1962607, -0.09772757],
                  [-0.24436986, -0.22239459, 2.099912]])
    bias = np.array([1.5, -2.0, 3.0])
    # reference math (color_calibration.cpp:91-104): f32 pixels * M^T via
    # cv::gemm, + bias, convertTo(CV_8U) = rint + saturate. The golden is
    # cv2.gemm itself — NOT numpy's BLAS matmul, whose fma-based K=3 kernel
    # differs from cv::gemm's plain left-associative chain at ~22% of f32
    # values (~1% of final u8 pixels); cv2.gemm == (p0+p1)+p2 exactly,
    # verified over 20 random matrices x 100k pixels with zero mismatches.
    flat = img.reshape(-1, 3).astype(np.float32)
    ref = cv2.gemm(flat, M.T.astype(np.float32), 1.0, None, 0.0)
    ref = ref.reshape(img.shape) + bias.astype(np.float32)
    ref = np.clip(np.rint(ref), 0, 255).astype(np.uint8)
    out = np.asarray(color_correct(img, M.astype(np.float32), bias.astype(np.float32)))
    np.testing.assert_array_equal(out, ref)

    # and the chain structure must hold for arbitrary runtime matrices
    rng2 = np.random.default_rng(99)
    for _ in range(3):
        M2 = (rng2.standard_normal((3, 3)) * rng2.uniform(0.1, 3)).astype(np.float32)
        b2 = (rng2.standard_normal(3) * 5).astype(np.float32)
        ref2 = cv2.gemm(flat, M2.T, 1.0, None, 0.0).reshape(img.shape) + b2
        ref2 = np.clip(np.rint(ref2), 0, 255).astype(np.uint8)
        out2 = np.asarray(color_correct(img, M2, b2))
        np.testing.assert_array_equal(out2, ref2)


# ---------------------------------------------------------------- colorspaces

def test_bgr2hsv_bit_exact():
    img = rand_img((211, 173, 3), 5)
    np.testing.assert_array_equal(np.asarray(cs.bgr_to_hsv_u8(img)),
                                  cv2.cvtColor(img, cv2.COLOR_BGR2HSV))


def test_hsv2bgr_exhaustive_bit_exact():
    """HSV->BGR: bit-exact vs cv2 5.0's (SIMD/fma) path on EVERY u8 HSV
    triple — all 2^24 inputs, checked in slabs wide enough for cv2 to take
    its vectorized kernel (the one real frames hit)."""
    aa, bb = np.meshgrid(
        np.arange(256, dtype=np.uint8), np.arange(256, dtype=np.uint8),
        indexing="ij",
    )
    for h0 in range(0, 256, 32):
        Hs = np.arange(h0, h0 + 32, dtype=np.uint8)
        hsv = np.stack(
            [
                np.broadcast_to(Hs[:, None, None], (32, 256, 256)),
                np.broadcast_to(aa, (32, 256, 256)),
                np.broadcast_to(bb, (32, 256, 256)),
            ],
            axis=-1,
        ).reshape(32, -1, 3)
        ref = cv2.cvtColor(hsv, cv2.COLOR_HSV2BGR)
        got = np.asarray(cs.hsv_to_bgr_u8(hsv))
        np.testing.assert_array_equal(got, ref)


def test_hsv2bgr_scalar_kernel_exact():
    """cv2's SCALAR row kernel (used for the last width%32 pixels of every
    row, or whole sub-32-px rows) is replicated bit-exactly: same fma tab
    entries as the SIMD kernel, final *255 ROUNDED instead of truncated
    (verified over ALL 2^24 inputs offline; sampled here). Width-16 Mats
    isolate the scalar kernel on the cv2 side."""
    img = rand_img((1 << 18, 16, 3), 61)
    ref = cv2.cvtColor(img, cv2.COLOR_HSV2BGR)
    h, s, v = img[..., 0], img[..., 1], img[..., 2]
    out = np.stack(
        [np.asarray(p) for p in cs.hsv_to_bgr_planes_scalar(h, s, v)], -1
    )
    np.testing.assert_array_equal(out, ref)


def test_enhancer_mixed_kernels_exact_at_reference_size():
    """The enhancer mixes cv2's SIMD and scalar row kernels by column
    (ops/color_enhancer), making it bit-exact at ANY width — including the
    reference's native 720x540 (16-px scalar tail per row,
    alphasense_calib_example.yaml:3-4) and sub-32-px frames, which
    previously sat in a <=1 LSB envelope."""
    from raw_image_pipeline_tpu.ops.color_enhancer import enhance

    gains = (1.0, 1.2, 1.0)
    for shape, seed in (((540, 720, 3), 62), ((64, 33, 3), 63),
                        ((40, 31, 3), 64), ((5000, 1, 3), 65)):
        img = rand_img(shape, seed)
        hsv = cv2.cvtColor(img, cv2.COLOR_BGR2HSV)
        hsv = cv2.multiply(hsv, gains + (0,))
        ref = cv2.cvtColor(hsv, cv2.COLOR_HSV2BGR)
        out = np.asarray(enhance(img, np.array(gains, np.float32)))
        np.testing.assert_array_equal(out, ref, err_msg=str(shape))


def test_bgr2gray_f32_exact():
    img = rand_img((64, 64, 3), 7).astype(np.float32)
    ref = cv2.cvtColor(img, cv2.COLOR_BGR2GRAY)
    out = np.asarray(cs.bgr_to_gray_f32(img))
    np.testing.assert_allclose(out, ref, atol=1e-3, rtol=0)


def test_lab_forward_exhaustive_census():
    """Forward Lab: bit-exact vs cv2 5.0 over ALL 2^24 BGR triples.

    cv2's 8u path is the classic integer-table path (confirmed by
    disassembling libopencv_imgproc 4.6, whose output is exhaustively
    identical to cv2 5.0's); the former 1671-triple residual came from two
    cbrt-table entries that OpenCV's softfloat f32 build rounds differently
    from a float64 build — now replicated op-for-op."""
    aa, bb = np.meshgrid(
        np.arange(256, dtype=np.uint8), np.arange(256, dtype=np.uint8),
        indexing="ij",
    )
    bad = 0
    worst = 0
    for b0 in range(0, 256, 64):
        Bs = np.arange(b0, b0 + 64, dtype=np.uint8)
        img = np.stack(
            [
                np.broadcast_to(Bs[:, None, None], (64, 256, 256)),
                np.broadcast_to(aa, (64, 256, 256)),
                np.broadcast_to(bb, (64, 256, 256)),
            ],
            axis=-1,
        ).reshape(64, -1, 3)
        ref = cv2.cvtColor(img, cv2.COLOR_BGR2Lab)
        got = np.asarray(cs.bgr_to_lab_u8(img))
        np.testing.assert_array_equal(got, ref)


def test_lab_inverse_exhaustive_bit_exact():
    """Lab->BGR: bit-exact vs cv2 5.0's Lab2RGBinteger on EVERY u8 Lab
    triple (all 2^24 inputs, checked in slabs)."""
    aa, bb = np.meshgrid(
        np.arange(256, dtype=np.uint8), np.arange(256, dtype=np.uint8),
        indexing="ij",
    )
    for l0 in range(0, 256, 32):
        Ls = np.arange(l0, l0 + 32, dtype=np.uint8)
        lab = np.stack(
            [
                np.broadcast_to(Ls[:, None, None], (32, 256, 256)),
                np.broadcast_to(aa, (32, 256, 256)),
                np.broadcast_to(bb, (32, 256, 256)),
            ],
            axis=-1,
        ).reshape(32, -1, 3)
        ref = cv2.cvtColor(lab, cv2.COLOR_Lab2BGR)
        got = np.asarray(cs.lab_to_bgr_u8(lab))
        np.testing.assert_array_equal(got, ref)


# ---------------------------------------------------------------- color enhancer

def test_color_enhancer_vs_cv2_composition():
    """Golden = the reference composition done with cv2 primitives
    (color_enhancer.cpp:38-47). Bit-exact at sizes where cv2 runs its
    vectorized HSV2BGR kernel throughout (below ~1MP cv2 mixes in a scalar
    kernel that disagrees with its own SIMD one at 1 LSB on ~0.7% of
    pixels — see test_hsv2bgr_scalar_path_envelope)."""
    img = rand_img((1024, 512, 3), 9)
    gains = (1.0, 1.5, 1.0)
    hsv = cv2.cvtColor(img, cv2.COLOR_BGR2HSV)
    hsv = cv2.multiply(hsv, gains + (0,))
    ref = cv2.cvtColor(hsv, cv2.COLOR_HSV2BGR)
    out = np.asarray(enhance(img, np.array(gains, np.float32)))
    np.testing.assert_array_equal(out, ref)


# ---------------------------------------------------------------- vignetting

def test_vignetting_vs_cv2_composition_bit_exact():
    """Golden = reference composition with cv2 (vignetting_correction.cpp:68-93)
    on the real Alphasense fixture: bit-exact (the Lab->BGR inverse is an
    exact replica of cv2's integer path; the forward's ~1e-4 interpolated
    residual does not fire on this natural image)."""
    img = cv2.imread("tests/fixtures/alphasense.png")
    h, w = img.shape[:2]
    scale, a2, a4 = 1.5, 1e-3, 1e-6
    mask = build_vignetting_mask(h, w, scale, a2, a4)
    lab = cv2.cvtColor(img, cv2.COLOR_BGR2Lab)
    L = lab[..., 0].astype(np.float32) * mask
    lab2 = lab.copy()
    lab2[..., 0] = np.clip(np.rint(L), 0, 255).astype(np.uint8)
    ref = cv2.cvtColor(lab2, cv2.COLOR_Lab2BGR)
    out = np.asarray(correct(img, mask))
    np.testing.assert_array_equal(out, ref)


def test_vignetting_vs_cv2_composition_noise():
    """On synthetic noise the forward Lab's interpolated-LUT residual
    (+-1 in L/a/b at ~1e-4 rate) can amplify through the exact inverse's
    gamut edges; bound the tail."""
    img = rand_img((256, 320, 3), 11)
    mask = build_vignetting_mask(256, 320, 1.5, 1e-3, 1e-6)
    lab = cv2.cvtColor(img, cv2.COLOR_BGR2Lab)
    L = lab[..., 0].astype(np.float32) * mask
    lab2 = lab.copy()
    lab2[..., 0] = np.clip(np.rint(L), 0, 255).astype(np.uint8)
    ref = cv2.cvtColor(lab2, cv2.COLOR_Lab2BGR)
    out = np.asarray(correct(img, mask))
    d = np.abs(out.astype(int) - ref.astype(int))
    assert (d > 0).mean() < 1e-3, (d.max(), (d > 0).mean())


def test_vignetting_mask_properties():
    mask = build_vignetting_mask(540, 720, 1.5, 1e-3, 1e-6)
    assert mask.shape == (540, 720)
    # center ~1, corners = 1 + scale
    assert abs(mask[270, 360] - 1.0) < 1e-3
    assert abs(mask[0, 0] - 2.5) < 1e-6


# ---------------------------------------------------------------- white balance

def test_pca_wb_matches_float64_reference():
    """Replicate the reference arithmetic in float64 numpy as the golden."""
    img = rand_img((41, 67, 3), 11)
    b = img[..., 0].astype(np.float64)
    g = img[..., 1].astype(np.float64)
    r = img[..., 2].astype(np.float64)

    def gold(c):
        c2 = c * c
        A = np.array([[c2.sum(), c.sum()], [c2.max(), c.max()]])
        y = np.array([g.sum(), g.max()])
        x = np.linalg.solve(A, y)
        out = x[0] * c2 + x[1] * c
        return np.clip(np.rint(np.minimum(out, 255.0)), 0, 255).astype(np.uint8)

    ref = np.stack([gold(b), img[..., 1], gold(r)], axis=-1)
    out = np.asarray(balance_white_pca(img))
    d = np.abs(out.astype(int) - ref.astype(int))
    assert d.max() <= 1, d.max()


def test_simple_wb_stretch():
    from util_wb import xphoto_simple

    img = rand_img((50, 50, 3), 12)
    out = np.asarray(balance_white_simple(img, 20.0))
    np.testing.assert_array_equal(out, xphoto_simple(img, 20.0))
    # p=0 keeps the full [min, max] stretch
    out0 = np.asarray(balance_white_simple(img, 0.0))
    np.testing.assert_array_equal(out0, xphoto_simple(img, 0.0))


def test_grey_world_wb():
    img = rand_img((50, 50, 3), 13)
    out = np.asarray(balance_white_grey_world(img, 1.0))
    # with thresh=1.0 every pixel is included: channel means should equalize
    means = out.reshape(-1, 3).mean(0)
    assert means.std() < 2.0
    # gray image is a fixed point
    gray = np.full((20, 20, 3), 77, np.uint8)
    np.testing.assert_array_equal(np.asarray(balance_white_grey_world(gray, 1.0)), gray)


def test_gamma_gpu_default_bt709():
    """use_gpu + method="default" selects the fixed BT.709 curve with
    is_forward = (k <= 1.0), like cv::cuda::gammaCorrection
    (gamma_correction.cpp:29-33, 66-74; quirk §8.15)."""
    import dataclasses
    from raw_image_pipeline_tpu.config import PipelineConfig
    from raw_image_pipeline_tpu.pipeline import build_pipeline
    from raw_image_pipeline_tpu.ops.gamma import build_bt709_lut

    img = rand_img((32, 48, 3), 21)
    for k, forward in ((0.9, True), (1.8, False)):
        cfg = PipelineConfig()
        cfg = cfg.replace(
            gamma_correction=dataclasses.replace(
                cfg.gamma_correction, enabled=True, method="default",
                k=k, gpu=True,
            )
        )
        pipe = build_pipeline(cfg, "bgr8", frame_hw=img.shape[:2])
        out, _ = pipe(img[None])
        lut = build_bt709_lut(forward)
        np.testing.assert_array_equal(np.asarray(out["processed"])[0], lut[img])
    # method="custom" keeps the k-LUT even under the GPU backend
    # (cv::cuda::LookUpTable path, gamma_correction.cpp:62-64)
    from raw_image_pipeline_tpu.ops.gamma import build_gamma_lut
    cfg = PipelineConfig()
    cfg = cfg.replace(
        gamma_correction=dataclasses.replace(
            cfg.gamma_correction, enabled=True, method="custom", k=0.9, gpu=True,
        )
    )
    pipe = build_pipeline(cfg, "bgr8", frame_hw=img.shape[:2])
    out, _ = pipe(img[None])
    np.testing.assert_array_equal(
        np.asarray(out["processed"])[0], build_gamma_lut(0.9)[img]
    )


# ------------------------------------------------- gamma∘vignetting composition

def test_composed_gamma_lab_table_exact():
    """The fused gamma→vignetting fast path serves the COMPOSED 256-entry
    table ctab[i] = LAB_GAMMA_TAB[gamma_lut_k[i]] (ops/vignetting
    composition block); provably exact by full-domain enumeration against
    the two-stage path for every k class (the +45 us/frame steady lever,
    round 5)."""
    import jax.numpy as jnp

    from raw_image_pipeline_tpu.ops import vignetting as V
    from raw_image_pipeline_tpu.ops.colorspace import _LAB_GAMMA
    from raw_image_pipeline_tpu.ops.gamma import (
        gamma_apply_poly,
        gamma_corrections_poly,
        gamma_poly_coeffs,
    )

    xs = jnp.arange(256, dtype=jnp.int32)
    for k in (0.9, 0.5, 1.0, 1.8, 2.2):
        fit = gamma_poly_coeffs(k)
        assert fit is not None, k
        coeffs, root = fit
        idx, val = V.composed_gamma_corrections(k, coeffs, root, 16)
        fn = V.composed_gamma_lab_fn(
            jnp.asarray(coeffs), jnp.asarray(idx), jnp.asarray(val), root
        )
        got = np.asarray(fn(xs))
        # two-stage reference: exact gamma LUT application then the exact
        # Lab linearize table
        gi, gv = gamma_corrections_poly(k, coeffs, root)
        g = np.asarray(gamma_apply_poly(
            xs, jnp.asarray(coeffs), jnp.asarray(gi), jnp.asarray(gv),
            root=root,
        ))
        want = np.asarray(_LAB_GAMMA(jnp.asarray(g.astype(np.int32))))
        np.testing.assert_array_equal(got, want, err_msg=f"k={k}")
        np.testing.assert_array_equal(
            got, V.composed_gamma_lab_table(k), err_msg=f"k={k}"
        )


def test_composed_pipeline_matches_two_stage():
    """Full chain with gamma+vignetting: the composed fast path must stay
    bitwise equal to the debug build (reference two-stage order)."""
    import dataclasses

    import __graft_entry__ as ge
    from raw_image_pipeline_tpu.pipeline import build_pipeline

    h, w = 64, 48
    cfg = ge._full_config((h, w), for_undistortion=False)
    rng = np.random.default_rng(11)
    bay = rng.integers(0, 256, (2, h, w), np.uint8)
    for k in (0.9, 2.2):
        c = cfg.replace(gamma_correction=dataclasses.replace(
            cfg.gamma_correction, k=k))
        fast = build_pipeline(c, "bayer_gbrg8", frame_hw=(h, w))
        dbg = build_pipeline(c, "bayer_gbrg8", frame_hw=(h, w), debug=True)
        o1, _ = fast(bay)
        o2, _ = dbg(bay)
        np.testing.assert_array_equal(
            np.asarray(o1["processed"]), np.asarray(o2["processed"]),
            err_msg=f"k={k}",
        )


def test_enhancer_extreme_gains_exact():
    """cv::multiply(u8, Scalar) forms products in f64 and cvRounds; the
    device's f32 multiply disagrees at up to 6 channel values for ~0.06%
    of gains (round-5 extreme fuzz: 20/60 chain seeds failed before the
    fix). gain_corrections patches those entries as runtime params."""
    import jax.numpy as jnp

    from raw_image_pipeline_tpu.ops.color_enhancer import enhance

    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (64, 150, 3), np.uint8)
    cases = [(2.9, 2.9, 0.7), (0.0, 0.1, 0.7), (1.0, 0.1, 0.7),
             (0.5, 0.0, 2.9), (2.2999999836787066, 1.0, 1.0)]
    for seed in range(6):
        cases.append(tuple(np.random.default_rng(seed + 999).uniform(0, 3, 3)))
    for hg, sg, vg in cases:
        hsv = cv2.cvtColor(img, cv2.COLOR_BGR2HSV)
        ref = cv2.cvtColor(cv2.multiply(hsv, (hg, sg, vg, 0)),
                           cv2.COLOR_HSV2BGR)
        got = np.asarray(enhance(jnp.asarray(img[None]), [hg, sg, vg]))[0]
        np.testing.assert_array_equal(got, ref, err_msg=str((hg, sg, vg)))
