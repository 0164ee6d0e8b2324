"""Randomized-config full-chain parity: draw stage combinations and compare
against a cv2-composed golden of the same chain. Catches stage-interaction
bugs that per-stage tests can't."""

import dataclasses

import cv2
import numpy as np
import pytest

from raw_image_pipeline_tpu.config import (
    DEFAULT_CALIBRATION_PATH,
    CameraCalibration,
    PipelineConfig,
    load_camera_calibration,
)
from raw_image_pipeline_tpu.ops.gamma import build_gamma_lut
from raw_image_pipeline_tpu.ops.vignetting import build_vignetting_mask
from raw_image_pipeline_tpu.pipeline import build_pipeline


def mosaic_gbrg(img):
    """Mosaic a BGR image to a bayer_gbrg8 frame (the empirically
    verified 'grbg' physical phase for OpenCV's gb code — shared helper
    for the tests that used to duplicate this snippet)."""
    ch = {"g": 1, "b": 0, "r": 2}
    phase = "grbg"
    b = np.zeros(img.shape[:2], np.uint8)
    for k, (di, dj) in enumerate([(0, 0), (0, 1), (1, 0), (1, 1)]):
        b[di::2, dj::2] = img[di::2, dj::2, ch[phase[k]]]
    return b


@pytest.fixture(scope="module")
def bayer():
    return mosaic_gbrg(cv2.imread("tests/fixtures/alphasense.png"))


def draw_config(rng) -> PipelineConfig:
    cfg = PipelineConfig()
    angle = int(rng.choice([0, 90, 180, 270]))
    wb_method = str(rng.choice(["none", "grey_world", "pca"]))
    mat = np.eye(3) + rng.normal(0, 0.1, (3, 3))
    return PipelineConfig(
        flip=dataclasses.replace(cfg.flip, enabled=bool(rng.random() < 0.7),
                                 angle=angle),
        white_balance=dataclasses.replace(
            cfg.white_balance, enabled=wb_method != "none",
            method=wb_method if wb_method != "none" else "ccc",
            saturation_bright_thr=float(rng.uniform(0.6, 1.0)),
        ),
        color_calibration=dataclasses.replace(
            cfg.color_calibration, enabled=bool(rng.random() < 0.6),
            matrix=tuple(mat.ravel()), bias=tuple(rng.uniform(-3, 3, 3)),
        ),
        gamma_correction=dataclasses.replace(
            cfg.gamma_correction, enabled=bool(rng.random() < 0.7),
            k=float(rng.uniform(0.5, 1.8)),
        ),
        vignetting_correction=dataclasses.replace(
            cfg.vignetting_correction, enabled=bool(rng.random() < 0.5),
            scale=float(rng.uniform(0.5, 2.0)), a2=1e-3, a4=1e-6,
        ),
        color_enhancer=dataclasses.replace(
            cfg.color_enhancer, enabled=bool(rng.random() < 0.5),
            saturation_gain=float(rng.uniform(0.8, 1.5)),
        ),
        undistortion=dataclasses.replace(
            cfg.undistortion, enabled=bool(rng.random() < 0.5),
            balance=float(rng.choice([0.0, 0.5])),
            fov_scale=float(rng.choice([0.8, 1.0, 1.2])),
            # both reference-build remap arithmetics (ops/undistortion)
            interpolation=str(rng.choice(["lerp", "fixed32"])),
        ),
        calibration=load_camera_calibration(DEFAULT_CALIBRATION_PATH),
    )




def pca_golden(img):
    """Reference PCA semantics (white_balance.cpp:73-136) mirrored in
    numpy at the arithmetic level the native pca_oracle pinned: exact
    channel sums narrowed to f32, Eigen compute_inverse_size2 op order in
    f32, per-pixel lut[c] = cvRound(min(rn_f32(x0*c^2 + x1*c), 255)).
    The old f64 np.linalg.solve proxy diverges from the f32 Eigen solve
    at some frame statistics (extended-fuzz seed 140, max 4 LSB)."""
    f32, f64 = np.float32, np.float64
    v = img.astype(np.int64)
    g = v[..., 1]
    sg = f32(g.sum())
    mg = f32(g.max())

    def coeffs(c):
        s2 = f32(f64((c * c).sum()))
        s = f32(c.sum())
        m = f32(c.max())
        m2 = f32(m) * f32(m)
        det = f32(s2 * m) - f32(s * m2)
        invdet = f32(1.0) / det
        i00 = f32(m * invdet)
        i01 = -f32(s * invdet)
        i10 = -f32(m2 * invdet)
        i11 = f32(s2 * invdet)
        x0 = f32(i00 * sg) + f32(i01 * mg)
        x1 = f32(i10 * sg) + f32(i11 * mg)
        return f64(x0), f64(x1)

    def rn_f32_exact(frac):
        # correctly-rounded f32 of an exact rational (the f64-then-f32
        # shortcut double-rounds at f32 halfway points — exactly the
        # boundary class the exact-limb pipeline LUT gets right)
        from fractions import Fraction

        c0 = np.float32(float(frac))
        cands = sorted({
            np.nextafter(c0, np.float32(-np.inf), dtype=np.float32),
            c0,
            np.nextafter(c0, np.float32(np.inf), dtype=np.float32),
        })
        errs = [abs(Fraction(float(c)) - frac) for c in cands]
        e = min(errs)
        tied = [c for c, er in zip(cands, errs) if er == e]
        if len(tied) == 1:
            return tied[0]
        # half-even tie
        for c in tied:
            if int(np.float32(c).view(np.uint32)) % 2 == 0:
                return c
        return tied[0]

    from fractions import Fraction

    out = img.copy()
    for ci in (0, 2):
        x0, x1 = coeffs(v[..., ci])
        fx0, fx1 = Fraction(x0), Fraction(x1)
        lut = np.empty(256, np.uint8)
        for c in range(256):
            val = rn_f32_exact(fx0 * c * c + fx1 * c)
            lut[c] = np.clip(np.rint(min(np.float64(val), 255.0)), 0, 255)
        out[..., ci] = lut[img[..., ci]]
    return out


def cv2_golden(bayer, config: PipelineConfig):
    img = cv2.demosaicing(bayer, cv2.COLOR_BayerGB2BGR)
    img = cv2.cvtColor(img, cv2.COLOR_RGB2BGR)
    fl = config.flip
    if fl.enabled:
        if fl.angle == 90:
            img = cv2.flip(cv2.transpose(img), 1)
        elif fl.angle == 180:
            img = cv2.flip(img, -1)
        elif fl.angle == 270:
            img = cv2.flip(cv2.transpose(img), 0)
    wb = config.white_balance
    if wb.enabled:
        if wb.method == "grey_world":
            from util_wb import xphoto_grey_world

            img = xphoto_grey_world(img, wb.saturation_bright_thr)
        elif wb.method == "pca":
            img = pca_golden(img)
    cc = config.color_calibration
    if cc.enabled:
        # cv2.gemm, NOT numpy BLAS: numpy's fma-based sgemm differs from
        # cv::gemm's plain left-associative K=3 chain at ~1% of final u8
        # pixels (PARITY.md color-calibration row) — the old numpy proxy
        # here hid inside the pre-round-5 fuzz envelope
        flat = img.reshape(-1, 3).astype(np.float32)
        mixed = cv2.gemm(flat, cc.matrix_np().T.astype(np.float32), 1.0, None, 0.0)
        img = np.clip(
            np.rint(mixed + cc.bias_np().astype(np.float32)), 0, 255,
        ).astype(np.uint8).reshape(img.shape)
    gc = config.gamma_correction
    if gc.enabled:
        img = cv2.LUT(img, build_gamma_lut(gc.k))
    vc = config.vignetting_correction
    if vc.enabled:
        mask = build_vignetting_mask(img.shape[0], img.shape[1], vc.scale, vc.a2, vc.a4)
        lab = cv2.cvtColor(img, cv2.COLOR_BGR2Lab)
        L = lab[..., 0].astype(np.float32) * mask
        lab[..., 0] = np.clip(np.rint(L), 0, 255).astype(np.uint8)
        img = cv2.cvtColor(lab, cv2.COLOR_Lab2BGR)
    ce = config.color_enhancer
    if ce.enabled:
        hsv = cv2.cvtColor(img, cv2.COLOR_BGR2HSV)
        hsv = cv2.multiply(hsv, (ce.hue_gain, ce.saturation_gain, ce.value_gain, 0))
        img = cv2.cvtColor(hsv, cv2.COLOR_HSV2BGR)
    un = config.undistortion
    c = config.calibration
    if un.enabled and c.calibration_available and c.distortion_model != "none":
        size = (c.image_width, c.image_height)
        newK = cv2.fisheye.estimateNewCameraMatrixForUndistortRectify(
            c.K(), c.D(), size, c.R(), balance=un.balance, new_size=size,
            fov_scale=un.fov_scale,
        )
        mx, my = cv2.fisheye.initUndistortRectifyMap(c.K(), c.D(), c.R(), newK,
                                                     size, cv2.CV_32F)
        if un.interpolation == "fixed32":
            # force cv2 onto its non-IPP fixed-point path (the semantics
            # mode="fixed32" replicates) via pre-converted maps
            m1, m2 = cv2.convertMaps(mx, my, cv2.CV_16SC2)
            img = cv2.remap(img, m1, m2, cv2.INTER_LINEAR,
                            borderMode=cv2.BORDER_CONSTANT, borderValue=0)
        else:
            img = cv2.remap(img, mx, my, cv2.INTER_LINEAR,
                            borderMode=cv2.BORDER_CONSTANT, borderValue=0)
    return img


@pytest.mark.parametrize("seed", range(8))
def test_random_config_full_chain(bayer, seed):
    rng = np.random.default_rng(seed)
    config = draw_config(rng)
    # two seeds run on an ODD-cropped frame (539x719): exercises the xla
    # debayer fallback, the enhancer's scalar column tail, the odd-size
    # fisheye init (round-5 bug class) and the CCC upsample fallback —
    # with a matching odd calibration so undistortion can run
    if seed in (2, 5):
        bayer = np.ascontiguousarray(bayer[:539, :719])
        # only the calibration SIZE changes (intrinsics keep the
        # full-frame values — the crop shares the same optical center)
        config = config.replace(calibration=dataclasses.replace(
            config.calibration, image_width=719, image_height=539))
    pipe = build_pipeline(config, "bayer_gbrg8", frame_hw=bayer.shape)
    out, _ = pipe(bayer[None])
    got = np.asarray(out["processed"])[0]
    golden = cv2_golden(bayer, config)
    assert got.shape == golden.shape, (got.shape, golden.shape)
    # Every stage is bit-exact vs its cv2 counterpart since round 5
    # (PARITY.md) — randomized stage combinations must be too.
    np.testing.assert_array_equal(got, golden, err_msg=f"seed {seed}")


@pytest.mark.parametrize("seed", [90003, 90011])
def test_simple_wb_chain_interaction(bayer, seed):
    """Chain-level parity for the `simple` WB method (the randomized
    fuzz only draws grey_world/pca): demosaic + SimpleWB + gamma at a
    random crop, bit-exact vs the mirror-composed golden (30-seed
    round-5 sweep was clean; two seeds pinned here)."""
    from raw_image_pipeline_tpu.ops.gamma import build_gamma_lut
    from util_wb import xphoto_simple

    rng = np.random.default_rng(seed)
    h = int(rng.integers(48, bayer.shape[0] + 1))
    w = int(rng.integers(48, bayer.shape[1] + 1))
    crop = np.ascontiguousarray(bayer[:h, :w])
    cfg = PipelineConfig()
    p = float(rng.choice([0.0, 5.0, 20.0, 45.0]))
    k = float(rng.uniform(0.5, 1.8))
    config = PipelineConfig(
        white_balance=dataclasses.replace(
            cfg.white_balance, enabled=True, method="simple",
            clipping_percentile=p),
        gamma_correction=dataclasses.replace(
            cfg.gamma_correction, enabled=True, k=k),
        calibration=dataclasses.replace(
            load_camera_calibration(DEFAULT_CALIBRATION_PATH),
            image_width=w, image_height=h),
    )
    pipe = build_pipeline(config, "bayer_gbrg8", frame_hw=crop.shape)
    out, _ = pipe(crop[None])
    got = np.asarray(out["processed"])[0]
    img = cv2.cvtColor(cv2.demosaicing(crop, cv2.COLOR_BayerGB2BGR),
                       cv2.COLOR_RGB2BGR)
    golden = cv2.LUT(xphoto_simple(img, p), build_gamma_lut(k))
    np.testing.assert_array_equal(got, golden)
