"""Planar (three-plane) op forms must be bit-identical to the packed ops.

The fast path carries separate u8 channel planes through the pointwise
stretch (pipeline.py "Internal PLANAR representation"); the packed ops are
slice/stack wrappers around the same planar cores, so equality here plus
the packed ops' own golden tests transfers every exactness claim to the
planar path. The full-chain guarantee is separately pinned by
test_pipeline.py::test_fast_path_equals_reference_order (fast/planar vs
debug/packed)."""

import numpy as np
import jax.numpy as jnp
import pytest

from raw_image_pipeline_tpu.ops.color_calibration import (
    color_correct,
    color_correct_planes,
)
from raw_image_pipeline_tpu.ops.color_enhancer import enhance, enhance_planes
from raw_image_pipeline_tpu.ops.colorspace import (
    bgr_to_hsv_planes,
    bgr_to_hsv_u8,
    bgr_to_lab_planes,
    bgr_to_lab_u8,
    hsv_to_bgr_planes,
    hsv_to_bgr_u8,
    lab_to_bgr_planes,
    lab_to_bgr_u8,
)
from raw_image_pipeline_tpu.ops.undistortion import (
    remap_bilinear_u8,
    remap_bilinear_u8_planes,
    remap_precompute,
)
from raw_image_pipeline_tpu.ops.vignetting import (
    build_vignetting_mask,
    correct,
    correct_planes,
)


@pytest.fixture(scope="module")
def img():
    rng = np.random.default_rng(42)
    base = rng.integers(0, 256, (2, 64, 96, 3), np.uint8)
    # force edge values (ties, saturation boundaries) into the sample
    base[0, :4, :4] = 0
    base[0, :4, 4:8] = 255
    base[1, :2, :8, 0] = 128
    return base


def planes_of(x):
    return jnp.asarray(x[..., 0]), jnp.asarray(x[..., 1]), jnp.asarray(x[..., 2])


def assert_planes_equal(planes, packed):
    for c, p in enumerate(planes):
        np.testing.assert_array_equal(np.asarray(p), np.asarray(packed)[..., c])


def test_hsv_planar_matches_packed(img):
    assert_planes_equal(bgr_to_hsv_planes(*planes_of(img)), bgr_to_hsv_u8(img))
    assert_planes_equal(hsv_to_bgr_planes(*planes_of(img)), hsv_to_bgr_u8(img))


def test_lab_planar_matches_packed(img):
    assert_planes_equal(bgr_to_lab_planes(*planes_of(img)), bgr_to_lab_u8(img))
    assert_planes_equal(lab_to_bgr_planes(*planes_of(img)), lab_to_bgr_u8(img))


def test_color_correct_planar_matches_packed(img):
    m = jnp.asarray(
        np.array([[1.8, -0.3, 0.1], [0.09, 1.2, -0.1], [-0.24, -0.22, 2.1]],
                 np.float32))
    bias = jnp.asarray(np.array([1.5, -2.0, 3.0], np.float32))
    assert_planes_equal(
        color_correct_planes(*planes_of(img), m, bias),
        color_correct(jnp.asarray(img), m, bias),
    )


def test_enhance_planar_matches_packed(img):
    from raw_image_pipeline_tpu.ops.color_enhancer import gain_corrections

    g64 = [1.0, 1.35, 1.0]
    gains = jnp.asarray(np.array(g64, np.float32))
    ci, cv_ = (jnp.asarray(a) for a in gain_corrections(g64))
    assert_planes_equal(
        enhance_planes(*planes_of(img), gains, corr=(ci, cv_)),
        enhance(jnp.asarray(img), g64),
    )


def test_vignetting_planar_matches_packed(img):
    mask = jnp.asarray(build_vignetting_mask(64, 96, 1.4, 1e-6, 1e-12))
    assert_planes_equal(
        correct_planes(*planes_of(img), mask), correct(jnp.asarray(img), mask)
    )


def test_remap_planar_matches_packed(img):
    h, w = 64, 96
    rng = np.random.default_rng(3)
    mx = (rng.uniform(-2, w + 1, (h, w))).astype(np.float32)
    my = (rng.uniform(-2, h + 1, (h, w))).astype(np.float32)
    base, weights = remap_precompute(mx, my, (h, w))
    base, weights = jnp.asarray(base), jnp.asarray(weights)
    bm = jnp.transpose(jnp.asarray(img), (1, 2, 0, 3))  # [H, W, B, C]
    packed = remap_bilinear_u8(bm, base, weights, (h, w), (h, w),
                               batch_minor=True)  # [Ho, Wo, B, C]
    planes = (bm[..., 0], bm[..., 1], bm[..., 2])
    out = remap_bilinear_u8_planes(planes, base, weights, (h, w), (h, w))
    # [Ho, Wo, C, B] vs [Ho, Wo, B, C]
    np.testing.assert_array_equal(
        np.asarray(out), np.moveaxis(np.asarray(packed), 2, 3)
    )


def test_chain_planar_internals_toggle_and_remap_tuning():
    # planar_internals=False (packed chain) and remap_tuning overrides are
    # the experiment knobs on make_isp_fn; both must be bit-identical to
    # the default fast path on the full chain incl. undistortion
    import dataclasses

    from raw_image_pipeline_tpu.config import CameraCalibration, PipelineConfig
    from raw_image_pipeline_tpu.pipeline import make_isp_fn, make_params

    calib = CameraCalibration(
        image_width=96, image_height=64,
        camera_matrix=(70.0, 0.0, 48.0, 0.0, 70.0, 32.0, 0.0, 0.0, 1.0),
        distortion_coefficients=(-0.04, -0.004, 0.004, -0.002),
        distortion_model="equidistant", calibration_available=True,
    )
    cfg = PipelineConfig()
    cfg = PipelineConfig(
        white_balance=dataclasses.replace(
            cfg.white_balance, enabled=True, method="ccc"),
        gamma_correction=dataclasses.replace(
            cfg.gamma_correction, enabled=True),
        vignetting_correction=dataclasses.replace(
            cfg.vignetting_correction, enabled=True),
        color_enhancer=dataclasses.replace(cfg.color_enhancer, enabled=True),
        undistortion=dataclasses.replace(cfg.undistortion, enabled=True),
        calibration=calib,
    )
    params = make_params(cfg, (64, 96))
    rng = np.random.default_rng(9)
    px = rng.integers(0, 256, (2, 64, 96), np.uint8)

    ref_fn = make_isp_fn(cfg, "bayer_gbrg8", False, keep_intermediates=False,
                         remap_src_hw=(64, 96))
    ref = np.asarray(ref_fn(params, px, None)[0]["processed"])
    for kwargs in (
        {"planar_internals": False},
        {"remap_tuning": (4, 550_000)},
        {"remap_tuning": (2, 1000), "planar_internals": False},
    ):
        fn = make_isp_fn(cfg, "bayer_gbrg8", False, keep_intermediates=False,
                         remap_src_hw=(64, 96), **kwargs)
        got = np.asarray(fn(params, px, None)[0]["processed"])
        np.testing.assert_array_equal(got, ref, err_msg=str(kwargs))
