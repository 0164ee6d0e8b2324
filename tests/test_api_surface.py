"""API surface completeness: every method the reference pybind11 module
exposes (raw_image_pipeline_python.cpp:14-73) must exist here, plus apply()
in-place semantics and setter behavior."""

import inspect

import cv2
import numpy as np
import pytest

from raw_image_pipeline_tpu import RawImagePipeline
from raw_image_pipeline_tpu.config import (
    DEFAULT_CALIBRATION_PATH,
    DEFAULT_PARAMS_PATH,
)

# the full binding list from the reference module
REFERENCE_METHODS = [
    "apply", "process", "load_params", "set_gpu", "set_debug",
    "set_debayer", "set_debayer_encoding",
    "set_flip", "set_flip_angle",
    "set_white_balance", "set_white_balance_method",
    "set_white_balance_percentile", "set_white_balance_saturation_threshold",
    "set_white_balance_temporal_consistency",
    "set_gamma_correction", "set_gamma_correction_method",
    "set_gamma_correction_k",
    "set_vignetting_correction", "set_vignetting_correction_parameters",
    "set_color_enhancer", "set_color_enhancer_hue_gain",
    "set_color_enhancer_saturation_gain", "set_color_enhancer_value_gain",
    "set_color_calibration", "set_color_calibration_matrix",
    "set_color_calibration_bias",
    "set_undistortion", "set_undistortion_image_size",
    "set_undistortion_new_image_size", "set_undistortion_balance",
    "set_undistortion_fov_scale", "set_undistortion_camera_matrix",
    "set_undistortion_distortion_coeffs", "set_undistortion_distortion_model",
    "set_undistortion_rectification_matrix", "set_undistortion_projection_matrix",
    "get_dist_image_height", "get_dist_image_width",
    "get_dist_distortion_model", "get_dist_camera_matrix",
    "get_dist_distortion_coefficients", "get_dist_rectification_matrix",
    "get_dist_projection_matrix",
    "get_rect_image_height", "get_rect_image_width",
    "get_rect_distortion_model", "get_rect_camera_matrix",
    "get_rect_distortion_coefficients", "get_rect_rectification_matrix",
    "get_rect_projection_matrix",
    "reset_white_balance_temporal_consistency",
]


def test_every_reference_method_exists():
    missing = [m for m in REFERENCE_METHODS
               if not callable(getattr(RawImagePipeline, m, None))]
    assert not missing, f"missing binding methods: {missing}"


@pytest.fixture()
def pipe():
    p = RawImagePipeline(False, DEFAULT_PARAMS_PATH, DEFAULT_CALIBRATION_PATH, "")
    p.set_white_balance(False)
    p.set_undistortion(False)
    return p


def test_apply_in_place(pipe):
    img = cv2.imread("tests/fixtures/alphasense.png")
    pipe.set_gamma_correction(True)
    pipe.set_gamma_correction_k(0.8)
    buf = img.copy()
    ok = pipe.apply(buf, "bgr8")
    assert ok is True
    assert not np.array_equal(buf, img)  # mutated in place
    np.testing.assert_array_equal(buf, pipe.get_processed_image())


def test_apply_shape_change_leaves_buffer(pipe):
    """When the output shape differs (flip 90), the input buffer cannot be
    written back — matching the binding, where the internal cv::Mat rebind
    leaves the shared numpy buffer untouched."""
    img = cv2.imread("tests/fixtures/alphasense.png")
    pipe.set_flip(True)
    pipe.set_flip_angle(90)
    buf = img.copy()
    ok = pipe.apply(buf, "bgr8")
    assert ok is True
    np.testing.assert_array_equal(buf, img)
    assert pipe.get_processed_image().shape == (720, 540, 3)


def test_setters_affect_output(pipe):
    img = cv2.imread("tests/fixtures/alphasense.png")
    base = pipe.process(img, "bgr8")
    pipe.set_gamma_correction(True)
    pipe.set_gamma_correction_k(0.5)
    bright = pipe.process(img, "bgr8")
    assert bright.mean() > base.mean()
    pipe.set_gamma_correction(False)
    np.testing.assert_array_equal(pipe.process(img, "bgr8"), base)


def test_is_enabled_getters(pipe):
    assert pipe.is_debayer_enabled() is True
    pipe.set_vignetting_correction(True)
    assert pipe.is_vignetting_correction_enabled() is True
    assert pipe.is_undistortion_enabled() is False
