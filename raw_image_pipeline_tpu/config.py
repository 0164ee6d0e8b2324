"""Configuration layer.

Frozen dataclasses mirroring the reference's YAML parameter schema 1:1, plus
loaders for the three reference file formats so existing files work verbatim:

  * pipeline params YAML      (reference: raw_image_pipeline/src/raw_image_pipeline/raw_image_pipeline.cpp:44-165,
                               config/pipeline_params_example.yaml)
  * Kalibr-style camera calib (reference: modules/undistortion.cpp:155-176,
                               config/alphasense_calib_example.yaml)
  * color calibration YAML    (reference: modules/color_calibration.cpp:52-76,
                               config/alphasense_color_calib_example.yaml)

Defaults below replicate the `utils::get(..., default)` fallbacks of the
reference loader exactly (raw_image_pipeline.cpp:58-163).

Known reference quirks handled here (see SURVEY.md §8):
  * `color_enhancer` enabled flag is read from key `run_color_enhancer`
    (raw_image_pipeline.cpp:137); we accept both `run_color_enhancer` and
    `enabled`.
  * The reference's color-enhancer YAML path leaves hue/saturation gains
    uninitialized C++ memory due to cross-wired setters
    (color_enhancer.cpp:23-33, raw_image_pipeline.cpp:143-145). That is
    undefined behavior with no well-defined output to match; we load the
    three gains straight through.
"""

from __future__ import annotations

import dataclasses
import os
from dataclasses import dataclass, field, replace
from typing import Optional, Tuple

import numpy as np
import yaml

_REPO_DIR = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DEFAULT_PARAMS_PATH = os.path.join(_REPO_DIR, "configs", "pipeline_params_example.yaml")
DEFAULT_CALIBRATION_PATH = os.path.join(_REPO_DIR, "configs", "alphasense_calib_example.yaml")
DEFAULT_COLOR_CALIBRATION_PATH = os.path.join(_REPO_DIR, "configs", "alphasense_color_calib_example.yaml")
DEFAULT_CCC_MODEL_PATH = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "models", "data", "ccc_default.bin"
)


def _get(node: Optional[dict], key: str, default):
    """YAML lookup with default, like utils::get (reference: utils.hpp:61-74)."""
    if not isinstance(node, dict):
        return default
    val = node.get(key, None)
    if val is None:
        return default
    return val


@dataclass(frozen=True)
class DebayerConfig:
    # reference defaults: raw_image_pipeline.cpp:58-64
    enabled: bool = True
    encoding: str = "auto"
    # TPU extension: which demosaic algorithm defines "the reference output".
    # "bilinear" matches the reference CPU path (cv::demosaicing + RGB/BGR
    # swap quirk, debayer.cpp:49-74); "mht" matches the reference GPU path
    # (Malvar-He-Cutler, debayer.cpp:89-120).
    algorithm: str = "bilinear"
    # TPU extension: 16-bit Bayer handling. "error" replicates the reference
    # (16-bit patterns are listed but unimplemented there and throw,
    # debayer.hpp:74-81); "scale8" demosaics at 16 bits then scales to the
    # 8-bit chain (>>8).
    bayer16: str = "error"


@dataclass(frozen=True)
class FlipConfig:
    # reference defaults: raw_image_pipeline.cpp:67-75
    enabled: bool = False
    angle: int = 0  # one of {0, 90, 180, 270}; others are a no-op (flip.cpp:37-58)


@dataclass(frozen=True)
class WhiteBalanceConfig:
    # reference defaults: raw_image_pipeline.cpp:78-95
    enabled: bool = False
    method: str = "ccc"  # simple | grey_world | gray_world | learned | ccc | pca
    clipping_percentile: float = 20.0
    saturation_bright_thr: float = 0.8
    saturation_dark_thr: float = 0.1
    temporal_consistency: bool = True
    # TPU extension: path to the FFCC model binary (reference hardcodes
    # model/default.bin, convolutional_color_constancy.cpp:16).
    ccc_model_path: str = DEFAULT_CCC_MODEL_PATH
    # CCC log-chroma origin (the reference node's setUV0 dynamic-reconfigure
    # knob, ccc.cpp:349-357 / cfg/RawImagePipelineWhiteBalance.cfg). A
    # runtime parameter in the built pipeline: retuning never recompiles.
    ccc_uv0: float = -1.421875


@dataclass(frozen=True)
class ColorCalibrationConfig:
    # reference defaults: raw_image_pipeline.cpp:98-103; identity matrix
    # (color_calibration.cpp:10-13), zero bias.
    enabled: bool = False
    # Row-major 3x3 BGR mixing matrix and length-3 BGR bias.
    matrix: Tuple[float, ...] = (1.0, 0.0, 0.0, 0.0, 1.0, 0.0, 0.0, 0.0, 1.0)
    bias: Tuple[float, ...] = (0.0, 0.0, 0.0)
    calibration_available: bool = False

    def matrix_np(self) -> np.ndarray:
        return np.asarray(self.matrix, dtype=np.float64).reshape(3, 3)

    def bias_np(self) -> np.ndarray:
        return np.asarray(self.bias, dtype=np.float64).reshape(3)


@dataclass(frozen=True)
class GammaCorrectionConfig:
    # reference defaults: raw_image_pipeline.cpp:106-115
    enabled: bool = False
    method: str = "custom"  # "custom" | "default" — both are the same LUT on CPU (gamma_correction.cpp:54-60)
    k: float = 0.8
    # Emulate the reference GPU backend for method="default":
    # cv::cuda::gammaCorrection applies NPP's FIXED BT.709 transfer curve,
    # ignoring k except for the direction flag is_forward = (k <= 1.0)
    # (gamma_correction.cpp:29-33, 66-74 — quirk §8.15). Set by the API when
    # use_gpu is selected.
    gpu: bool = False


@dataclass(frozen=True)
class VignettingCorrectionConfig:
    # reference defaults: raw_image_pipeline.cpp:118-128
    enabled: bool = False
    scale: float = 1.5
    a2: float = 1e-3
    a4: float = 1e-6


@dataclass(frozen=True)
class ColorEnhancerConfig:
    # reference defaults: raw_image_pipeline.cpp:131-146
    enabled: bool = False
    hue_gain: float = 1.0
    saturation_gain: float = 1.0
    value_gain: float = 1.0


@dataclass(frozen=True)
class UndistortionConfig:
    # reference defaults: raw_image_pipeline.cpp:149-160
    enabled: bool = False
    balance: float = 0.0
    fov_scale: float = 1.0
    # setNewImageSize (undistortion.cpp:28-31): scales the rectified camera
    # matrix; the maps (and hence the output) stay at the calibration size,
    # exactly as cv::fisheye::initUndistortRectifyMap is called with
    # dist_image_size_ in the reference (undistortion.cpp:216-238).
    # None = calibration size.
    new_image_size: Optional[Tuple[int, int]] = None  # (width, height)
    # cv::remap's u8 arithmetic is build-dependent; both forms are
    # replicated bit-for-bit (ops/undistortion.remap_precompute):
    #   "lerp"    — x86/IPP fma-lerp path (this repo's cv2 oracle; default)
    #   "fixed32" — non-IPP INTER_BITS=5 integer path (ARM/Jetson builds,
    #               the reference's deployment hardware; ~free on TPU vs
    #               lerp's ~40 us/frame of emulated-fma work at 1080p)
    #   "float"   — quantization-free float formulation (within 1 LSB)
    interpolation: str = "lerp"


@dataclass(frozen=True)
class CameraCalibration:
    """Kalibr-style fisheye camera calibration.

    Mirrors UndistortionModule state (reference: undistortion.hpp:85-138,
    loadCalibration at undistortion.cpp:155-195). The reference always
    treats the distortion as the fisheye/equidistant model regardless of
    the `distortion_model` string (undistortion.cpp:199-220); only
    "none" disables undistortion (undistortion.hpp:76-78).
    """

    image_width: int = 320
    image_height: int = 240
    camera_name: str = ""
    # Row-major 3x3 intrinsics.
    camera_matrix: Tuple[float, ...] = (1.0, 0.0, 0.0, 0.0, 1.0, 0.0, 0.0, 0.0, 1.0)
    # 4 fisheye distortion coefficients.
    distortion_coefficients: Tuple[float, ...] = (0.0, 0.0, 0.0, 0.0)
    distortion_model: str = "none"
    rectification_matrix: Tuple[float, ...] = (1.0, 0.0, 0.0, 0.0, 1.0, 0.0, 0.0, 0.0, 1.0)
    # Row-major 3x4.
    projection_matrix: Tuple[float, ...] = (
        1.0, 0.0, 0.0, 0.0,
        0.0, 1.0, 0.0, 0.0,
        0.0, 0.0, 1.0, 0.0,
    )
    calibration_available: bool = False

    def K(self) -> np.ndarray:
        return np.asarray(self.camera_matrix, dtype=np.float64).reshape(3, 3)

    def D(self) -> np.ndarray:
        return np.asarray(self.distortion_coefficients, dtype=np.float64).reshape(4)

    def R(self) -> np.ndarray:
        return np.asarray(self.rectification_matrix, dtype=np.float64).reshape(3, 3)

    def P(self) -> np.ndarray:
        return np.asarray(self.projection_matrix, dtype=np.float64).reshape(3, 4)


@dataclass(frozen=True)
class PipelineConfig:
    """Full static configuration of the 8-stage chain (+ CCC).

    This is a *static* (trace-time) object: stage enables and methods select
    which ops get traced into the jitted ISP function, matching the fixed
    chain of raw_image_pipeline.hpp:143-172.
    """

    debayer: DebayerConfig = field(default_factory=DebayerConfig)
    flip: FlipConfig = field(default_factory=FlipConfig)
    white_balance: WhiteBalanceConfig = field(default_factory=WhiteBalanceConfig)
    color_calibration: ColorCalibrationConfig = field(default_factory=ColorCalibrationConfig)
    gamma_correction: GammaCorrectionConfig = field(default_factory=GammaCorrectionConfig)
    vignetting_correction: VignettingCorrectionConfig = field(default_factory=VignettingCorrectionConfig)
    color_enhancer: ColorEnhancerConfig = field(default_factory=ColorEnhancerConfig)
    undistortion: UndistortionConfig = field(default_factory=UndistortionConfig)
    calibration: CameraCalibration = field(default_factory=CameraCalibration)

    def replace(self, **kwargs) -> "PipelineConfig":
        return replace(self, **kwargs)


# ---------------------------------------------------------------------------
# YAML loaders
# ---------------------------------------------------------------------------

def load_pipeline_params(path: str, base: Optional[PipelineConfig] = None) -> PipelineConfig:
    """Load the reference pipeline-params YAML (raw_image_pipeline.cpp:44-165).

    Missing keys fall back to the reference's hardcoded defaults, not to
    `base`'s values, to match the reference loader (which rebuilds every
    module from scratch on loadParams). `base` only contributes the fields
    that are not covered by this YAML at all (calibrations, ccc model path,
    debayer algorithm).
    """
    base = base or PipelineConfig()
    if not os.path.exists(path):
        # reference: "Warning: parameters file doesn't exist" and keeps
        # whatever modules existed (raw_image_pipeline.cpp:163-164).
        return base

    with open(path) as f:
        node = yaml.safe_load(f) or {}

    deb = node.get("debayer")
    flip = node.get("flip")
    wb = node.get("white_balance")
    cc = node.get("color_calibration")
    gam = node.get("gamma_correction")
    vig = node.get("vignetting_correction")
    ce = node.get("color_enhancer")
    und = node.get("undistortion")

    return PipelineConfig(
        debayer=DebayerConfig(
            enabled=bool(_get(deb, "enabled", True)),
            encoding=str(_get(deb, "encoding", "auto")),
            algorithm=base.debayer.algorithm,
        ),
        flip=FlipConfig(
            enabled=bool(_get(flip, "enabled", False)),
            angle=int(_get(flip, "angle", 0)),
        ),
        white_balance=WhiteBalanceConfig(
            enabled=bool(_get(wb, "enabled", False)),
            method=str(_get(wb, "method", "ccc")),
            clipping_percentile=float(_get(wb, "clipping_percentile", 20.0)),
            saturation_bright_thr=float(_get(wb, "saturation_bright_thr", 0.8)),
            saturation_dark_thr=float(_get(wb, "saturation_dark_thr", 0.1)),
            ccc_uv0=float(_get(wb, "ccc_uv0", -1.421875)),
            temporal_consistency=bool(_get(wb, "temporal_consistency", True)),
            ccc_model_path=base.white_balance.ccc_model_path,
        ),
        color_calibration=ColorCalibrationConfig(
            enabled=bool(_get(cc, "enabled", False)),
            matrix=base.color_calibration.matrix,
            bias=base.color_calibration.bias,
            calibration_available=base.color_calibration.calibration_available,
        ),
        gamma_correction=GammaCorrectionConfig(
            enabled=bool(_get(gam, "enabled", False)),
            method=str(_get(gam, "method", "custom")),
            k=float(_get(gam, "k", 0.8)),
            gpu=base.gamma_correction.gpu,
        ),
        vignetting_correction=VignettingCorrectionConfig(
            enabled=bool(_get(vig, "enabled", False)),
            scale=float(_get(vig, "scale", 1.5)),
            a2=float(_get(vig, "a2", 1e-3)),
            a4=float(_get(vig, "a4", 1e-6)),
        ),
        color_enhancer=ColorEnhancerConfig(
            # quirk: reference reads `run_color_enhancer` (raw_image_pipeline.cpp:137)
            enabled=bool(_get(ce, "run_color_enhancer", _get(ce, "enabled", False))),
            hue_gain=float(_get(ce, "hue_gain", 1.0)),
            saturation_gain=float(_get(ce, "saturation_gain", 1.0)),
            value_gain=float(_get(ce, "value_gain", 1.0)),
        ),
        undistortion=UndistortionConfig(
            enabled=bool(_get(und, "enabled", False)),
            balance=float(_get(und, "balance", 0.0)),
            fov_scale=float(_get(und, "fov_scale", 1.0)),
            # TPU extensions have no reference YAML key: carry them from
            # `base` so a params (re)load never silently resets a
            # programmatic setting (the interpolation choice in particular
            # survives the control channel's reload_params)
            new_image_size=base.undistortion.new_image_size,
            interpolation=str(
                _get(und, "interpolation", base.undistortion.interpolation)
            ),
        ),
        calibration=base.calibration,
    )


def load_camera_calibration(path: str) -> CameraCalibration:
    """Load a camera_calibration_parsers-style YAML (undistortion.cpp:155-176)."""
    if not os.path.exists(path):
        # reference fallback values: undistortion.cpp:178-195
        return CameraCalibration(calibration_available=False)

    with open(path) as f:
        node = yaml.safe_load(f) or {}

    def mat_data(key, n, default):
        sub = node.get(key)
        data = _get(sub, "data", None)
        if data is None or len(data) != n:
            return tuple(default)
        return tuple(float(x) for x in data)

    return CameraCalibration(
        image_width=int(_get(node, "image_width", 320)),
        image_height=int(_get(node, "image_height", 240)),
        camera_name=str(_get(node, "camera_name", "")),
        camera_matrix=mat_data("camera_matrix", 9, (1.0, 0.0, 0.0, 0.0, 1.0, 0.0, 0.0, 0.0, 1.0)),
        distortion_coefficients=mat_data("distortion_coefficients", 4, (0.0, 0.0, 0.0, 0.0)),
        distortion_model=str(_get(node, "distortion_model", "none")),
        rectification_matrix=mat_data(
            "rectification_matrix", 9, (1.0, 0.0, 0.0, 0.0, 1.0, 0.0, 0.0, 0.0, 1.0)
        ),
        projection_matrix=mat_data(
            "projection_matrix",
            12,
            (1.0, 0.0, 0.0, 0.0, 0.0, 1.0, 0.0, 0.0, 0.0, 0.0, 1.0, 0.0),
        ),
        calibration_available=True,
    )


def load_color_calibration(path: str, base: Optional[ColorCalibrationConfig] = None) -> ColorCalibrationConfig:
    """Load the color-calibration matrix+bias YAML (color_calibration.cpp:52-76)."""
    base = base or ColorCalibrationConfig()
    if not os.path.exists(path):
        return replace(base, calibration_available=False)

    with open(path) as f:
        node = yaml.safe_load(f) or {}

    mat = _get(node.get("matrix"), "data", None)
    bias = _get(node.get("bias"), "data", None)
    matrix = tuple(float(x) for x in mat) if mat is not None and len(mat) == 9 else (
        1.0, 0.0, 0.0, 0.0, 1.0, 0.0, 0.0, 0.0, 1.0
    )
    bias_t = tuple(float(x) for x in bias) if bias is not None and len(bias) == 3 else (0.0, 0.0, 0.0)
    return replace(base, matrix=matrix, bias=bias_t, calibration_available=True)


def save_color_calibration(path: str, config: ColorCalibrationConfig) -> None:
    """Write the color-calibration YAML in the reference schema
    (scripts/color_calibration.py:294-304)."""
    out = {
        "matrix": {"rows": 3, "cols": 3, "data": [float(x) for x in config.matrix]},
        "bias": {"rows": 3, "cols": 1, "data": [float(x) for x in config.bias]},
    }
    with open(path, "w") as f:
        yaml.safe_dump(out, f, default_flow_style=None, sort_keys=False)
