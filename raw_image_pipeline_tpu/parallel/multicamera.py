"""Multi-camera execution (BASELINE config 5: 4 cameras, N>=2 hosts).

The reference runs one ROS node per camera; here all cameras execute in one
jitted program with a leading camera axis: per-camera numeric parameters
(calibrations, undistortion maps, color matrices) are tree-stacked and the
single-camera ISP is vmapped over (params, frames, state). The camera axis
then shards over the mesh's "data" axis like any other batch dimension —
cameras x frames spread across all chips/hosts with no cross-camera
collectives, and each camera carries its own Kalman illuminant track.

Constraint: cameras share the static configuration (stage enables, WB
method, frame size) — that is what keeps one trace; per-camera *values*
(intrinsics, distortion, color matrices) differ freely.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax

from raw_image_pipeline_tpu.config import CameraCalibration, PipelineConfig
from raw_image_pipeline_tpu.ops import ccc as ccc_ops
from raw_image_pipeline_tpu.pipeline import (
    BuiltPipeline,
    IspState,
    make_isp_fn,
    make_params,
)
from raw_image_pipeline_tpu.models.ccc_model import load_ccc_model


def multicamera_state(n_cameras: int, batch: int = 1) -> IspState:
    """Per-camera Kalman state, shape [n_cameras, batch, ...]."""
    return ccc_ops.kalman_init((n_cameras, batch))


def build_multicamera_pipeline(
    base_config: PipelineConfig,
    calibrations: Sequence[CameraCalibration],
    encoding: str = "bayer_gbrg8",
    frame_hw: Optional[Tuple[int, int]] = None,
    with_state: bool = False,
) -> BuiltPipeline:
    """One jitted program over [n_cameras, batch, H, W] frames.

    Returns a BuiltPipeline whose params carry a leading camera axis; call
    as outputs, state = pipe(frames, state) with frames [C, B, H, W].
    """
    n = len(calibrations)
    if n == 0:
        raise ValueError("need at least one camera calibration")
    if frame_hw is None:
        frame_hw = (calibrations[0].image_height, calibrations[0].image_width)
    for c in calibrations:
        # calibrations may differ in values but must share the frame size
        if (c.image_height, c.image_width) != frame_hw:
            raise ValueError("all cameras must share one frame size")

    ccc_model = None
    wb = base_config.white_balance
    if wb.enabled and wb.method == "ccc":
        ccc_model = load_ccc_model(wb.ccc_model_path)

    per_cam = [
        make_params(base_config.replace(calibration=c), frame_hw, ccc_model)
        for c in calibrations
    ]
    stacked = jax.tree.map(lambda *xs: jax.numpy.stack(xs), *per_cam)

    # trace with a per-camera calibration in place: make_isp_fn decides
    # whether the remap stage exists from config.calibration (all cameras
    # share availability/model by the size check above)
    from raw_image_pipeline_tpu.pipeline import _post_flip_shape

    src_hw = _post_flip_shape(
        *frame_hw, base_config.flip.angle if base_config.flip.enabled else 0
    )
    single_fn = make_isp_fn(
        base_config.replace(calibration=calibrations[0]),
        encoding, with_state, keep_intermediates=False,
        remap_src_hw=src_hw,
    )
    if with_state:
        vfn = jax.vmap(single_fn, in_axes=(0, 0, 0))
    else:
        vfn = jax.vmap(lambda p, px: single_fn(p, px, None)[0], in_axes=(0, 0))
        vfn = (lambda inner: lambda p, px, state: (inner(p, px), state))(vfn)
    jitted = jax.jit(vfn)

    return BuiltPipeline(
        config=base_config, params=stacked, ccc_model=ccc_model, fn=jitted
    )
