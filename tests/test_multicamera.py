"""Multi-camera vmapped pipeline: per-camera params, camera-axis sharding,
per-camera Kalman state."""

import dataclasses

import jax
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from raw_image_pipeline_tpu.config import CameraCalibration, PipelineConfig
from raw_image_pipeline_tpu.parallel.mesh import make_mesh
from raw_image_pipeline_tpu.parallel.multicamera import (
    build_multicamera_pipeline,
    multicamera_state,
)
from raw_image_pipeline_tpu.pipeline import build_pipeline

K0 = (220.0, 0.0, 160.0, 0.0, 220.0, 120.0, 0.0, 0.0, 1.0)


def _calib(fx_scale):
    k = list(K0)
    k[0] *= fx_scale
    k[4] *= fx_scale
    return CameraCalibration(
        image_width=320, image_height=240, camera_matrix=tuple(k),
        distortion_coefficients=(-0.04, -0.004, 0.004, -0.002),
        distortion_model="equidistant", calibration_available=True,
    )


def _config():
    cfg = PipelineConfig()
    return PipelineConfig(
        white_balance=dataclasses.replace(cfg.white_balance, enabled=True,
                                          method="grey_world"),
        gamma_correction=dataclasses.replace(cfg.gamma_correction, enabled=True),
        undistortion=dataclasses.replace(cfg.undistortion, enabled=True),
        calibration=_calib(1.0),
    )


@pytest.fixture(scope="module")
def frames():
    rng = np.random.default_rng(0)
    return rng.integers(0, 256, (4, 2, 240, 320), np.uint8)  # [C, B, H, W]


def test_multicamera_matches_per_camera(frames):
    calibs = [_calib(s) for s in (1.0, 1.05, 0.95, 1.1)]
    config = _config()
    multi = build_multicamera_pipeline(config, calibs, "bayer_gbrg8", (240, 320))
    out, _ = multi(frames)

    for ci, calib in enumerate(calibs):
        solo = build_pipeline(
            config.replace(calibration=calib), "bayer_gbrg8", frame_hw=(240, 320)
        )
        ref, _ = solo(frames[ci])
        np.testing.assert_array_equal(
            np.asarray(out["processed"])[ci], np.asarray(ref["processed"])
        )


def test_multicamera_sharded_over_mesh(frames):
    # cameras fold into the batch in the camera-blocked design, so the
    # camera axis shards over "data" like any batch axis; params (incl.
    # the stacked per-camera remap maps) stay replicated
    calibs = [_calib(s) for s in (1.0, 1.05, 0.95, 1.1)]
    config = _config()
    multi = build_multicamera_pipeline(config, calibs, "bayer_gbrg8", (240, 320))
    ref, _ = multi(frames)

    mesh = make_mesh(jax.devices()[:4])  # camera axis over 4 devices
    fr = jax.device_put(jax.numpy.asarray(frames), NamedSharding(mesh, P("data")))
    out, _ = multi.fn(multi.params, fr, None)
    np.testing.assert_array_equal(
        np.asarray(out["processed"]), np.asarray(ref["processed"])
    )


def test_multicamera_kalman_state():
    calibs = [_calib(1.0), _calib(1.1)]
    cfg = _config()
    cfg = cfg.replace(
        white_balance=dataclasses.replace(
            cfg.white_balance, method="ccc", temporal_consistency=True
        )
    )
    multi = build_multicamera_pipeline(cfg, calibs, "bayer_gbrg8", (240, 320),
                                       with_state=True)
    state = multicamera_state(2, 1)
    rng = np.random.default_rng(1)
    frames = rng.integers(0, 256, (2, 1, 240, 320), np.uint8)
    out1, state = multi(frames, state)
    out2, state = multi(frames, state)
    assert np.asarray(state.initialized).all()
    assert np.asarray(out1["processed"]).shape == (2, 1, 240, 320, 3)

def test_multicamera_kalman_matches_per_camera():
    # "cameras" mode: each (camera, slot) an independent track — must equal
    # running each camera through its own single-camera pipeline
    calibs = [_calib(1.0), _calib(1.1)]
    cfg = _config()
    cfg = cfg.replace(
        white_balance=dataclasses.replace(
            cfg.white_balance, method="ccc", temporal_consistency=True
        )
    )
    multi = build_multicamera_pipeline(cfg, calibs, "bayer_gbrg8", (240, 320),
                                       with_state=True)
    state = multicamera_state(2, 3)
    rng = np.random.default_rng(2)
    frames = rng.integers(0, 256, (2, 3, 240, 320), np.uint8)
    out1, state = multi(frames, state)
    out2, state = multi(frames, state)

    from raw_image_pipeline_tpu.pipeline import init_state

    for ci, calib in enumerate(calibs):
        solo = build_pipeline(
            cfg.replace(calibration=calib), "bayer_gbrg8",
            frame_hw=(240, 320), with_state=True,
        )
        st = init_state((3,))
        r1, st = solo(frames[ci], st)
        r2, st = solo(frames[ci], st)
        np.testing.assert_array_equal(
            np.asarray(out2["processed"])[ci], np.asarray(r2["processed"])
        )
        np.testing.assert_array_equal(
            np.asarray(state.x)[ci], np.asarray(st.x)
        )


def test_multicamera_sequence_mode_matches_per_camera():
    # "sequence" mode: one track per camera, batch axis = time within each
    # camera block (the camera-blocked vmapped-scan path)
    calibs = [_calib(1.0), _calib(1.1)]
    cfg = _config()
    cfg = cfg.replace(
        white_balance=dataclasses.replace(
            cfg.white_balance, method="ccc", temporal_consistency=True
        )
    )
    multi = build_multicamera_pipeline(
        cfg, calibs, "bayer_gbrg8", (240, 320), with_state=True,
        temporal_mode="sequence",
    )
    state = multicamera_state(2, temporal_mode="sequence")
    rng = np.random.default_rng(3)
    frames = rng.integers(0, 256, (2, 4, 240, 320), np.uint8)
    out, state = multi(frames, state)

    from raw_image_pipeline_tpu.pipeline import build_pipeline as bp
    from raw_image_pipeline_tpu.pipeline import init_state

    for ci, calib in enumerate(calibs):
        solo = bp(
            cfg.replace(calibration=calib), "bayer_gbrg8",
            frame_hw=(240, 320), with_state=True, temporal_mode="sequence",
        )
        st = init_state(())
        ref, st = solo(frames[ci], st)
        np.testing.assert_array_equal(
            np.asarray(out["processed"])[ci], np.asarray(ref["processed"])
        )
        np.testing.assert_array_equal(np.asarray(state.x)[ci], np.asarray(st.x))
