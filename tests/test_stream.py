"""StreamRunner: stream outputs, slow decimation, reset service, camera_info."""

import dataclasses

import numpy as np
import pytest

from raw_image_pipeline_tpu.config import PipelineConfig
from raw_image_pipeline_tpu.runtime.stream import StreamRunner, make_camera_infos


def _config(undistort=False):
    cfg = PipelineConfig()
    return PipelineConfig(
        white_balance=dataclasses.replace(
            cfg.white_balance, enabled=True, method="ccc", temporal_consistency=True
        ),
    )


@pytest.fixture()
def frames():
    rng = np.random.default_rng(0)
    return [rng.integers(0, 256, (32, 48), np.uint8) for _ in range(7)]


def test_stream_outputs_and_slow(frames):
    runner = StreamRunner(_config(), "bayer_gbrg8", (32, 48), batch_size=3,
                          slow_skip=2)
    got = {}
    n = runner.run(iter(frames), lambda s, i, img: got.setdefault(s, []).append(i))
    assert n == 7
    assert got["color"] == list(range(7))
    assert got["debayered"] == list(range(7))
    # slow stream decimated by skip=2 (every 3rd frame)
    assert len(got["color/slow"]) == 2


def test_stream_reset_white_balance(frames):
    runner = StreamRunner(_config(), "bayer_gbrg8", (32, 48), batch_size=2)
    outs1 = []
    runner.run(iter(frames[:2]), lambda s, i, img: outs1.append(img) if s == "color" else None)
    state_after = runner.state
    runner.reset_white_balance()
    assert not np.asarray(runner.state.initialized).any()
    assert np.asarray(state_after.initialized).all()


def test_rgb_output_encoding(frames):
    runner = StreamRunner(_config(), "bayer_gbrg8", (32, 48), batch_size=4,
                          output_encoding="RGB")
    bgr_runner = StreamRunner(_config(), "bayer_gbrg8", (32, 48), batch_size=4)
    a, b = [], []
    runner.run(iter(frames[:2]), lambda s, i, img: a.append(img) if s == "color" else None)
    bgr_runner.run(iter(frames[:2]), lambda s, i, img: b.append(img) if s == "color" else None)
    np.testing.assert_array_equal(a[0], b[0][..., ::-1])


def test_camera_infos():
    from raw_image_pipeline_tpu import RawImagePipeline
    from raw_image_pipeline_tpu.config import (
        DEFAULT_CALIBRATION_PATH,
        DEFAULT_PARAMS_PATH,
    )

    api = RawImagePipeline(False, DEFAULT_PARAMS_PATH, DEFAULT_CALIBRATION_PATH, "")
    infos = make_camera_infos(api)
    assert infos["dist"].distortion_model == "equidistant"
    # rectified stream reports no distortion; model string fixed to
    # plumb_bob like the reference (raw_image_pipeline_ros.cpp:318-320)
    assert infos["rect"].distortion_model == "plumb_bob"
    assert infos["rect"].D == [0.0, 0.0, 0.0, 0.0]
    assert infos["dist"].width == 720


def test_state_checkpoint_resume(tmp_path):
    """The Kalman illuminant track checkpoints to disk and resumes with
    bit-identical downstream behavior (SURVEY §5 checkpoint/resume)."""
    import numpy as np
    from raw_image_pipeline_tpu.ops import ccc
    from raw_image_pipeline_tpu.pipeline import init_state, load_state, save_state

    st = init_state(())
    st, _ = ccc.kalman_update(st, np.array([100, 120], np.int32))
    st, _ = ccc.kalman_update(st, np.array([110, 125], np.int32))
    path = str(tmp_path / "wb_state.npz")
    save_state(st, path)
    st2 = load_state(path)
    a = ccc.kalman_update(st, np.array([90, 140], np.int32))
    b = ccc.kalman_update(st2, np.array([90, 140], np.int32))
    np.testing.assert_array_equal(np.asarray(a[1]), np.asarray(b[1]))
    np.testing.assert_array_equal(np.asarray(a[0].x), np.asarray(b[0].x))
    np.testing.assert_array_equal(np.asarray(a[0].p), np.asarray(b[0].p))


def test_partial_tail_batch_padded(frames):
    """A stateless run whose frame count is not a batch multiple pads the
    tail dispatch to the traced batch size (no retrace) and emits exactly
    the real frames, identical to per-frame processing."""
    import dataclasses

    from raw_image_pipeline_tpu.config import PipelineConfig
    from raw_image_pipeline_tpu.pipeline import build_pipeline
    from raw_image_pipeline_tpu.runtime.stream import StreamRunner

    cfg = PipelineConfig()
    cfg = cfg.replace(
        white_balance=dataclasses.replace(
            cfg.white_balance, enabled=True, method="ccc",
            temporal_consistency=False,
        )
    )
    seq = [frames[i % len(frames)] for i in range(5)]  # 5 frames, batch 4
    h, w = seq[0].shape[:2]
    runner = StreamRunner(cfg, "bayer_gbrg8", (h, w), batch_size=4)
    got = {}
    n = runner.run(iter(seq), lambda stream, idx, img: got.setdefault((stream, idx), img))
    assert n == 5
    assert ("color", 4) in got and ("color", 5) not in got

    ref_pipe = build_pipeline(cfg, "bayer_gbrg8", frame_hw=(h, w),
                              keep_intermediates=True)
    out, _ = ref_pipe(np.stack(seq))
    for i in range(5):
        np.testing.assert_array_equal(
            got[("color", i)],
            np.asarray(out.get("dist_color", out["processed"])[i]),
        )


def test_stream_runner_microbatch(frames):
    """batch_size beyond single-dispatch memory works via microbatch, with
    identical outputs to the plain runner."""
    import dataclasses

    from raw_image_pipeline_tpu.config import PipelineConfig
    from raw_image_pipeline_tpu.runtime.stream import StreamRunner

    cfg = PipelineConfig()
    cfg = cfg.replace(
        white_balance=dataclasses.replace(
            cfg.white_balance, enabled=True, method="ccc",
            temporal_consistency=False,
        )
    )
    seq = [frames[i % len(frames)] for i in range(4)]
    h, w = seq[0].shape[:2]
    got_a, got_b = {}, {}
    StreamRunner(cfg, "bayer_gbrg8", (h, w), batch_size=4).run(
        iter(seq), lambda s, i, img: got_a.setdefault((s, i), img))
    StreamRunner(cfg, "bayer_gbrg8", (h, w), batch_size=4, microbatch=2).run(
        iter(seq), lambda s, i, img: got_b.setdefault((s, i), img))
    assert got_a.keys() == got_b.keys()
    for k in got_a:
        np.testing.assert_array_equal(got_a[k], got_b[k])


def test_stream_runner_stateful_microbatch_tail(frames):
    """Round-2 advisor finding (medium): a stateful runner with microbatch
    must survive a partial tail batch whose size is not a multiple of the
    microbatch (7 frames, batch_size=4, microbatch=2 -> tail of 3), with
    outputs and the carried Kalman track bitwise equal to the plain
    stateful runner."""
    h, w = frames[0].shape[:2]
    got_a, got_b = {}, {}
    plain = StreamRunner(_config(), "bayer_gbrg8", (h, w), batch_size=4)
    micro = StreamRunner(_config(), "bayer_gbrg8", (h, w), batch_size=4,
                         microbatch=2)
    na = plain.run(iter(frames), lambda s, i, img: got_a.setdefault((s, i), img))
    nb = micro.run(iter(frames), lambda s, i, img: got_b.setdefault((s, i), img))
    assert na == nb == 7
    assert got_a.keys() == got_b.keys()
    for k in got_a:
        np.testing.assert_array_equal(got_a[k], got_b[k])
    np.testing.assert_array_equal(np.asarray(plain.state.x),
                                  np.asarray(micro.state.x))
