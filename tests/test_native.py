"""Native C++ frame pump: build, ordering, batching, backpressure."""

import os

import numpy as np
import pytest

from raw_image_pipeline_tpu.runtime.native import FramePump, native_available

pytestmark = pytest.mark.skipif(
    not native_available(), reason="native toolchain unavailable"
)


@pytest.fixture()
def raw_frames(tmp_path):
    rng = np.random.default_rng(0)
    paths, frames = [], []
    for i in range(11):
        f = rng.integers(0, 256, (16, 24), np.uint8)
        p = tmp_path / f"frame_{i:03d}.raw"
        p.write_bytes(f.tobytes())
        paths.append(str(p))
        frames.append(f)
    return paths, frames


def test_batches_in_order(raw_frames):
    paths, frames = raw_frames
    pump = FramePump(paths, (16, 24), batch=4, slots=2, readers=3)
    got = list(pump)
    pump.close()
    assert [b.shape[0] for b in got] == [4, 4, 3]  # last batch is partial
    flat = np.concatenate(got)
    for i, f in enumerate(frames):
        np.testing.assert_array_equal(flat[i], f)


def test_header_skip(tmp_path):
    f = np.arange(12, dtype=np.uint8).reshape(3, 4)
    p = tmp_path / "x.pgm"
    p.write_bytes(b"P5\n4 3\n255\n" + f.tobytes())
    skip = len(b"P5\n4 3\n255\n")
    pump = FramePump([str(p)], (3, 4), batch=1, header_skip=skip, slots=2, readers=1)
    (batch,) = list(pump)
    pump.close()
    np.testing.assert_array_equal(batch[0], f)


def test_short_file_zero_filled(tmp_path):
    p = tmp_path / "short.raw"
    p.write_bytes(b"\x07" * 5)
    pump = FramePump([str(p)], (4, 4), batch=1, slots=2, readers=1)
    (batch,) = list(pump)
    pump.close()
    assert batch[0].ravel()[:5].tolist() == [7] * 5
    assert batch[0].ravel()[5:].sum() == 0


def test_native_frame_sink_roundtrip(tmp_path):
    import cv2

    from raw_image_pipeline_tpu.runtime.native import (
        FrameSink,
        native_sink_available,
    )

    if not native_sink_available():
        import pytest

        pytest.skip("native sink build unavailable")
    rng = np.random.default_rng(0)
    imgs = [rng.integers(0, 256, (32, 48, 3), np.uint8) for _ in range(10)]
    mono = rng.integers(0, 256, (16, 24), np.uint8)
    with FrameSink(threads=4, queue_cap=4) as sink:
        for i, im in enumerate(imgs):
            sink.write(str(tmp_path / f"f{i:03d}.png"), im)
        sink.write(str(tmp_path / "mono.png"), mono)
        sink.write(str(tmp_path / "blob.raw"), imgs[0])
        assert sink.flush() == 0
    for i, im in enumerate(imgs):
        back = cv2.imread(str(tmp_path / f"f{i:03d}.png"))
        np.testing.assert_array_equal(back, im)
    back = cv2.imread(str(tmp_path / "mono.png"), cv2.IMREAD_UNCHANGED)
    np.testing.assert_array_equal(back, mono)
    raw = np.fromfile(tmp_path / "blob.raw", np.uint8).reshape(32, 48, 3)
    np.testing.assert_array_equal(raw, imgs[0])


def test_native_frame_sink_failure_counted(tmp_path):
    from raw_image_pipeline_tpu.runtime.native import (
        FrameSink,
        native_sink_available,
    )

    if not native_sink_available():
        import pytest

        pytest.skip("native sink build unavailable")
    with FrameSink(threads=2) as sink:
        sink.write("/nonexistent-dir/x.png",
                   np.zeros((8, 8, 3), np.uint8))
        assert sink.flush() == 1
