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
