"""Live-ingest sources: the reference node's queue-size-1 drop semantics
("We always process the most updated frame",
raw_image_pipeline_ros.cpp:185-197) without a ROS transport."""

import os
import threading
import time

import numpy as np

from raw_image_pipeline_tpu.runtime.sources import (
    DirectoryWatchSource,
    LatestFrameSource,
)


def test_latest_frame_source_drops_to_newest():
    src = LatestFrameSource()
    out = []

    def consume():
        for f in src:
            out.append(int(f[0, 0]))
            time.sleep(0.03)  # slow consumer

    t = threading.Thread(target=consume)
    t.start()
    for i in range(20):
        src.put(np.full((2, 2), i, np.uint8))
        time.sleep(0.005)  # fast producer
    time.sleep(0.1)
    src.close()
    t.join(timeout=5)
    assert out[-1] == 19  # newest always processed
    assert len(out) < 20  # intermediate frames dropped
    assert src.dropped == 20 - len(out)
    assert out == sorted(out)  # monotone


def test_directory_watch_source_latest_only(tmp_path):
    d = str(tmp_path)
    stop_flag = {"stop": False}
    src = DirectoryWatchSource(
        d, loader=lambda p: np.fromfile(p, np.uint8),
        latest_only=True, poll_s=0.002, stop=lambda: stop_flag["stop"],
    )
    for i in range(5):
        np.full(4, i, np.uint8).tofile(os.path.join(d, f"f_{i:03d}.raw"))
    it = iter(src)
    first = next(it)
    assert first[0] == 4  # skipped straight to the newest
    assert src.dropped == 4
    np.full(4, 9, np.uint8).tofile(os.path.join(d, "f_009.raw"))
    second = next(it)
    assert second[0] == 9
    stop_flag["stop"] = True
    assert list(it) == []


def test_directory_watch_source_ordered(tmp_path):
    d = str(tmp_path)
    for i in range(4):
        np.full(2, i, np.uint8).tofile(os.path.join(d, f"g_{i:03d}.raw"))
    done = {"stop": True}
    src = DirectoryWatchSource(
        d, loader=lambda p: np.fromfile(p, np.uint8),
        latest_only=False, stop=lambda: done["stop"],
    )
    vals = [int(f[0]) for f in src]
    assert vals == [0, 1, 2, 3]


def test_directory_watch_source_non_monotone_names(tmp_path):
    """frame_9 then frame_10: lexicographically decreasing names must not
    be dropped (per-file seen tracking, not a high-water mark)."""
    d = str(tmp_path)
    stop = {"s": False}
    src = DirectoryWatchSource(
        d, loader=lambda p: np.fromfile(p, np.uint8),
        latest_only=False, poll_s=0.002, stop=lambda: stop["s"],
    )
    np.full(2, 9, np.uint8).tofile(os.path.join(d, "frame_9.raw"))
    it = iter(src)
    assert int(next(it)[0]) == 9
    np.full(2, 10, np.uint8).tofile(os.path.join(d, "frame_10.raw"))
    assert int(next(it)[0]) == 10
    stop["s"] = True
    assert list(it) == []
