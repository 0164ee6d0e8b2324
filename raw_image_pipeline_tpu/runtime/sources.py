"""Frame sources for the streaming runtime.

The reference node subscribes with queue size 1 — "We always process the
most updated frame" (raw_image_pipeline_ros.cpp:185-197): when processing
is slower than capture, intermediate frames are DROPPED and only the
newest is handled. These sources reproduce that live-ingest contract
without a ROS transport:

  * LatestFrameSource — wraps any producer thread; `put()` overwrites the
    single slot (the queue-size-1 drop), iteration yields the newest frame
    and blocks when none is pending;
  * DirectoryWatchSource — polls a directory for new frame files (the
    moral equivalent of a live topic for file-based pipelines), reading
    each new file at most once and skipping ahead to the newest when
    multiple arrived since the last poll.
"""

from __future__ import annotations

import os
import threading
import time
from typing import Callable, Iterator, Optional

import numpy as np


class LatestFrameSource:
    """Single-slot mailbox with overwrite: the reference's queue-size-1
    subscription semantics. Producers call put(frame); the consumer
    iterates. close() ends the iteration once the slot is drained."""

    def __init__(self):
        self._cond = threading.Condition()
        self._slot: Optional[np.ndarray] = None
        self._dropped = 0
        self._closed = False

    @property
    def dropped(self) -> int:
        """Frames overwritten before the consumer took them."""
        return self._dropped

    def put(self, frame: np.ndarray) -> None:
        with self._cond:
            if self._slot is not None:
                self._dropped += 1  # overwritten, like ROS queue_size=1
            self._slot = np.asarray(frame)
            self._cond.notify()

    def close(self) -> None:
        with self._cond:
            self._closed = True
            self._cond.notify_all()

    def __iter__(self) -> Iterator[np.ndarray]:
        while True:
            with self._cond:
                while self._slot is None and not self._closed:
                    self._cond.wait()
                if self._slot is None and self._closed:
                    return
                frame, self._slot = self._slot, None
            yield frame


class DirectoryWatchSource:
    """Live file ingest: yields frames for files appearing in a directory.

    With latest_only=True (default) it skips to the newest (lexicographically
    largest) unseen file at each poll, dropping the others — the
    queue-size-1 behavior; with latest_only=False every new file is yielded
    in name order. Iteration ends when `stop` (a callable) returns True and
    no new file is pending.

    Producers should write frames ATOMICALLY (write to a temp name, then
    rename into the watched directory) — a file is loaded as soon as it is
    listed; `min_age_s` > 0 additionally ignores files modified within the
    last `min_age_s` seconds as a settle window for non-atomic writers.
    Frame names need not be monotone: every file is tracked individually
    (a `seen` set), so `frame_9` followed by `frame_10` works even though
    the names sort the other way.
    """

    def __init__(
        self,
        directory: str,
        loader: Callable[[str], np.ndarray],
        pattern: str = "",
        latest_only: bool = True,
        poll_s: float = 0.01,
        min_age_s: float = 0.0,
        stop: Optional[Callable[[], bool]] = None,
    ):
        self.directory = directory
        self.loader = loader
        self.pattern = pattern
        self.latest_only = latest_only
        self.poll_s = poll_s
        self.min_age_s = min_age_s
        self._stop = stop or (lambda: False)
        self.dropped = 0

    def _listing(self):
        names = sorted(
            f for f in os.listdir(self.directory)
            if self.pattern in f
        )
        if self.min_age_s > 0:
            cutoff = time.time() - self.min_age_s
            settled = []
            for f in names:
                try:
                    if os.path.getmtime(os.path.join(self.directory, f)) <= cutoff:
                        settled.append(f)
                except OSError:
                    pass  # vanished between listdir and stat
            names = settled
        return names

    def __iter__(self) -> Iterator[np.ndarray]:
        seen = set()
        while True:
            fresh = [f for f in self._listing() if f not in seen]
            if not fresh:
                if self._stop():
                    return
                time.sleep(self.poll_s)
                continue
            seen.update(fresh)
            if self.latest_only:
                self.dropped += len(fresh) - 1
                fresh = fresh[-1:]
            for f in fresh:
                yield self.loader(os.path.join(self.directory, f))
