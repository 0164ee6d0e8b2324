"""Structured logging.

The reference logs with std::cout / ROS_INFO / glog (SURVEY.md §5); here a
standard library logger namespaced under "raw_image_pipeline_tpu" with a
one-line structured format. Library code logs through get_logger(__name__);
applications configure handlers as usual.
"""

from __future__ import annotations

import logging
import os
import sys

_FORMAT = "%(asctime)s %(levelname).1s %(name)s: %(message)s"
_configured = False


def get_logger(name: str = "raw_image_pipeline_tpu") -> logging.Logger:
    global _configured
    root = logging.getLogger("raw_image_pipeline_tpu")
    if not _configured:
        level = os.environ.get("RIP_TPU_LOG", "INFO").upper()
        handler = logging.StreamHandler(sys.stderr)
        handler.setFormatter(logging.Formatter(_FORMAT, datefmt="%H:%M:%S"))
        root.addHandler(handler)
        root.setLevel(level)
        root.propagate = False
        _configured = True
    if name.startswith("raw_image_pipeline_tpu"):
        return logging.getLogger(name)
    return root.getChild(name)
