"""Functional ISP pipeline (placeholder — filled in as ops land).

The full chain mirrors raw_image_pipeline.hpp:143-172:
debayer -> flip -> white_balance -> color_calibration -> gamma ->
vignetting -> color_enhancer -> undistortion.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Optional


@dataclass
class IspState:
    """Cross-frame state (CCC Kalman illuminant track) as an explicit pytree."""

    kalman_initialized: Any = None
    kalman_x: Any = None
    kalman_P: Any = None


def build_pipeline(config, batch_shape=None):
    raise NotImplementedError("pipeline assembly lands after the ops")
