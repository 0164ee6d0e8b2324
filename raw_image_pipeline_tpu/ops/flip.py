"""Flip / rotation (reference: modules/flip.cpp:37-58).

angle 90  -> clockwise rotation        (cv::transpose + flip(1))
angle 180 -> both-axis flip            (cv::flip(-1))
angle 270 -> counter-clockwise         (cv::transpose + flip(0))
any other angle is a no-op.

Pure layout transforms over the spatial axes of [..., H, W, C] (or
[..., H, W]); XLA lowers these to copies that fuse with neighbors.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

# How each Bayer mosaic pattern transforms under the three rotations, i.e.
# debayer_P(x) then rotate == rotate(x) then debayer_PERM[angle][P] — an
# exact identity for spatially symmetric demosaic stencils on even-sized
# frames (verified bit-exact for both the bilinear and MHT algorithms over
# all pattern x angle combinations in tests/test_debayer.py). The pipeline
# uses it to flip the 1-channel raw mosaic instead of the 3-channel color
# image (3x less data to move).
_BAYER_FLIP_PERM = {
    90: {"bggr": "gbrg", "gbrg": "rggb", "grbg": "bggr", "rggb": "grbg"},
    180: {"bggr": "rggb", "gbrg": "grbg", "grbg": "gbrg", "rggb": "bggr"},
    270: {"bggr": "grbg", "gbrg": "bggr", "grbg": "rggb", "rggb": "gbrg"},
}


def flipped_bayer_encoding(encoding: str, angle: int) -> Optional[str]:
    """The Bayer encoding that demosaics a rotated mosaic to the rotation of
    the original demosaic (None when no exact equivalent applies)."""
    if angle not in _BAYER_FLIP_PERM:
        return None
    if not (encoding.startswith("bayer_") and encoding.endswith("8")):
        return None  # 8-bit patterns only (the verified set)
    pat = encoding[len("bayer_"):-1]
    if pat not in _BAYER_FLIP_PERM[angle]:
        return None
    return f"bayer_{_BAYER_FLIP_PERM[angle][pat]}8"


@partial(jax.jit, static_argnames=("angle", "spatial_axes"))
def flip(image: jax.Array, angle: int, spatial_axes=(-3, -2)) -> jax.Array:
    """Rotate by `angle` degrees clockwise in image coordinates.

    `spatial_axes` are the (row, col) axes; defaults fit [..., H, W, C].
    For single-channel [..., H, W] pass spatial_axes=(-2, -1).
    """
    h_ax, w_ax = spatial_axes
    if angle == 90:
        # clockwise: np.rot90(k=-1) over (H, W)
        return jnp.flip(jnp.swapaxes(image, h_ax, w_ax), axis=w_ax)
    if angle == 180:
        return jnp.flip(jnp.flip(image, axis=h_ax), axis=w_ax)
    if angle == 270:
        return jnp.flip(jnp.swapaxes(image, h_ax, w_ax), axis=h_ax)
    return image
