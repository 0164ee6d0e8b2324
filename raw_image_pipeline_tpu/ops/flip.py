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

import jax
import jax.numpy as jnp


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
