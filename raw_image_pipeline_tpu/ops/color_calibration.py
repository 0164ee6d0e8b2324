"""3x3 affine color calibration (reference: modules/color_calibration.cpp:91-104).

The reference flattens the frame to (H*W)x3 float, right-multiplies by the
transposed 3x3 BGR mixing matrix, adds a per-channel bias, and saturates to
uint8. On TPU this is a tiny einsum over the channel axis that XLA fuses
with the neighboring stages (the (HW)x3 @ 3x3 matmul is too skinny for the
MXU to matter; it lowers to 9 fused multiply-adds per pixel on the VPU).

Rounding: cv::Mat::convertTo(CV_8UC3) == cvRound (half-to-even) + saturate.
The reference computes in float32 (color_calibration.cpp:93-94); we do the
same.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from raw_image_pipeline_tpu.ops.common import round_u8


@jax.jit
def color_correct(image: jax.Array, matrix: jax.Array, bias: jax.Array) -> jax.Array:
    """Args:
        image:  [..., 3] uint8 BGR.
        matrix: [3, 3] float32 — rows produce output B,G,R from input (B,G,R).
        bias:   [3] float32 BGR bias.
    """
    x = image.astype(jnp.float32)
    mixed = jnp.einsum("...c,oc->...o", x, matrix.astype(jnp.float32))
    return round_u8(mixed + bias.astype(jnp.float32))
