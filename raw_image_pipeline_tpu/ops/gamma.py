"""Gamma correction via 256-entry LUT (reference: modules/gamma_correction.cpp:35-60).

The reference builds lut[i] = saturate_cast<uchar>(pow(i/255, k) * 255) and
applies it with cv::LUT; both the "custom" and the CPU "default" method are
this same LUT (gamma_correction.cpp:58-60). The LUT is built on host at
config time; the application is a vectorized gather that XLA fuses into the
surrounding elementwise chain.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def build_gamma_lut(k: float) -> np.ndarray:
    """256-entry uint8 LUT, replicating the reference's float arithmetic:
    f = (float)(i/255.0); f = pow(f, k); lut[i] = cvRound(f * 255.0)."""
    i = np.arange(256, dtype=np.float64) / 255.0
    f = np.power(i, k).astype(np.float32)  # double pow assigned to float
    vals = np.rint(f.astype(np.float64) * 255.0)
    return np.clip(vals, 0, 255).astype(np.uint8)


@jax.jit
def apply_lut(image: jax.Array, lut: jax.Array) -> jax.Array:
    """dst = lut[src] for uint8 images of any shape."""
    return jnp.take(lut, image.astype(jnp.int32))


def gamma_correct(image: jax.Array, k: float) -> jax.Array:
    return apply_lut(image, jnp.asarray(build_gamma_lut(k)))
