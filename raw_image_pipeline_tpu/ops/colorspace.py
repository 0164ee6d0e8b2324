"""Color-space conversions replicating OpenCV's u8 fixed-point arithmetic.

Needed for exact parity of two reference stages:
  * color enhancer: BGR -> HSV -> gain multiply -> BGR
    (reference: modules/color_enhancer.cpp:38-47)
  * vignetting: BGR -> Lab, scale L, Lab -> BGR
    (reference: modules/vignetting_correction.cpp:68-93)
plus BGR -> gray (float) for the CCC histogram mask
    (reference: convolutional_color_constancy.cpp:213).

Parity status (empirically measured against cv2 5.0 on random inputs, see
tests/test_colorspace.py):
  * bgr_to_hsv_u8:   bit-exact (integer table arithmetic, hsv_shift=12).
  * hsv_to_bgr_u8:   equal except ~0.003% of pixels that land exactly on a
    .5 rounding boundary, where OpenCV 5's FMA-fused SIMD rounds on the
    other side; error is then exactly 1 LSB.
  * bgr_to_lab_u8 / lab_to_bgr_u8: OpenCV's 8u Lab uses a bit-exact
    trilinear-LUT path; we implement the classic integer-table path, which
    lands within 2 LSB of cv2 (79% of random triples exact). TODO(parity):
    replicate the trilinear LUT.
  * bgr_to_gray_f32: exact (float32 Y = 0.299R + 0.587G + 0.114B).

All tables are built once in numpy at import time and closed over as
constants; XLA turns the gathers + elementwise math into fused VPU code.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from raw_image_pipeline_tpu.ops.common import descale, round_u8
from raw_image_pipeline_tpu.ops.lut import CorrectedTable

# ---------------------------------------------------------------------------
# HSV (hsv_shift = 12, matching OpenCV's RGB2HSV_b)
# ---------------------------------------------------------------------------

_HSV_SHIFT = 12


def _build_hsv_tables():
    sdiv = np.zeros(256, np.int32)
    hdiv = np.zeros(256, np.int32)
    v = np.arange(1, 256)
    sdiv[1:] = np.rint((255 << _HSV_SHIFT) / v).astype(np.int32)
    hdiv[1:] = np.rint((180 << _HSV_SHIFT) / (6.0 * v)).astype(np.int32)
    return sdiv, hdiv


_SDIV_TAB, _HDIV_TAB = _build_hsv_tables()

# Formula-served exact tables (see ops/lut.py): the arithmetic runs on the
# VPU; entries where device float rounding differs from the exact table are
# patched by equality-selects.
_SDIV = CorrectedTable(
    lambda v: jnp.where(
        v == 0,
        0,
        jnp.rint((255 << _HSV_SHIFT) / jnp.maximum(v, 1).astype(jnp.float32)).astype(jnp.int32),
    ),
    _SDIV_TAB,
)
_HDIV = CorrectedTable(
    lambda d: jnp.where(
        d == 0,
        0,
        jnp.rint((180 << _HSV_SHIFT) / (6.0 * jnp.maximum(d, 1).astype(jnp.float32))).astype(jnp.int32),
    ),
    _HDIV_TAB,
)


@jax.jit
def bgr_to_hsv_u8(image: jax.Array) -> jax.Array:
    """Bit-exact replica of cv::cvtColor(COLOR_BGR2HSV) for uint8."""
    b = image[..., 0].astype(jnp.int32)
    g = image[..., 1].astype(jnp.int32)
    r = image[..., 2].astype(jnp.int32)
    v = jnp.maximum(jnp.maximum(b, g), r)
    mn = jnp.minimum(jnp.minimum(b, g), r)
    diff = v - mn

    s = (diff * _SDIV(v) + (1 << (_HSV_SHIFT - 1))) >> _HSV_SHIFT

    h_num = jnp.where(
        v == r, g - b, jnp.where(v == g, b - r + 2 * diff, r - g + 4 * diff)
    )
    h = (h_num * _HDIV(diff) + (1 << (_HSV_SHIFT - 1))) >> _HSV_SHIFT
    h = h + jnp.where(h < 0, 180, 0)
    return jnp.stack([h, s, v], axis=-1).astype(jnp.uint8)


# which of tab[0..3] feeds b,g,r per sector (OpenCV sector_data, RGB order
# reversed to BGR). Applied as elementwise selects, not gathers: gathers
# with tiny trailing dims get 40x-padded layouts on TPU and blow HBM.
_SECTOR_DATA = (
    (1, 3, 0), (1, 0, 2), (3, 0, 1), (0, 2, 1), (0, 1, 3), (2, 1, 0)
)


@jax.jit
def hsv_to_bgr_u8(image: jax.Array) -> jax.Array:
    """cv::cvtColor(COLOR_HSV2BGR) for uint8 (float32 path; see module doc
    for the rare 1-LSB boundary deviation vs OpenCV 5 SIMD)."""
    f32 = jnp.float32
    h = image[..., 0].astype(f32)
    s = image[..., 1].astype(f32) * f32(1.0 / 255.0)
    v = image[..., 2].astype(f32) * f32(1.0 / 255.0)

    hf = h * f32(6.0 / 180.0)
    sector = jnp.floor(hf).astype(jnp.int32)
    ff = hf - sector.astype(f32)
    sector = sector % 6

    one = f32(1.0)
    tab = (v, v * (one - s), v * (one - s * ff), v * (one - s * (one - ff)))

    def pick(channel: int):
        out = tab[_SECTOR_DATA[0][channel]]
        for sec in range(1, 6):
            out = jnp.where(sector == sec, tab[_SECTOR_DATA[sec][channel]], out)
        return out

    out = jnp.stack([pick(0), pick(1), pick(2)], axis=-1)
    return round_u8(out * f32(255.0))


# ---------------------------------------------------------------------------
# Lab (integer-table path; lab_shift=12, gamma_shift=3)
# ---------------------------------------------------------------------------

_LAB_SHIFT = 12
_GAMMA_SHIFT = 3
_LAB_SHIFT2 = _LAB_SHIFT + _GAMMA_SHIFT
_CBRT_TAB_SIZE = 3072
_WHITEPT = (0.950456, 1.0, 1.088754)
_XYZ_COEF = (
    0.412453, 0.357580, 0.180423,
    0.212671, 0.715160, 0.072169,
    0.019334, 0.119193, 0.950227,
)


def _build_lab_tables():
    # rounded (not truncated) table construction matches cv2 5.0's 8u path
    # at 99.99% exactly (residual +-1 at ~1e-4 rate from its interpolated
    # variant; measured in tests/test_pointwise_ops.py)
    i = np.arange(256, dtype=np.float64) / 255.0
    lin = np.where(i <= 0.04045, i / 12.92, ((i + 0.055) / 1.055) ** 2.4)
    gamma_tab = np.rint(255.0 * (1 << _GAMMA_SHIFT) * lin).astype(np.int32)

    x = np.arange(_CBRT_TAB_SIZE) * (1.0 / (255 * (1 << _GAMMA_SHIFT)))
    fx = np.where(x < 0.008856, x * 7.787 + 0.13793103448275862, np.cbrt(x))
    cbrt_tab = np.rint((1 << _LAB_SHIFT2) * fx).astype(np.int32)

    coef = np.array(
        [
            np.rint(_XYZ_COEF[j] * (1 << _LAB_SHIFT) / _WHITEPT[j // 3])
            for j in range(9)
        ],
        np.int32,
    )
    return gamma_tab, cbrt_tab, coef


_GAMMA_TAB, _CBRT_TAB, _LAB_COEF = _build_lab_tables()


def _lab_gamma_formula(i):
    f32 = jnp.float32
    x = i.astype(f32) * f32(1.0 / 255.0)
    lin = jnp.where(
        x <= 0.04045,
        x * f32(1.0 / 12.92),
        jnp.power((x + f32(0.055)) * f32(1.0 / 1.055), f32(2.4)),
    )
    return jnp.rint(f32(255 * (1 << _GAMMA_SHIFT)) * lin).astype(jnp.int32)


def _cbrt_formula(i):
    f32 = jnp.float32
    x = i.astype(f32) * f32(1.0 / (255 * (1 << _GAMMA_SHIFT)))
    f = jnp.where(
        x < 0.008856,
        x * f32(7.787) + f32(0.13793103448275862),
        jnp.cbrt(x),
    )
    return jnp.rint(f * f32(1 << _LAB_SHIFT2)).astype(jnp.int32)


_LAB_GAMMA = CorrectedTable(_lab_gamma_formula, _GAMMA_TAB)
_LAB_CBRT = CorrectedTable(_cbrt_formula, _CBRT_TAB)


@jax.jit
def bgr_to_lab_u8(image: jax.Array) -> jax.Array:
    """OpenCV-style integer BGR->Lab for uint8 (sRGB gamma, D65).

    Within 2 LSB of cv2 5.0's bit-exact LUT path; see module docstring.
    Both integer tables (256-entry sRGB linearize, 3072-entry cbrt) are
    served by their float formulas with device-derived sparse corrections
    (ops/lut.py), exactly matching the host-built tables.
    """
    C = [int(c) for c in _LAB_COEF]

    b = _LAB_GAMMA(image[..., 0].astype(jnp.int32))
    g = _LAB_GAMMA(image[..., 1].astype(jnp.int32))
    r = _LAB_GAMMA(image[..., 2].astype(jnp.int32))

    def cbrt_tab(v):
        return _LAB_CBRT(jnp.clip(v, 0, _CBRT_TAB_SIZE - 1))

    fX = cbrt_tab(descale(r * C[0] + g * C[1] + b * C[2], _LAB_SHIFT))
    fY = cbrt_tab(descale(r * C[3] + g * C[4] + b * C[5], _LAB_SHIFT))
    fZ = cbrt_tab(descale(r * C[6] + g * C[7] + b * C[8], _LAB_SHIFT))

    l_scale = (116 * 255 + 50) // 100
    l_shift = -((16 * 255 * (1 << _LAB_SHIFT2) + 50) // 100)
    L = descale(l_scale * fY + l_shift, _LAB_SHIFT2)
    a = descale(500 * (fX - fY) + 128 * (1 << _LAB_SHIFT2), _LAB_SHIFT2)
    bb = descale(200 * (fY - fZ) + 128 * (1 << _LAB_SHIFT2), _LAB_SHIFT2)
    out = jnp.stack([L, a, bb], axis=-1)
    return jnp.clip(out, 0, 255).astype(jnp.uint8)


@jax.jit
def lab_to_bgr_u8(image: jax.Array) -> jax.Array:
    """Lab->BGR for uint8 (float path with sRGB encode, D65)."""
    f32 = jnp.float32
    L = image[..., 0].astype(f32) * f32(100.0 / 255.0)
    a = image[..., 1].astype(f32) - f32(128.0)
    b = image[..., 2].astype(f32) - f32(128.0)

    fY = (L + f32(16.0)) * f32(1.0 / 116.0)
    fX = fY + a * f32(1.0 / 500.0)
    fZ = fY - b * f32(1.0 / 200.0)

    def finv(t):
        t3 = t * t * t
        return jnp.where(t3 > 0.008856, t3, (t - f32(0.13793103448275862)) * f32(1.0 / 7.787))

    X = finv(fX) * f32(_WHITEPT[0])
    # OpenCV uses L > 8 ? fY^3 : L/903.3 for Y
    Y = jnp.where(L > 7.999625, fY * fY * fY, L * f32(1.0 / 903.3))
    Z = finv(fZ) * f32(_WHITEPT[2])

    R = X * f32(3.240479) + Y * f32(-1.53715) + Z * f32(-0.498535)
    G = X * f32(-0.969256) + Y * f32(1.875991) + Z * f32(0.041556)
    B = X * f32(0.055648) + Y * f32(-0.204043) + Z * f32(1.057311)

    def encode(v):
        # sRGB encode computed directly (gather-free); clamp to [0, 1]
        # like the LUT index clamp did
        v = jnp.clip(v, 0.0, 1.0)
        srgb = jnp.where(
            v <= 0.0031308,
            v * f32(12.92),
            f32(1.055) * jnp.power(v, f32(1.0 / 2.4)) - f32(0.055),
        )
        return srgb * f32(255.0)

    out = jnp.stack([encode(B), encode(G), encode(R)], axis=-1)
    return round_u8(out)


# ---------------------------------------------------------------------------
# Gray
# ---------------------------------------------------------------------------


@jax.jit
def bgr_to_gray_f32(image: jax.Array) -> jax.Array:
    """cv::cvtColor(COLOR_BGR2GRAY) on CV_32F: Y = 0.299R + 0.587G + 0.114B."""
    f32 = jnp.float32
    x = image.astype(f32)
    return x[..., 2] * f32(0.299) + x[..., 1] * f32(0.587) + x[..., 0] * f32(0.114)
