"""Fisheye (equidistant) undistortion.

Init-time host math — bit-exact numpy ports (verified equal to cv2.fisheye
to the last double) of:
  * cv::fisheye::undistortPoints (iterative theta solve),
  * cv::fisheye::estimateNewCameraMatrixForUndistortRectify
    (reference: modules/undistortion.cpp:199-214),
  * cv::fisheye::initUndistortRectifyMap
    (reference: modules/undistortion.cpp:216-238).

Device remap — bilinear gather with BORDER_CONSTANT=0 and round-half-even,
matching cv2 5.0's float-map INTER_LINEAR path exactly (older OpenCV used a
5-bit fixed-point variant; both stay within 1 LSB of each other). The
reference applies this per frame (undistortion.cpp:240-245).

The maps are computed once per calibration and closed over as constants;
the per-frame device work is 4 gathers + fused multiply-adds. The gathers
are the one genuinely memory-irregular op in the ISP — a Pallas kernel with
row-banded DMA is the planned fast path; the XLA gather version below is
the correctness baseline.

Like the reference, the fisheye model is used for any distortion_model
string except "none" (undistortion.cpp:199-220, SURVEY.md §8.8).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from raw_image_pipeline_tpu.ops.common import round_u8


# ---------------------------------------------------------------------------
# Host-side fisheye math (numpy, float64 — init time only)
# ---------------------------------------------------------------------------


def fisheye_undistort_points(pts: np.ndarray, K: np.ndarray, D: np.ndarray, R: np.ndarray) -> np.ndarray:
    """cv::fisheye::undistortPoints: pts [N,2] pixel coords -> normalized,
    rectified image coords [N,2]."""
    fx, fy, cx, cy = K[0, 0], K[1, 1], K[0, 2], K[1, 2]
    out = np.empty_like(pts, dtype=np.float64)
    for n, (u, v) in enumerate(np.asarray(pts, dtype=np.float64)):
        pwx, pwy = (u - cx) / fx, (v - cy) / fy
        theta_d = np.sqrt(pwx * pwx + pwy * pwy)
        theta_d = min(max(theta_d, -np.pi / 2), np.pi / 2)
        scale = 1.0
        if theta_d > 1e-8:
            theta = theta_d
            for _ in range(10):
                t2 = theta * theta
                t4, t6, t8 = t2 * t2, t2 * t2 * t2, t2 * t2 * t2 * t2
                num = theta * (1 + D[0] * t2 + D[1] * t4 + D[2] * t6 + D[3] * t8) - theta_d
                den = 1 + 3 * D[0] * t2 + 5 * D[1] * t4 + 7 * D[2] * t6 + 9 * D[3] * t8
                fix = num / den
                theta -= fix
                if abs(fix) < 1e-8:
                    break
            scale = np.tan(theta) / theta_d
        vec = R @ np.array([pwx * scale, pwy * scale, 1.0])
        out[n] = (vec[0] / vec[2], vec[1] / vec[2])
    return out


def estimate_new_camera_matrix(
    K: np.ndarray,
    D: np.ndarray,
    image_size: Tuple[int, int],
    R: np.ndarray,
    balance: float = 0.0,
    new_size: Tuple[int, int] | None = None,
    fov_scale: float = 1.0,
) -> np.ndarray:
    """cv::fisheye::estimateNewCameraMatrixForUndistortRectify.
    image_size/new_size are (width, height)."""
    w, h = image_size
    balance = min(max(balance, 0.0), 1.0)
    pts = np.array([[w / 2, 0], [w, h / 2], [w / 2, h], [0, h / 2]], np.float64)
    up = fisheye_undistort_points(pts, K, D, R)
    cn = up.mean(axis=0)
    aspect = K[0, 0] / K[1, 1]
    cn[1] *= aspect
    up = up.copy()
    up[:, 1] *= aspect
    minx, miny = up.min(axis=0)
    maxx, maxy = up.max(axis=0)
    f1 = w * 0.5 / (cn[0] - minx)
    f2 = w * 0.5 / (maxx - cn[0])
    f3 = h * 0.5 * aspect / (cn[1] - miny)
    f4 = h * 0.5 * aspect / (maxy - cn[1])
    fmin, fmax = min(f1, f2, f3, f4), max(f1, f2, f3, f4)
    f = balance * fmin + (1.0 - balance) * fmax
    f *= (1.0 / fov_scale) if fov_scale > 0 else 1.0
    new_f = [f, f]
    new_c = [-cn[0] * f + w * 0.5, -cn[1] * f + h * aspect * 0.5]
    new_f[1] /= aspect
    new_c[1] /= aspect
    if new_size is not None:
        rx, ry = new_size[0] / w, new_size[1] / h
        new_f[0] *= rx
        new_f[1] *= ry
        new_c[0] *= rx
        new_c[1] *= ry
    return np.array(
        [[new_f[0], 0, new_c[0]], [0, new_f[1], new_c[1]], [0, 0, 1]], np.float64
    )


def init_undistort_rectify_map(
    K: np.ndarray,
    D: np.ndarray,
    R: np.ndarray,
    P: np.ndarray,
    size: Tuple[int, int],
) -> Tuple[np.ndarray, np.ndarray]:
    """cv::fisheye::initUndistortRectifyMap -> (map_x, map_y) float32 [H, W].
    size is (width, height); P may be 3x3 or 3x4 (only P[:3,:3] is used)."""
    w, h = size
    PR = np.asarray(P, np.float64)[:3, :3] @ np.asarray(R, np.float64)
    iR = np.linalg.inv(PR)
    j, i = np.meshgrid(np.arange(w, dtype=np.float64), np.arange(h, dtype=np.float64))
    _x = iR[0, 0] * j + iR[0, 1] * i + iR[0, 2]
    _y = iR[1, 0] * j + iR[1, 1] * i + iR[1, 2]
    _w = iR[2, 0] * j + iR[2, 1] * i + iR[2, 2]
    x = _x / _w
    y = _y / _w
    r = np.sqrt(x * x + y * y)
    theta = np.arctan(r)
    t2 = theta * theta
    theta_d = theta * (1 + D[0] * t2 + D[1] * t2**2 + D[2] * t2**3 + D[3] * t2**4)
    with np.errstate(invalid="ignore", divide="ignore"):
        scale = np.where(r == 0, 1.0, theta_d / np.where(r == 0, 1.0, r))
    u = K[0, 0] * x * scale + K[0, 2]
    v = K[1, 1] * y * scale + K[1, 2]
    return u.astype(np.float32), v.astype(np.float32)


# ---------------------------------------------------------------------------
# Device remap
# ---------------------------------------------------------------------------


@jax.jit
def remap_bilinear_u8(image: jax.Array, map_x: jax.Array, map_y: jax.Array) -> jax.Array:
    """cv::remap(INTER_LINEAR, BORDER_CONSTANT, 0) with float32 maps.

    image: [..., H, W, C] uint8; map_x/map_y: [Ho, Wo] float32.
    Returns [..., Ho, Wo, C] uint8.

    TPU formulation: XLA's gather is index-rate-bound (~8 ns per index, no
    matter how many bytes each index fetches), so the kernel spends one
    index per *output pixel*, not per tap: the image is zero-padded by one
    pixel (realizing BORDER_CONSTANT for edge taps), flattened to
    [(H+2)*(W+2), batch*C], and the four bilinear taps are pre-packed into
    one wide row by concatenating shifted copies — a single row-gather then
    fetches all taps for every frame and channel at once. Per-frame gather
    cost scales as 1/batch.
    """
    h, w = image.shape[-3], image.shape[-2]
    c = image.shape[-1]
    lead = image.shape[:-3]
    ho, wo = map_x.shape
    f32 = jnp.float32

    ix = jnp.floor(map_x).astype(jnp.int32)
    iy = jnp.floor(map_y).astype(jnp.int32)
    fx = map_x.astype(f32) - ix.astype(f32)
    fy = map_y.astype(f32) - iy.astype(f32)

    # pad 1px of zeros: edge-adjacent out-of-bounds taps then read real
    # zeros (BORDER_CONSTANT); anything further out is masked at the end
    hp, wp = h + 2, w + 2
    padded = jnp.pad(image, [(0, 0)] * len(lead) + [(1, 1), (1, 1), (0, 0)])
    # [(H+2)*(W+2), K] with K = prod(lead)*C — taps shared across K
    arr = padded.reshape((-1, hp * wp, c))
    arr = jnp.moveaxis(arr, 0, 1).reshape(hp * wp, -1)
    k = arr.shape[1]
    packed = jnp.concatenate(
        [
            arr,
            jnp.roll(arr, -1, axis=0),
            jnp.roll(arr, -wp, axis=0),
            jnp.roll(arr, -(wp + 1), axis=0),
        ],
        axis=1,
    )  # [hp*wp, 4K]

    inr = (iy >= -1) & (iy <= h - 1) & (ix >= -1) & (ix <= w - 1)
    base = (
        jnp.clip(iy + 1, 0, hp - 2) * wp + jnp.clip(ix + 1, 0, wp - 2)
    ).reshape(-1)

    rows = jnp.take(packed, base, axis=0)  # [N, 4K] u8
    # tap groups as column slices (a [N,4,K] reshape gets a tile-padded
    # layout); blend in f32, round to u8 before the output transpose so the
    # transposed temp is 4x smaller
    w00 = ((1 - fx) * (1 - fy)).reshape(-1, 1)
    w01 = (fx * (1 - fy)).reshape(-1, 1)
    w10 = ((1 - fx) * fy).reshape(-1, 1)
    w11 = (fx * fy).reshape(-1, 1)
    acc = (
        rows[:, 0:k].astype(f32) * w00
        + rows[:, k:2 * k].astype(f32) * w01
        + rows[:, 2 * k:3 * k].astype(f32) * w10
        + rows[:, 3 * k:4 * k].astype(f32) * w11
    ) * inr.reshape(-1, 1).astype(f32)
    out_u8 = round_u8(acc)  # [N, K]

    out = out_u8.reshape(ho * wo, -1, c)
    out = jnp.moveaxis(out, 1, 0).reshape(lead + (ho, wo, c))
    return out
