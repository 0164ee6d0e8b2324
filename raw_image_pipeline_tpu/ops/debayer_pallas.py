"""Pallas TPU kernel for bilinear demosaic.

Same math as ops/debayer.debayer_bilinear (bit-exact vs cv::demosaicing —
shared test), expressed as a banded-DMA Pallas kernel: the grid walks
(batch, row-tile); each step copies a (TILE+2)-row halo band of the
zero-padded Bayer frame from HBM into VMEM, computes the three planes with
the 2/4-neighbor integer averages on the VPU, and writes a planar
[3, TILE, W] block.

Planar output ([B, 3, H, W]) is deliberate: a channels-last u8 block would
put the size-3 channel axis in the lane dimension (42x tile padding);
planar keeps W in lanes. debayer_bilinear_pallas_nhwc wraps it back to the
pipeline's NHWC convention with one XLA transpose.

Parity note: row/col parity of each tile's origin is passed via the grid,
so phase masks match the absolute pixel coordinates exactly, and the border
replication of the XLA path is reproduced by clamping the band to the
padded frame plus a post-pass copy of the outermost rows/cols.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from raw_image_pipeline_tpu.ops.debayer import _site_masks

TILE = 128


BAND = TILE + 8  # DMA row slices must be 8-aligned; 6 trailing rows unused


def _kernel(phase: str, h: int, w: int, x_hbm, out_ref, band, sem):
    b = pl.program_id(0)
    t = pl.program_id(1)

    # DMA the (8-aligned) halo band: padded rows [t*TILE, t*TILE + BAND)
    dma = pltpu.make_async_copy(
        x_hbm.at[b, pl.ds(t * TILE, BAND), :],
        band,
        sem,
    )
    dma.start()
    dma.wait()

    x = band[:].astype(jnp.int32)  # [BAND, WP] (1px halo + lane padding)
    m = TILE + 2
    c = x[1:m - 1, 1:w + 1]
    n = x[0:m - 2, 1:w + 1]
    s = x[2:m, 1:w + 1]
    wv = x[1:m - 1, 0:w]
    e = x[1:m - 1, 2:w + 2]
    nw = x[0:m - 2, 0:w]
    ne = x[0:m - 2, 2:w + 2]
    sw = x[2:m, 0:w]
    se = x[2:m, 2:w + 2]

    v2 = (n + s + 1) >> 1
    h2 = (wv + e + 1) >> 1
    n4 = (n + s + wv + e + 2) >> 2
    d4 = (nw + ne + sw + se + 2) >> 2

    # absolute row parity of this tile's first row is t*TILE (even since
    # TILE is even), so the precomputed masks line up for every tile
    r_site, g_r_row, g_b_row, b_site = _site_masks(TILE, w, phase)
    g_site = g_r_row | g_b_row

    g = jnp.where(g_site, c, n4)
    r = jnp.where(r_site, c, jnp.where(g_r_row, h2, jnp.where(g_b_row, v2, d4)))
    bl = jnp.where(b_site, c, jnp.where(g_b_row, h2, jnp.where(g_r_row, v2, d4)))

    out_ref[0, 0] = jnp.clip(bl, 0, 255).astype(jnp.uint8)
    out_ref[0, 1] = jnp.clip(g, 0, 255).astype(jnp.uint8)
    out_ref[0, 2] = jnp.clip(r, 0, 255).astype(jnp.uint8)


@partial(jax.jit, static_argnames=("phase",))
def debayer_bilinear_pallas(bayer: jax.Array, phase: str) -> jax.Array:
    """[B, H, W] uint8 -> [B, 3, H, W] uint8 planar BGR (cv2 semantics
    including border replication). H must be a multiple of TILE."""
    bsz, h, w = bayer.shape
    assert h % TILE == 0, f"H={h} must be a multiple of {TILE}"
    # 1px halo, extra zero rows so every 8-aligned band slice is in
    # range, and the lane dim rounded up to a 128 multiple (DMA slices must
    # align to the (8, 128) tiling)
    wp = -(-(w + 2) // 128) * 128
    padded = jnp.pad(bayer, [(0, 0), (1, BAND - TILE - 1), (1, wp - w - 1)])

    out = pl.pallas_call(
        partial(_kernel, phase, h, w),
        out_shape=jax.ShapeDtypeStruct((bsz, 3, h, w), jnp.uint8),
        grid=(bsz, h // TILE),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(
            (1, 3, TILE, w), lambda b, t: (b, 0, t, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((BAND, wp), jnp.uint8),
            pltpu.SemaphoreType.DMA,
        ],
    )(padded)

    # border replication (cv::demosaicing behavior, see ops/debayer.py)
    out = out.at[:, :, 0, :].set(out[:, :, 1, :])
    out = out.at[:, :, -1, :].set(out[:, :, -2, :])
    out = out.at[:, :, :, 0].set(out[:, :, :, 1])
    out = out.at[:, :, :, -1].set(out[:, :, :, -2])
    return out


@partial(jax.jit, static_argnames=("phase",))
def debayer_bilinear_pallas_nhwc(bayer: jax.Array, phase: str) -> jax.Array:
    """NHWC wrapper: [B, H, W] -> [B, H, W, 3] uint8."""
    return jnp.transpose(debayer_bilinear_pallas(bayer, phase), (0, 2, 3, 1))
