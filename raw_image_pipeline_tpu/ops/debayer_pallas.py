"""Pallas TPU kernel for bilinear demosaic.

Same math as ops/debayer.debayer_bilinear (bit-exact vs cv::demosaicing —
shared test), expressed as a banded-DMA Pallas kernel: the grid walks
(batch, row-tile); each step copies a (TILE+2)-row halo band of the
zero-padded Bayer frame from HBM into VMEM, computes the three planes with
the 2/4-neighbor integer averages on the VPU, and writes a planar
[3, TILE, W] block. cv::demosaicing's border replication is applied
in-kernel (columns on every tile, rows on the first/last tile), so no XLA
post-pass touches the output.

Planar output ([B, 3, H, W]) is deliberate: a channels-last u8 block would
put the size-3 channel axis in the lane dimension (42x tile padding);
planar keeps W in lanes. debayer_bilinear_pallas_nhwc wraps it back to the
pipeline's NHWC convention with one XLA transpose.

Parity note: row/col parity of each tile's origin is passed via the grid,
so phase masks match the absolute pixel coordinates exactly. The row tile
is chosen per frame height (a multiple-of-8 divisor of H, so every DMA
band slice stays 8-aligned and tiles never straddle the frame);
tile_rows_for() returns None when no such divisor exists and callers fall
back to the XLA path. Standalone at 1080p B=64 on v5e the kernel runs the
demosaic ~2x faster than the fused XLA stencil (86 vs 190 us/frame).
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from raw_image_pipeline_tpu.ops.debayer import _site_masks


def tile_rows_for(h: int, max_tile: int = 128) -> int | None:
    """Largest multiple-of-8 divisor of h that is <= max_tile (None if h
    has no such divisor >= 8). Multiple-of-8 keeps every band DMA slice
    8-row aligned; divisor keeps tiles from straddling the frame edge.
    max_tile 128: the kernel's int32 stencil intermediates scale with the
    tile and exceed the 16 MB VMEM budget near tile 256 at 1920 lanes."""
    best = None
    for t in range(8, max_tile + 1, 8):
        if h % t == 0:
            best = t
    return best


def _kernel(phase: str, tile: int, w: int, x_hbm, out_ref, band, sem):
    b = pl.program_id(0)
    t = pl.program_id(1)
    nt = pl.num_programs(1)
    band_rows = band.shape[0]

    # DMA the (8-aligned) halo band: padded rows [t*tile, t*tile + band)
    dma = pltpu.make_async_copy(
        x_hbm.at[b, pl.ds(t * tile, band_rows), :],
        band,
        sem,
    )
    dma.start()
    dma.wait()

    x = band[:].astype(jnp.int32)  # [band, WP] (1px halo + lane padding)
    m = tile + 2
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

    # absolute row parity of this tile's first row is t*tile (even since
    # tile is a multiple of 8), so the precomputed masks line up everywhere
    r_site, g_r_row, g_b_row, b_site = _site_masks(tile, w, phase)
    g_site = g_r_row | g_b_row

    g = jnp.where(g_site, c, n4)
    r = jnp.where(r_site, c, jnp.where(g_r_row, h2, jnp.where(g_b_row, v2, d4)))
    bl = jnp.where(b_site, c, jnp.where(g_b_row, h2, jnp.where(g_r_row, v2, d4)))

    def store(ch, plane):
        u8 = jnp.clip(plane, 0, 255).astype(jnp.uint8)
        # cv::demosaicing border replication: columns here (every tile),
        # rows below (first/last tile only). Column-then-row ordering gives
        # the same corners as the reference's row-then-column (both end at
        # the (1,1)-diagonal neighbor).
        u8 = jnp.concatenate([u8[:, 1:2], u8[:, 1:-1], u8[:, -2:-1]], axis=1)
        out_ref[0, ch] = u8

        @pl.when(t == 0)
        def _():
            out_ref[0, ch, 0:1, :] = u8[1:2, :]

        @pl.when(t == nt - 1)
        def _():
            out_ref[0, ch, tile - 1:tile, :] = u8[tile - 2:tile - 1, :]

    store(0, bl)
    store(1, g)
    store(2, r)


@partial(jax.jit, static_argnames=("phase", "interpret"))
def debayer_bilinear_pallas(bayer: jax.Array, phase: str,
                            interpret: bool = False) -> jax.Array:
    """[B, H, W] uint8 -> [B, 3, H, W] uint8 planar BGR (cv2 semantics
    including border replication). H must have a multiple-of-8 divisor
    (see tile_rows_for). interpret=True runs the Pallas interpreter
    (CPU test coverage of the kernel body incl. the DMA)."""
    bsz, h, w = bayer.shape
    tile = tile_rows_for(h)
    assert tile is not None, f"H={h} has no multiple-of-8 row tile"
    band = tile + 8  # DMA row slices must be 8-aligned; 6 trailing rows unused
    # 1px halo, extra zero rows so every 8-aligned band slice is in
    # range, and the lane dim rounded up to a 128 multiple (DMA slices must
    # align to the (8, 128) tiling)
    wp = -(-(w + 2) // 128) * 128
    padded = jnp.pad(bayer, [(0, 0), (1, band - tile - 1), (1, wp - w - 1)])

    return pl.pallas_call(
        partial(_kernel, phase, tile, w),
        out_shape=jax.ShapeDtypeStruct((bsz, 3, h, w), jnp.uint8),
        grid=(bsz, h // tile),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(
            (1, 3, tile, w), lambda b, t: (b, 0, t, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((band, wp), jnp.uint8),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(padded)


def _core_for(kind: str, interpret: bool):
    core = {"bilinear": debayer_bilinear_pallas, "mht": debayer_mht_pallas}[kind]
    return partial(core, interpret=interpret) if interpret else core


@lru_cache(maxsize=None)
def _nhwc_fn(phase: str, kind: str = "bilinear", interpret: bool = False):
    """Per-phase NHWC wrapper with a custom vmap rule: Mosaic cannot batch
    a pallas_call whose input block lives in memory_space=ANY, so an outer
    vmap (the multicamera path) is absorbed by collapsing the mapped axis
    into the kernel's grid batch axis instead — bit-identical, and the
    kernel runs once over cameras x frames. kind: "bilinear" | "mht"
    (the planar kernel entry, [B,H,W] -> [B,3,H,W])."""
    core = _core_for(kind, interpret)

    @jax.custom_batching.custom_vmap
    def fn(bayer: jax.Array) -> jax.Array:
        return jnp.transpose(core(bayer, phase), (0, 2, 3, 1))

    @fn.def_vmap
    def _rule(axis_size, in_batched, bayer):
        (batched,) = in_batched
        if not batched:
            bayer = jnp.broadcast_to(bayer, (axis_size,) + bayer.shape)
        out = fn(bayer.reshape((-1,) + bayer.shape[2:]))
        return out.reshape((axis_size, -1) + out.shape[1:]), True

    return fn


@partial(jax.jit, static_argnames=("phase", "interpret"))
def debayer_bilinear_pallas_nhwc(bayer: jax.Array, phase: str,
                                 interpret: bool = False) -> jax.Array:
    """NHWC wrapper: [B, H, W] -> [B, H, W, 3] uint8."""
    return _nhwc_fn(phase, "bilinear", interpret)(bayer)


@lru_cache(maxsize=None)
def _planes_fn(phase: str, kind: str = "bilinear", interpret: bool = False):
    """Planes wrapper (see _nhwc_fn for the custom_vmap rationale): the
    kernel output is natively planar [B, 3, H, W], so serving the chain's
    planar fast path as three contiguous plane slices skips the NHWC
    transpose + channel re-slicing roundtrip entirely."""
    core = _core_for(kind, interpret)

    @jax.custom_batching.custom_vmap
    def fn(bayer: jax.Array):
        out = core(bayer, phase)  # [B, 3, H, W]
        return out[:, 0], out[:, 1], out[:, 2]

    @fn.def_vmap
    def _rule(axis_size, in_batched, bayer):
        (batched,) = in_batched
        if not batched:
            bayer = jnp.broadcast_to(bayer, (axis_size,) + bayer.shape)
        outs = fn(bayer.reshape((-1,) + bayer.shape[2:]))
        outs = tuple(o.reshape((axis_size, -1) + o.shape[1:]) for o in outs)
        return outs, (True, True, True)

    return fn


@partial(jax.jit, static_argnames=("phase", "interpret"))
def debayer_bilinear_pallas_planes(bayer: jax.Array, phase: str,
                                   interpret: bool = False):
    """Planar wrapper: [B, H, W] -> three [B, H, W] uint8 planes (B, G, R
    order, same values as debayer_bilinear_pallas_nhwc's channels)."""
    return _planes_fn(phase, "bilinear", interpret)(bayer)


# ---------------------------------------------------------------------------
# MHT (Malvar-He-Cutler 5x5, the reference GPU algorithm) banded-DMA kernel
# ---------------------------------------------------------------------------


def mht_tile_rows_for(h: int) -> int | None:
    """Row tile for the MHT kernel: the 5x5 stencil keeps ~18 int32
    [tile, W] temps live, so the tile caps at 64 (vs the bilinear 128) to
    stay inside the Mosaic VMEM budget at 1920 lanes."""
    return tile_rows_for(h, max_tile=64)


def _mht_kernel(phase: str, tile: int, w: int, x_hbm, out_ref, band, sem):
    """One grid step: MHC'04 stencil over a CLAMP-padded mosaic band.

    Identical integer arithmetic to ops/debayer._mht_core (filters x16,
    descale by 4 bits round-half-even); the clamp-to-edge border semantics
    (cudaAddressModeClamp in the reference's CUDA kernel) are encoded in
    the padded input, so the full stencil is valid everywhere and no
    output border pass is needed."""
    b = pl.program_id(0)
    t = pl.program_id(1)
    band_rows = band.shape[0]

    dma = pltpu.make_async_copy(
        x_hbm.at[b, pl.ds(t * tile, band_rows), :],
        band,
        sem,
    )
    dma.start()
    dma.wait()

    x = band[:].astype(jnp.int32)  # [band, WP], 2px clamp halo at (2, 2)

    def sh(dy, dx):
        return x[2 + dy: 2 + dy + tile, 2 + dx: 2 + dx + w]

    c = sh(0, 0)
    n1, s1, w1, e1 = sh(-1, 0), sh(1, 0), sh(0, -1), sh(0, 1)
    n2, s2, w2, e2 = sh(-2, 0), sh(2, 0), sh(0, -2), sh(0, 2)
    nw, ne_, sw, se_ = sh(-1, -1), sh(-1, 1), sh(1, -1), sh(1, 1)

    cross4 = n1 + s1 + w1 + e1
    diag4 = nw + ne_ + sw + se_
    axial4 = n2 + s2 + w2 + e2

    g_at_rb = 8 * c + 4 * cross4 - 2 * axial4
    rb_at_g_h = 10 * c + 8 * (w1 + e1) - 2 * diag4 - 2 * (w2 + e2) + (n2 + s2)
    rb_at_g_v = 10 * c + 8 * (n1 + s1) - 2 * diag4 - 2 * (n2 + s2) + (w2 + e2)
    rb_at_br = 12 * c + 4 * diag4 - 3 * axial4

    def desc8(v):
        # v/16 with round-half-even (= rint of the float stencil value)
        q = (v + 8) >> 4
        return q - (((v & 15) == 8) & ((q & 1) == 1)).astype(v.dtype)

    # tile origin row t*tile is even (tile is a multiple of 8), so the
    # per-tile masks line up with the absolute pixel parity
    r_site, g_r_row, g_b_row, b_site = _site_masks(tile, w, phase)
    g_site = g_r_row | g_b_row

    g = jnp.where(g_site, c, desc8(g_at_rb))
    r = jnp.where(
        r_site, c,
        jnp.where(g_r_row, desc8(rb_at_g_h),
                  jnp.where(g_b_row, desc8(rb_at_g_v), desc8(rb_at_br))),
    )
    bl = jnp.where(
        b_site, c,
        jnp.where(g_b_row, desc8(rb_at_g_h),
                  jnp.where(g_r_row, desc8(rb_at_g_v), desc8(rb_at_br))),
    )
    out_ref[0, 0] = jnp.clip(bl, 0, 255).astype(jnp.uint8)
    out_ref[0, 1] = jnp.clip(g, 0, 255).astype(jnp.uint8)
    out_ref[0, 2] = jnp.clip(r, 0, 255).astype(jnp.uint8)


@partial(jax.jit, static_argnames=("phase", "interpret"))
def debayer_mht_pallas(bayer: jax.Array, phase: str,
                       interpret: bool = False) -> jax.Array:
    """[B, H, W] uint8 -> [B, 3, H, W] uint8 planar BGR, bit-identical to
    ops/debayer.debayer_mht (clamp-to-edge borders included; asserted in
    interpret mode by tests/test_debayer_pallas.py and on-chip by
    bench.py's pallas_debayer_check every run)."""
    bsz, h, w = bayer.shape
    tile = mht_tile_rows_for(h)
    assert tile is not None, f"H={h} has no multiple-of-8 row tile <= 64"
    band = tile + 8  # 2px halo; 8-aligned DMA slices
    wp = -(-(w + 4) // 128) * 128
    # clamp-to-edge 2px pad (concat form — pad(mode='edge') lowers worse on
    # TPU), then zero rows/lanes to the DMA-aligned buffer size
    p = jnp.concatenate(
        [bayer[:, :1], bayer[:, :1], bayer, bayer[:, -1:], bayer[:, -1:]],
        axis=1,
    )
    p = jnp.concatenate(
        [p[:, :, :1], p[:, :, :1], p, p[:, :, -1:], p[:, :, -1:]], axis=2
    )
    p = jnp.pad(p, [(0, 0), (0, band - tile - 4), (0, wp - w - 4)])

    return pl.pallas_call(
        partial(_mht_kernel, phase, tile, w),
        out_shape=jax.ShapeDtypeStruct((bsz, 3, h, w), jnp.uint8),
        grid=(bsz, h // tile),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(
            (1, 3, tile, w), lambda b, t: (b, 0, t, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((band, wp), jnp.uint8),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(p)


@partial(jax.jit, static_argnames=("phase", "interpret"))
def debayer_mht_pallas_nhwc(bayer: jax.Array, phase: str,
                            interpret: bool = False) -> jax.Array:
    """NHWC wrapper: [B, H, W] -> [B, H, W, 3] uint8."""
    return _nhwc_fn(phase, "mht", interpret)(bayer)


@partial(jax.jit, static_argnames=("phase", "interpret"))
def debayer_mht_pallas_planes(bayer: jax.Array, phase: str,
                              interpret: bool = False):
    """Planar wrapper: [B, H, W] -> three [B, H, W] uint8 planes."""
    return _planes_fn(phase, "mht", interpret)(bayer)
