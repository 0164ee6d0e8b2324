"""Pallas TPU kernel for the remap's bilinear blend — a MEASURED NEGATIVE
RESULT, kept runnable for the record (round 5, v5e, 1080p B=128):

  * standalone on pre-materialized taps the XLA elementwise blend already
    runs at ~934 GB/s effective (its bandwidth floor); this kernel reaches
    only ~562 GB/s (0.27 vs 0.44 ms per 130k-row chunk);
  * in-chain the XLA blend FUSES INTO the gather kernel, so the [N, 2K]
    tap pairs are never materialized to HBM at all — forcing a split with
    an optimization_barrier costs +12 us/frame (466 -> 477), and routing
    through this kernel costs +50 us/frame (558 -> 606, same-process A/B);
  * therefore the round-4 "~130 us/frame blend sub-target" was the
    fusion's marginal VPU cost trading optimally against HBM traffic, not
    recoverable headroom. Do not re-attempt without a way to do the GATHER
    inside the kernel (Mosaic-blocked, see ROADMAP's dead-end list).

The selector default (ops/undistortion._BLEND_IMPL "auto") therefore
resolves to the fused XLA path everywhere; this kernel stays selectable
via blend_impl="pallas" / set_remap_blend_impl and is held bit-identical
to the sealed XLA chain by tests/test_undistortion.py (interpret mode).

Exactness: the blend must produce the PLAIN two-rounding chain
rn(rn(t0*w0) + rn(t1*w1)) ... (cv::remap's scalar f32 semantics, PARITY.md
remap row). On TPU neither XLA nor Mosaic contracts mul+add into fma for
f32 (verified on-chip: 0 mismatches vs the sealed XLA blend over a full
1080p x 128 batch), so the kernel writes the products plainly.

Reference per-frame loop: modules/undistortion.cpp:240-245 (cv::remap
INTER_LINEAR).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

_ROW_BLOCK = 512  # rows per grid step (u8 tile-aligned; ~1.6 MB VMEM live)


def _blend_kernel(k: int, top_ref, bot_ref, wt_ref, out_ref):
    """One row block: out = round_u8(t0*w0 + t1*w1 + b0*w2 + b1*w3).

    top/bot: [rb, 2K] u8 gathered tap pairs (horizontal pairs of the
    anchor row and the row below); wt: [rb, 4] f32 per-row weights;
    out: [rb, K] u8. The per-row weight scalars broadcast along lanes."""
    f32 = jnp.float32
    w = wt_ref[...]
    rb = w.shape[0]

    def wb(j):
        return jnp.broadcast_to(w[:, j:j + 1], (rb, k))

    def tap(ref, lo):
        # Mosaic has no u8->f32 cast; via i32 (exact for 0..255)
        return ref[:, lo:lo + k].astype(jnp.int32).astype(f32)

    acc = tap(top_ref, 0) * wb(0)
    acc = acc + tap(top_ref, k) * wb(1)
    acc = acc + tap(bot_ref, 0) * wb(2)
    acc = acc + tap(bot_ref, k) * wb(3)
    # Mosaic has no f32->u8 cast either; rint/clip then via i32
    out_ref[...] = (
        jnp.clip(jnp.rint(acc), 0, 255).astype(jnp.int32).astype(jnp.uint8)
    )


@partial(jax.jit, static_argnames=("interpret",))
def blend_rows_pallas(top: jax.Array, bot: jax.Array, wt: jax.Array,
                      interpret: bool = False) -> jax.Array:
    """top, bot: [N, 2K] u8; wt: [N, 4] f32 -> [N, K] u8.

    N need not be a block multiple (Pallas masks the ragged edge block).
    interpret=True runs the Pallas interpreter (CPU test coverage)."""
    n, k2 = top.shape
    k = k2 // 2
    rb = min(_ROW_BLOCK, -(-n // 8) * 8)
    return pl.pallas_call(
        partial(_blend_kernel, k),
        out_shape=jax.ShapeDtypeStruct((n, k), jnp.uint8),
        grid=(-(-n // rb),),
        in_specs=[
            pl.BlockSpec((rb, k2), lambda i: (i, 0)),
            pl.BlockSpec((rb, k2), lambda i: (i, 0)),
            pl.BlockSpec((rb, 4), lambda i: (i, 0)),
        ],
        out_specs=pl.BlockSpec((rb, k), lambda i: (i, 0)),
        interpret=interpret,
    )(top, bot, wt)
