"""Per-op TPU cost breakdown for the full 1080p ISP chain.

Two tunnel-safe harnesses (see CLAUDE.md measurement rules):

  * chain ablation — headline 16v64 fetch-marginal of the full chain vs the
    chain with one stage removed; the difference is that stage's in-chain
    cost including its fusion interactions;
  * in-dispatch repetition — K_hi vs K_lo repetitions of one op inside a
    single jit (data-dependence chained so XLA cannot CSE), which cancels
    the per-dispatch fixed cost and the tunnel RTT entirely.

Usage:  python -m raw_image_pipeline_tpu.tools.op_profile [section ...]
Sections: chain, ccc, remap, pointwise (default: all).
"""

from __future__ import annotations

import dataclasses
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def device_noise(shape, seed, dtype=None):
    import jax
    import jax.numpy as jnp

    dtype = dtype or jnp.uint8
    fn = jax.jit(
        lambda: jax.random.randint(
            jax.random.PRNGKey(seed), shape, 0, 256, jnp.int32
        ).astype(dtype)
    )
    out = fn()
    out.block_until_ready()
    return out


def timed_fetch(step, repeats=7):
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        np.asarray(step())
        best = min(best, time.perf_counter() - t0)
    return best


def retry(fn, attempts=3, wait=20):
    """The axon compile helper occasionally restarts mid-run; retry."""
    for a in range(attempts):
        try:
            return fn()
        except Exception as e:
            if a == attempts - 1:
                raise
            log(f"  (attempt {a} failed: {type(e).__name__}; retrying)")
            time.sleep(wait)


def rep_marginal(make_chain, k_lo=2, k_hi=8, repeats=7):
    """make_chain(k) -> jitted zero-arg step running k dependence-chained
    repetitions and returning a scalar checksum. Returns seconds per rep."""
    lo, hi = make_chain(k_lo), make_chain(k_hi)
    np.asarray(lo()), np.asarray(hi())  # compile
    t_lo = timed_fetch(lo, repeats)
    t_hi = timed_fetch(hi, repeats)
    return (t_hi - t_lo) / (k_hi - k_lo)


def batch_marginal(step, px_small, px_big, repeats=7):
    """bench.py-style 16v64 fetch-marginal; returns seconds per frame."""
    np.asarray(step(px_small)), np.asarray(step(px_big))
    t_s = timed_fetch(lambda: step(px_small), repeats)
    t_b = timed_fetch(lambda: step(px_big), repeats)
    return (t_b - t_s) / (px_big.shape[0] - px_small.shape[0])


# ---------------------------------------------------------------------------


def section_chain(h=1080, w=1920, b_small=16, b_big=64):
    """Full-chain ablations: in-chain cost of each heavy stage."""
    import jax
    import jax.numpy as jnp

    import __graft_entry__ as ge
    from raw_image_pipeline_tpu.pipeline import build_pipeline

    full = ge._full_config((h, w))
    pix = {b: device_noise((b, h, w), b) for b in (b_small, b_big)}

    def measure(name, cfg):
        pipe = build_pipeline(cfg, "bayer_gbrg8", frame_hw=(h, w))
        params = jax.device_put(pipe.params)

        @jax.jit
        def step(px):
            out, _ = pipe.fn(params, px, None)
            return jnp.sum(out["processed"], dtype=jnp.int32)

        dt = retry(lambda: batch_marginal(step, pix[b_small], pix[b_big]))
        log(f"  {name:28s} {dt*1e6:8.1f} us/frame")
        return dt

    base = measure("full chain", full)
    ablations = {
        "undistortion": full.replace(
            undistortion=dataclasses.replace(full.undistortion, enabled=False)
        ),
        "vignetting": full.replace(
            vignetting_correction=dataclasses.replace(
                full.vignetting_correction, enabled=False
            )
        ),
        "color_enhancer": full.replace(
            color_enhancer=dataclasses.replace(full.color_enhancer, enabled=False)
        ),
        "color_calibration": full.replace(
            color_calibration=dataclasses.replace(
                full.color_calibration, enabled=False
            )
        ),
        "gamma": full.replace(
            gamma_correction=dataclasses.replace(
                full.gamma_correction, enabled=False
            )
        ),
        "ccc->disabled wb": full.replace(
            white_balance=dataclasses.replace(full.white_balance, enabled=False)
        ),
    }
    for name, cfg in ablations.items():
        dt = measure(f"minus {name}", cfg)
        log(f"    -> {name} in-chain cost ~ {(base-dt)*1e6:.1f} us/frame")
    return base


def section_ccc(b=64):
    """Standalone CCC sub-ops via in-dispatch repetition."""
    import jax
    import jax.numpy as jnp

    from raw_image_pipeline_tpu.config import DEFAULT_CCC_MODEL_PATH
    from raw_image_pipeline_tpu.models.ccc_model import load_ccc_model
    from raw_image_pipeline_tpu.ops import ccc as C
    from raw_image_pipeline_tpu.ops.resize import resize_linear_u8

    model = load_ccc_model(DEFAULT_CCC_MODEL_PATH)
    fr, fi, bs = (
        jnp.asarray(model.filt_dft_re),
        jnp.asarray(model.filt_dft_im),
        jnp.asarray(model.bias),
    )
    frames = device_noise((b, 1080, 1920, 3), 5)
    small = device_noise((b, C.SMALL_H, C.SMALL_W, 3), 6)
    hist0 = jax.jit(lambda x: C.log_chroma_histogram(x, 0.8, 0.1))(small)
    hist0.block_until_ready()

    def chain_resize(k):
        @jax.jit
        def step():
            x = frames
            acc = jnp.int32(0)
            for _ in range(k):
                s = resize_linear_u8(x, C.SMALL_H, C.SMALL_W)
                t = jnp.sum(s, dtype=jnp.int32)
                acc = acc + t
                x = x ^ (t & 1).astype(jnp.uint8)
            return acc
        return step

    def chain_xor_control(k):
        @jax.jit
        def step():
            x = frames
            acc = jnp.int32(0)
            for _ in range(k):
                t = jnp.sum(x[:, ::271, ::479, :], dtype=jnp.int32)
                acc = acc + t
                x = x ^ (t & 1).astype(jnp.uint8)
            return acc
        return step

    def chain_hist(k, impl):
        @jax.jit
        def step():
            x = small
            acc = jnp.float32(0)
            for _ in range(k):
                hh = C.log_chroma_histogram(x, 0.8, 0.1, impl=impl)
                t = jnp.sum(hh)
                acc = acc + t
                x = x ^ (t.astype(jnp.int32) & 1).astype(jnp.uint8)
            return acc
        return step

    def chain_response(k, impl="xla"):
        @jax.jit
        def step():
            hh = hist0
            acc = jnp.float32(0)
            for _ in range(k):
                r = C.ccc_response(hh, fr, fi, bs, impl=impl)
                uv = C.response_argmax(r)
                t = jnp.sum(uv).astype(jnp.float32)
                acc = acc + t
                hh = hist0 + t * jnp.float32(1e-12)
            return acc
        return step

    xor = retry(lambda: rep_marginal(chain_xor_control))
    log(f"  xor-chain control            {xor/b*1e6:8.1f} us/frame")
    for name, mk in (
        ("ccc resize 1080p->270x360", chain_resize),
        ("ccc histogram (pallas)", lambda k: chain_hist(k, "pallas")),
        ("ccc histogram (einsum)", lambda k: chain_hist(k, "einsum")),
        ("ccc response+argmax (xla)", chain_response),
        ("ccc response+argmax (plls)", lambda k: chain_response(k, "pallas")),
    ):
        dt = retry(lambda mk=mk: rep_marginal(mk))
        extra = xor if name.startswith("ccc resize") else 0.0
        log(f"  {name:28s} {dt/b*1e6:8.1f} us/frame"
            + (f"  (~{(dt-extra)/b*1e6:.1f} net of xor)" if extra else ""))


def section_remap(b=64):
    """Remap decomposition: pack / pack+gather / full, batch-minor layout."""
    import jax
    import jax.numpy as jnp

    import __graft_entry__ as ge
    from raw_image_pipeline_tpu.pipeline import make_params
    from raw_image_pipeline_tpu.ops.undistortion import remap_bilinear_u8
    from raw_image_pipeline_tpu.ops.common import round_u8

    h, w = 1080, 1920
    cfg = ge._full_config((h, w))
    params = make_params(cfg, (h, w))
    base = jax.device_put(params.remap_base)
    weights = jax.device_put(params.remap_weights)
    img = device_noise((h, w, b, 3), 7)
    k = b * 3
    n = int(base.shape[0])
    n_chunks = max(1, -(-n // 550_000))
    chunk = -(-n // n_chunks)

    def build_pack(x):
        arr = x.reshape(h * w, -1)
        arrp = jnp.pad(arr, ((0, w + 1), (0, 0)))
        packed = jnp.concatenate(
            [
                arrp[: h * w],
                arrp[1 : h * w + 1],
                arrp[w : h * w + w],
                arrp[w + 1 : h * w + w + 1],
            ],
            axis=1,
        )
        return jax.lax.optimization_barrier(packed)

    def chain_pack(kreps):
        @jax.jit
        def step():
            x = img
            acc = jnp.int32(0)
            for _ in range(kreps):
                p = build_pack(x)
                t = jnp.sum(p[::997, ::97], dtype=jnp.int32)
                acc = acc + t
                x = x ^ (t & 1).astype(jnp.uint8)
            return acc
        return step

    def chain_pack_gather(kreps):
        @jax.jit
        def step():
            x = img
            acc = jnp.int32(0)
            for _ in range(kreps):
                p = build_pack(x)
                tt = jnp.int32(0)
                for s in range(n_chunks):
                    sl = slice(s * chunk, min((s + 1) * chunk, n))
                    rows = jnp.take(p, base[sl], axis=0)
                    tt = tt + jnp.sum(rows[::499, ::53], dtype=jnp.int32)
                acc = acc + tt
                x = x ^ (tt & 1).astype(jnp.uint8)
            return acc
        return step

    def chain_full(kreps):
        @jax.jit
        def step():
            x = img
            acc = jnp.int32(0)
            for _ in range(kreps):
                x = remap_bilinear_u8(x, base, weights, (h, w), (h, w),
                                      batch_minor=True)
                acc = acc + jnp.sum(x[::499, ::53], dtype=jnp.int32)
            return acc
        return step

    for name, mk in (
        ("remap pack only", chain_pack),
        ("remap pack+gather", chain_pack_gather),
        ("remap full (pack+gth+blend)", chain_full),
    ):
        dt = retry(lambda mk=mk: rep_marginal(mk, k_lo=1, k_hi=4))
        log(f"  {name:28s} {dt/b*1e6:8.1f} us/frame")


def section_pointwise(b=64):
    """Pointwise stages in batch-minor layout via in-dispatch repetition."""
    import jax
    import jax.numpy as jnp

    import __graft_entry__ as ge
    from raw_image_pipeline_tpu.pipeline import make_params
    from raw_image_pipeline_tpu.ops.color_calibration import color_correct
    from raw_image_pipeline_tpu.ops.color_enhancer import enhance
    from raw_image_pipeline_tpu.ops.gamma import (
        gamma_apply_poly, gamma_poly_coeffs,
    )
    from raw_image_pipeline_tpu.ops.vignetting import correct as vig
    from raw_image_pipeline_tpu.ops.debayer import debayer

    h, w = 1080, 1920
    cfg = ge._full_config((h, w))
    params = make_params(cfg, (h, w))
    img = device_noise((h, w, b, 3), 8)
    bayer = device_noise((b, h, w), 9)
    mask = jax.device_put(params.vignetting_mask)[:, :, None]
    cm = jax.device_put(params.color_matrix)
    cb = jax.device_put(params.color_bias)
    gains = jax.device_put(params.enhancer_gains)
    gp = jax.device_put(params.gamma_poly)
    gi = jax.device_put(params.gamma_corr_idx)
    gv = jax.device_put(params.gamma_corr_val)
    root = gamma_poly_coeffs(cfg.gamma_correction.k)[1]

    def chain_u8(op):
        def mk(kreps):
            @jax.jit
            def step():
                x = img
                acc = jnp.int32(0)
                for _ in range(kreps):
                    x = op(x)
                    acc = acc + jnp.sum(x[::499, ::53], dtype=jnp.int32)
                return acc
            return step
        return mk

    def chain_debayer(kreps):
        @jax.jit
        def step():
            x = bayer
            acc = jnp.int32(0)
            for _ in range(kreps):
                y = debayer(x, "bayer_gbrg8", "bilinear")
                t = jnp.sum(y[:, ::499, ::53], dtype=jnp.int32)
                acc = acc + t
                x = x ^ (t & 1).astype(jnp.uint8)
            return acc
        return step

    for name, mk in (
        ("debayer (auto/pallas)", chain_debayer),
        ("color_calibration", chain_u8(lambda x: color_correct(x, cm, cb))),
        ("gamma (poly LUT)", chain_u8(
            lambda x: gamma_apply_poly(x, gp, gi, gv, root=root))),
        ("vignetting (Lab roundtrip)", chain_u8(lambda x: vig(x, mask))),
        ("color_enhancer (HSV)", chain_u8(lambda x: enhance(x, gains))),
    ):
        dt = retry(lambda mk=mk: rep_marginal(mk, k_lo=2, k_hi=6))
        log(f"  {name:28s} {dt/b*1e6:8.1f} us/frame")


def main():
    sections = sys.argv[1:] or ["chain", "ccc", "remap", "pointwise"]
    import jax
    log(f"device: {jax.devices()[0]}")
    for s in sections:
        log(f"[{s}]")
        t0 = time.perf_counter()
        globals()[f"section_{s}"]()
        log(f"  ({time.perf_counter()-t0:.0f}s)")


if __name__ == "__main__":
    main()
