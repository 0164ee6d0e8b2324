"""Per-op TPU cost breakdown for the full 1080p ISP chain.

Two tunnel-safe harnesses (see CLAUDE.md measurement rules):

  * chain ablation — headline 16v64 fetch-marginal of the full chain vs the
    chain with one stage removed; the difference is that stage's in-chain
    cost including its fusion interactions;
  * in-dispatch repetition — K_hi vs K_lo repetitions of one op inside a
    single jit (data-dependence chained so XLA cannot CSE), which cancels
    the per-dispatch fixed cost and the tunnel RTT entirely.

Usage:  python -m raw_image_pipeline_tpu.tools.op_profile [section ...]
Sections: chain, ccc, remap, pointwise, steady (default: all but steady;
`steady` is the per-stage K-dispatch ablation at B=128 — the honest
attribution, since marginals cancel the remap's batch-independent cost).
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


def retry(fn, attempts=3, wait=75):
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


def batch_marginal(step, px_small, px_big, repeats=7, db=None):
    """bench.py-style 16v64 fetch-marginal; returns seconds per frame.
    db: frame-count difference (defaults to leading-axis difference — pass
    explicitly for batch-minor layouts where batch is not axis 0)."""
    np.asarray(step(px_small)), np.asarray(step(px_big))
    t_s = timed_fetch(lambda: step(px_small), repeats)
    t_b = timed_fetch(lambda: step(px_big), repeats)
    if db is None:
        db = px_big.shape[0] - px_small.shape[0]
    return (t_b - t_s) / db


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


def section_ccc(b_small=16, b_big=64):
    """Standalone CCC sub-ops via batch-size fetch-marginals (single-op
    dispatches keep the axon remote compiler happy; the in-dispatch
    repetition harness hangs it on large unrolled programs)."""
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
    frames = {b: device_noise((b, 1080, 1920, 3), b) for b in (b_small, b_big)}
    small = {b: device_noise((b, C.SMALL_H, C.SMALL_W, 3), b + 1)
             for b in (b_small, b_big)}
    hist = {}
    for b in (b_small, b_big):
        hist[b] = jax.jit(lambda x: C.log_chroma_histogram(x, 0.8, 0.1))(small[b])
        hist[b].block_until_ready()

    def run(name, step, inputs):
        jitted = jax.jit(step)
        dt = retry(lambda: batch_marginal(
            lambda x: jitted(x), inputs[b_small], inputs[b_big]))
        log(f"  {name:28s} {dt*1e6:8.1f} us/frame")

    run("ccc resize 1080p->270x360",
        lambda x: jnp.sum(resize_linear_u8(x, C.SMALL_H, C.SMALL_W),
                          dtype=jnp.int32), frames)
    run("ccc histogram (pallas)",
        lambda x: jnp.sum(C.log_chroma_histogram(x, 0.8, 0.1, impl="pallas")),
        small)
    run("ccc histogram (einsum)",
        lambda x: jnp.sum(C.log_chroma_histogram(x, 0.8, 0.1, impl="einsum")),
        small)
    run("ccc response+argmax (xla)",
        lambda h: jnp.sum(C.response_argmax(
            C.ccc_response(h, fr, fi, bs, impl="xla"))), hist)
    run("ccc response+argmax (plls)",
        lambda h: jnp.sum(C.response_argmax(
            C.ccc_response(h, fr, fi, bs, impl="pallas"))), hist)


def section_remap(b_small=16, b_big=64):
    """Remap decomposition via batch-size fetch-marginals (batch-minor)."""
    import jax
    import jax.numpy as jnp

    import __graft_entry__ as ge
    from raw_image_pipeline_tpu.pipeline import make_params
    from raw_image_pipeline_tpu.ops.undistortion import remap_bilinear_u8

    h, w = 1080, 1920
    cfg = ge._full_config((h, w))
    # the pack_only/pack_gather replicas below implement the float-mode
    # 4-slot pack (no margin); precompute in that mode so the indices
    # match (params.remap_base in the default lerp mode carries a +margin
    # offset into a differently laid-out pack)
    from raw_image_pipeline_tpu.ops.undistortion import (
        estimate_new_camera_matrix,
        init_undistort_rectify_map,
        remap_precompute,
    )

    calib = cfg.calibration
    size = (calib.image_width, calib.image_height)
    newK = estimate_new_camera_matrix(
        calib.K(), calib.D(), size, calib.R(),
        cfg.undistortion.balance, size, cfg.undistortion.fov_scale,
    )
    mx, my = init_undistort_rectify_map(calib.K(), calib.D(), calib.R(),
                                        newK, size)
    base_np, weights_np = remap_precompute(mx, my, (h, w), mode="float")
    import jax.numpy as _jnp

    base = jax.device_put(_jnp.asarray(base_np))
    weights = jax.device_put(_jnp.asarray(weights_np))
    imgs = {b: device_noise((h, w, b, 3), b + 2) for b in (b_small, b_big)}
    n = int(base.shape[0])
    n_chunks = max(1, -(-n // 550_000))
    chunk = -(-n // n_chunks)

    def build_pack(x):
        arr = x.reshape(h * w, -1)
        arrp = jnp.pad(arr, ((0, w + 1), (0, 0)))
        packed = jnp.concatenate(
            [arrp[: h * w], arrp[1 : h * w + 1],
             arrp[w : h * w + w], arrp[w + 1 : h * w + w + 1]], axis=1)
        return jax.lax.optimization_barrier(packed)

    def pack_only(x):
        return jnp.sum(build_pack(x)[::997], dtype=jnp.int32)

    def pack_gather(x):
        p = build_pack(x)
        tt = jnp.int32(0)
        for s in range(n_chunks):
            sl = slice(s * chunk, min((s + 1) * chunk, n))
            rows = jnp.take(p, base[sl], axis=0)
            tt = tt + jnp.sum(rows[::499], dtype=jnp.int32)
        return tt

    def full(x):
        y = remap_bilinear_u8(x, base, weights, (h, w), (h, w),
                              batch_minor=True, mode="float")
        return jnp.sum(y[::499], dtype=jnp.int32)

    for name, step in (
        ("remap pack only", pack_only),
        ("remap pack+gather", pack_gather),
        ("remap full", full),
    ):
        jitted = jax.jit(step)
        dt = retry(lambda: batch_marginal(
            lambda x: jitted(x), imgs[b_small], imgs[b_big],
            db=b_big - b_small))
        log(f"  {name:28s} {dt*1e6:8.1f} us/frame")


def section_pointwise(b_small=16, b_big=64):
    """Pointwise stages in batch-minor layout via batch fetch-marginals."""
    import jax
    import jax.numpy as jnp

    import __graft_entry__ as ge
    from raw_image_pipeline_tpu.pipeline import make_params
    from raw_image_pipeline_tpu.ops.color_calibration import color_correct
    from raw_image_pipeline_tpu.ops.color_enhancer import enhance_packed
    from raw_image_pipeline_tpu.ops.gamma import (
        gamma_apply_poly, gamma_poly_coeffs,
    )
    from raw_image_pipeline_tpu.ops.vignetting import correct as vig
    from raw_image_pipeline_tpu.ops.debayer import debayer

    h, w = 1080, 1920
    cfg = ge._full_config((h, w))
    params = make_params(cfg, (h, w))
    imgs = {b: device_noise((h, w, b, 3), b + 3) for b in (b_small, b_big)}
    bayer = {b: device_noise((b, h, w), b + 4) for b in (b_small, b_big)}
    mask = jax.device_put(params.vignetting_mask)[:, :, None]
    cm = jax.device_put(params.color_matrix)
    cb = jax.device_put(params.color_bias)
    gains = jax.device_put(params.enhancer_gains)
    gp = jax.device_put(params.gamma_poly)
    gi = jax.device_put(params.gamma_corr_idx)
    gv = jax.device_put(params.gamma_corr_val)
    root = gamma_poly_coeffs(cfg.gamma_correction.k)[1]

    cases = (
        # row-only strided checksum: fusing the pallas output's NHWC
        # transpose + a 2-axis strided slice + sum faults the TPU worker at
        # EXACTLY bsz=16 (8/32/64 fine; XLA/Mosaic interaction, jax 0.9.0)
        ("debayer (auto/pallas)", bayer,
         lambda x: jnp.sum(debayer(x, "bayer_gbrg8", "bilinear")[:, ::499],
                           dtype=jnp.int32)),
        ("color_calibration", imgs,
         lambda x: jnp.sum(color_correct(x, cm, cb)[::499],
                           dtype=jnp.int32)),
        ("gamma (poly LUT)", imgs,
         lambda x: jnp.sum(gamma_apply_poly(x, gp, gi, gv, root=root)[::499],
                           dtype=jnp.int32)),
        ("vignetting (Lab roundtrip)", imgs,
         lambda x: jnp.sum(vig(x, mask)[::499], dtype=jnp.int32)),
        # batch-minor [H, W, B, 3] images: the frame's W axis is axis 1
        # (w_axis default -2 would treat B as the width and run the wrong
        # SIMD/scalar kernel mix)
        ("color_enhancer (HSV)", imgs,
         lambda x: jnp.sum(enhance_packed(x, gains, w_axis=1)[::499],
                           dtype=jnp.int32)),
    )
    for name, inputs, step in cases:
        jitted = jax.jit(step)
        dt = retry(lambda: batch_marginal(
            lambda x: jitted(x), inputs[b_small], inputs[b_big],
            db=b_big - b_small))
        log(f"  {name:28s} {dt*1e6:8.1f} us/frame")


def section_steady(b=128, h=1080, w=1920):
    """Per-stage STEADY-STATE ablation at the operating batch: K dispatches
    enqueued back-to-back, one fetch (enqueue is async ~0.2 ms, so the gap
    is device time). This is the honest per-stage attribution — any
    batch-differenced marginal cancels batch-independent device work, and
    the remap gather is ~45 ms/dispatch of exactly that (see
    docs/performance.md "Marginal vs steady state"). The kd/min-of-3
    recipe mirrors bench.py tpu_fps's steady-state block — keep the two in
    sync so the bench headline and this attribution measure the same
    thing."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    import __graft_entry__ as ge
    from raw_image_pipeline_tpu.pipeline import build_pipeline

    full = ge._full_config((h, w))
    x = device_noise((b, h, w), 3)

    def steady(cfg):
        pipe = build_pipeline(cfg, "bayer_gbrg8", frame_hw=(h, w))
        pp = jax.device_put(pipe.params)
        step = jax.jit(lambda p, v: jnp.sum(
            pipe.fn(p, v, None)[0]["processed"], dtype=jnp.int32))
        np.asarray(step(pp, x))

        def kd(k):
            t0 = time.perf_counter()
            r = None
            for _ in range(k):
                r = step(pp, x)
            np.asarray(r)
            return time.perf_counter() - t0

        kd(2)
        return min((kd(6) - kd(2)) / 4 for _ in range(3))

    r = dataclasses.replace
    base = steady(full)
    log(f"  full chain: {base*1e3:.1f} ms/dispatch, "
        f"{base/b*1e6:.0f} us/frame at B={b}")
    ablations = (
        ("undistortion", full.replace(
            undistortion=r(full.undistortion, enabled=False))),
        ("white_balance", full.replace(
            white_balance=r(full.white_balance, enabled=False))),
        ("vignetting", full.replace(
            vignetting_correction=r(full.vignetting_correction, enabled=False))),
        ("color_enhancer", full.replace(
            color_enhancer=r(full.color_enhancer, enabled=False))),
        ("gamma", full.replace(
            gamma_correction=r(full.gamma_correction, enabled=False))),
        ("color_calibration", full.replace(
            color_calibration=r(full.color_calibration, enabled=False))),
    )
    # re-measure the BASE around every ablation: even within one process
    # the tunnel worker's load can drift over minutes (round-5 finding —
    # a one-shot base poisoned a whole ablation table), so each stage
    # cost differences against the min of its bracketing base runs
    for name, cfg in ablations:
        t = steady(cfg)
        base2 = steady(full)
        b_loc = min(base, base2)
        log(f"  {name:20s} {(b_loc-t)/b*1e6:8.0f} us/frame (stage cost; "
            f"base drift {abs(base2-base)/b*1e6:.0f} us/frame)")
        base = base2


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
