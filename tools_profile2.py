"""Round-2 profile after remap-V3 + hist-matmul: stage timings + remap
pair-gather variant + B=128 scaling."""
import json
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def timed(fn, *args, repeats=3):
    import jax
    import jax.numpy as jnp
    g = jax.jit(lambda *a: jax.tree_util.tree_reduce(
        lambda acc, x: acc + jnp.sum(x.astype(jnp.float32)), fn(*a), jnp.float32(0)))
    np.asarray(g(*args))
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        np.asarray(g(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    import jax
    import jax.numpy as jnp
    import __graft_entry__ as ge
    from raw_image_pipeline_tpu.utils.profiling import stage_timings
    from raw_image_pipeline_tpu.pipeline import build_pipeline, make_params
    from raw_image_pipeline_tpu.ops.undistortion import remap_bilinear_u8
    from raw_image_pipeline_tpu.ops.common import round_u8

    h, w = 1080, 1920
    config = ge._full_config((h, w))
    rng = np.random.default_rng(0)
    np.asarray(jax.jit(lambda x: x + 1)(jnp.ones((8, 128))))
    out = {}

    pix = rng.integers(0, 256, (64, h, w), np.uint8)
    st = stage_timings(config, "bayer_gbrg8", pix, repeats=3)
    log("B=64 stages: " + ", ".join(f"{k}={v*1e3:.1f}ms" for k, v in st.items()))
    out["stages_b64"] = {k: v * 1e3 for k, v in st.items()}

    # full chain at B=128 vs 64 (is bigger batch better per frame?)
    pipe = build_pipeline(config, "bayer_gbrg8", frame_hw=(h, w))
    params = jax.device_put(pipe.params)
    for b in (64, 128):
        px = jax.device_put(rng.integers(0, 256, (b, h, w), np.uint8))
        t = timed(lambda p, x: pipe.fn(p, x, None)[0]["processed"], params, px)
        log(f"full chain B={b}: {t*1e3:.1f}ms  ({t/b*1e3:.3f}ms/frame incl overhead)")
        out[f"chain_b{b}_ms"] = t * 1e3
        del px

    # remap current vs pair-gather variant
    params_np = make_params(config, (h, w))
    base = np.asarray(params_np.remap_base)
    wts = np.asarray(params_np.remap_weights)
    N = base.shape[0]

    for b in (64,):
        img = jax.device_put(rng.integers(0, 256, (b, h, w, 3), np.uint8))
        jb = jnp.asarray(base)
        jw = jnp.asarray(wts)
        t = timed(lambda im: remap_bilinear_u8(im, jb, jw, (1080, 1920)), img)
        log(f"remap V3 B={b}: {t*1e3:.1f}ms ({t/b*1e3:.3f}/frame)")
        out[f"remap_v3_b{b}"] = t * 1e3

        # pair-gather: one index per output-pixel PAIR; pack 6 horizontal
        # shifts x 2 rows = 12 rolls; per-pair the two output pixels' 4 taps
        # each sit within [d, d+3] of the pair base where d = ix - ixpair
        ix = base % w
        iy = base // w
        ix0 = ix[0::2]
        ix1 = ix[1::2]
        ixp = np.minimum(ix0, ix1)
        iyp = iy[0::2]  # adjacent output pixels share iy almost always; handle dy via extra rolls
        dy1 = iy[1::2] - iyp
        pair_base = iyp * w + ixp
        d0 = ix0 - ixp  # 0..small
        d1 = ix1 - ixp
        log(f"  pair deltas: d1 max {d1.max()}, dy1 range {dy1.min()}..{dy1.max()}")
        if d1.max() <= 2 and dy1.min() >= -1 and dy1.max() <= 1:
            # taps needed: rows {0,1} (+dy for odd) cols {d..d+1}; pack cols 0..3, rows -1..2 -> 4x4=16 rolls? too many
            log("  pair variant feasible but wide; skipping build")
        del img

    with open("/tmp/profile2.json", "w") as f:
        json.dump(out, f, indent=1)
    log("wrote /tmp/profile2.json")


if __name__ == "__main__":
    main()
