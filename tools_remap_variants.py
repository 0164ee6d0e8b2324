"""One-off TPU micro-bench: remap factorizations + CCC histogram variants.
Writes /tmp/remap_variants.json."""
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
    t0 = time.perf_counter()
    np.asarray(g(*args))
    compile_s = time.perf_counter() - t0
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        np.asarray(g(*args))
        best = min(best, time.perf_counter() - t0)
    return best, compile_s


def main():
    import jax
    import jax.numpy as jnp
    import __graft_entry__ as ge
    from raw_image_pipeline_tpu.pipeline import make_params
    from raw_image_pipeline_tpu.ops.undistortion import remap_bilinear_u8
    from raw_image_pipeline_tpu.ops.common import round_u8

    h, w = 1080, 1920
    config = ge._full_config((h, w))
    params = make_params(config, (h, w))
    mx, my = np.asarray(params.map_x), np.asarray(params.map_y)
    ho, wo = mx.shape
    rng = np.random.default_rng(0)
    out = {}

    np.asarray(jax.jit(lambda x: x + 1)(jnp.ones((8, 128))))
    f32 = jnp.float32

    ix = np.floor(mx).astype(np.int32)
    iy = np.floor(my).astype(np.int32)
    fx = (mx - ix).astype(np.float32)
    fy = (my - iy).astype(np.float32)

    # host-precomputed per-tap masked weights (BORDER_CONSTANT without pad)
    vx0 = (ix >= 0) & (ix <= w - 1)
    vx1 = (ix + 1 >= 0) & (ix + 1 <= w - 1)
    vy0 = (iy >= 0) & (iy <= h - 1)
    vy1 = (iy + 1 >= 0) & (iy + 1 <= h - 1)
    w00 = ((1 - fx) * (1 - fy) * vx0 * vy0).reshape(-1, 1).astype(np.float32)
    w01 = (fx * (1 - fy) * vx1 * vy0).reshape(-1, 1).astype(np.float32)
    w10 = ((1 - fx) * fy * vx0 * vy1).reshape(-1, 1).astype(np.float32)
    w11 = (fx * fy * vx1 * vy1).reshape(-1, 1).astype(np.float32)
    base_np = (np.clip(iy, 0, h - 1) * w + np.clip(ix, 0, w - 1)).reshape(-1).astype(np.int32)
    base = jnp.asarray(base_np)
    W4 = [jnp.asarray(x) for x in (w00, w01, w10, w11)]

    for b in (32, 64):
        img = jax.device_put(rng.integers(0, 256, (b, h, w, 3), np.uint8))

        t, c = timed(lambda im: remap_bilinear_u8(im, params.map_x, params.map_y), img)
        log(f"B={b} V0 current: {t*1e3:.1f}ms ({t/b*1e3:.3f}/frame) compile {c:.0f}s")
        out[f"b{b}_v0_current"] = t * 1e3

        # V3: K-layout in/out (transposes EXCLUDED), no pad, masked taps
        imgK = jax.device_put(
            np.moveaxis(np.asarray(img), 0, 2).reshape(h * w, b * 3).copy())

        def v3(arrK):
            packed = jnp.concatenate(
                [arrK, jnp.roll(arrK, -1, axis=0),
                 jnp.roll(arrK, -w, axis=0), jnp.roll(arrK, -(w + 1), axis=0)],
                axis=1)
            rows = jnp.take(packed, base, axis=0)
            k = arrK.shape[1]
            acc = (rows[:, 0:k].astype(f32) * W4[0]
                   + rows[:, k:2*k].astype(f32) * W4[1]
                   + rows[:, 2*k:3*k].astype(f32) * W4[2]
                   + rows[:, 3*k:4*k].astype(f32) * W4[3])
            return round_u8(acc)

        t, c = timed(v3, imgK)
        log(f"B={b} V3 K-layout core: {t*1e3:.1f}ms ({t/b*1e3:.3f}/frame) compile {c:.0f}s")
        out[f"b{b}_v3_core"] = t * 1e3

        # V3t: with both transposes included (NHWC in/out)
        def v3t(im):
            arrK = jnp.moveaxis(im.reshape(b, h * w, 3), 0, 1).reshape(h * w, b * 3)
            o = v3(arrK)
            return jnp.moveaxis(o.reshape(ho * wo, b, 3), 1, 0).reshape(b, ho, wo, 3)

        t, c = timed(v3t, img)
        log(f"B={b} V3t +transposes: {t*1e3:.1f}ms ({t/b*1e3:.3f}/frame) compile {c:.0f}s")
        out[f"b{b}_v3_transposes"] = t * 1e3

        # V7: NHWC batched take along axis=1 (no transposes at all)
        def v7(im):
            arr = im.reshape(b, h * w, 3)
            packed = jnp.concatenate(
                [arr, jnp.roll(arr, -1, axis=1),
                 jnp.roll(arr, -w, axis=1), jnp.roll(arr, -(w + 1), axis=1)],
                axis=2)  # [b, hw, 12]
            rows = jnp.take(packed, base, axis=1)  # [b, N, 12]
            acc = (rows[..., 0:3].astype(f32) * W4[0]
                   + rows[..., 3:6].astype(f32) * W4[1]
                   + rows[..., 6:9].astype(f32) * W4[2]
                   + rows[..., 9:12].astype(f32) * W4[3])
            return round_u8(acc).reshape(b, ho, wo, 3)

        t, c = timed(v7, img)
        log(f"B={b} V7 batched-take: {t*1e3:.1f}ms ({t/b*1e3:.3f}/frame) compile {c:.0f}s")
        out[f"b{b}_v7_batched_take"] = t * 1e3

        # V8: pure gather floor (no pack): single take of [hw, K] at base
        def v8(arrK):
            return jnp.take(arrK, base, axis=0)

        t, c = timed(v8, imgK)
        log(f"B={b} V8 bare gather: {t*1e3:.1f}ms ({t/b*1e3:.3f}/frame)")
        out[f"b{b}_v8_bare_gather"] = t * 1e3

        del img, imgK

    # CCC histogram variants at the 360x270 working size
    from raw_image_pipeline_tpu.ops.ccc import log_chroma_histogram, HIST_N
    for b in (32, 64):
        small = jax.device_put(rng.integers(0, 256, (b, 270, 360, 3), np.uint8))
        t, c = timed(lambda s: log_chroma_histogram(s), small)
        log(f"B={b} hist scatter: {t*1e3:.1f}ms ({t/b*1e3:.3f}/frame)")
        out[f"b{b}_hist_scatter"] = t * 1e3

        def hist_mm(s):
            f = s.astype(f32)
            gray = f[..., 2] * f32(0.299) + f[..., 1] * f32(0.587) + f[..., 0] * f32(0.114)
            include = (gray <= 255.0 * 0.9) & (gray > 255.0 * 0.1)
            logs = jnp.log(f)
            lb, lg, lr = logs[..., 0], logs[..., 1], logs[..., 2]
            finite = jnp.isfinite(lr) & jnp.isfinite(lg) & jnp.isfinite(lb)
            valid = include & finite
            uu = jnp.nan_to_num(jnp.floor((lg - lr + 1.421875) * 64 + 0.5))
            vv = jnp.nan_to_num(jnp.floor((lg - lb + 1.421875) * 64 + 0.5))
            uu = jnp.clip(uu, 0, 255).astype(jnp.int32).reshape(b, -1)
            vv = jnp.clip(vv, 0, 255).astype(jnp.int32).reshape(b, -1)
            iota = jnp.arange(HIST_N, dtype=jnp.int32)
            ou = (uu[..., None] == iota).astype(f32)  # [b, P, 256]
            ov = (vv[..., None] == iota).astype(f32)
            ov = ov * valid.reshape(b, -1, 1).astype(f32)
            hist = jnp.einsum("bpu,bpv->buv", ou, ov,
                              preferred_element_type=f32) * f32(1.0 / (270 * 360))
            return hist

        t, c = timed(hist_mm, small)
        log(f"B={b} hist matmul: {t*1e3:.1f}ms ({t/b*1e3:.3f}/frame) compile {c:.0f}s")
        out[f"b{b}_hist_matmul"] = t * 1e3
        del small

    with open("/tmp/remap_variants.json", "w") as f:
        json.dump(out, f, indent=1)
    log("wrote /tmp/remap_variants.json")


if __name__ == "__main__":
    main()
