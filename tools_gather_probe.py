"""Probe: lax.gather with 2-D slices for the remap (no packed copy).
Times (a) current V3, (b) per-pixel (2,2,K)-slice gather, (c) per-pair
(3,4,K)-slice gather on the real TPU at B=64."""
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def timed(fn, *args, repeats=3):
    import jax
    import jax.numpy as jnp
    g = jax.jit(lambda *a: jnp.sum(fn(*a).astype(jnp.int32)))
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
    from jax import lax
    import __graft_entry__ as ge
    from raw_image_pipeline_tpu.pipeline import make_params
    from raw_image_pipeline_tpu.ops.undistortion import remap_bilinear_u8
    from raw_image_pipeline_tpu.ops.common import round_u8

    h, w = 1080, 1920
    b = 64
    config = ge._full_config((h, w))
    p = make_params(config, (h, w))
    base = np.asarray(p.remap_base)
    wts = np.asarray(p.remap_weights)  # [4, N]
    N = base.shape[0]
    by = (base // w).astype(np.int32)
    bx = (base % w).astype(np.int32)

    rng = np.random.default_rng(0)
    np.asarray(jax.jit(lambda x: x + 1)(jnp.ones((8, 128))))
    img = jax.device_put(rng.integers(0, 256, (b, h, w, 3), np.uint8))

    t = timed(lambda im: remap_bilinear_u8(im, jnp.asarray(base), jnp.asarray(wts), (h, w)), img)
    log(f"V3 current: {t*1e3:.1f}ms")

    # (b) per-pixel (2,2) slice gather from [h, w, K]
    start = jnp.asarray(np.stack([by, bx], 1))  # [N, 2]
    W4 = jnp.asarray(wts)

    def v_slice(im):
        arr = jnp.moveaxis(im.reshape(b, h * w, 3), 0, 1).reshape(h, w, b * 3)
        k = arr.shape[-1]
        dn = lax.GatherDimensionNumbers(
            offset_dims=(1, 2, 3), collapsed_slice_dims=(),
            start_index_map=(0, 1))
        rows = lax.gather(arr, start, dn, slice_sizes=(2, 2, k),
                          mode=lax.GatherScatterMode.CLIP)
        f32 = jnp.float32
        acc = (rows[:, 0, 0].astype(f32) * W4[0][:, None]
               + rows[:, 0, 1].astype(f32) * W4[1][:, None]
               + rows[:, 1, 0].astype(f32) * W4[2][:, None]
               + rows[:, 1, 1].astype(f32) * W4[3][:, None])
        out = round_u8(acc)
        return jnp.moveaxis(out.reshape(h * w, b, 3), 1, 0).reshape(b, h, w, 3)

    t = timed(v_slice, img)
    log(f"slice (2,2,K) per-pixel: {t*1e3:.1f}ms")


if __name__ == "__main__":
    main()
