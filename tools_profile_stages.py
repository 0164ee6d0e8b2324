"""One-off: per-stage timings of the full chain on the real TPU at several
batch sizes, plus remap micro-variants. Writes /tmp/stage_profile.json."""
import json
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    import __graft_entry__ as ge
    from raw_image_pipeline_tpu.utils.profiling import stage_timings, _timed_checksum

    h, w = 1080, 1920
    config = ge._full_config((h, w))
    rng = np.random.default_rng(0)

    # poll until the compile helper is healthy
    t0 = time.perf_counter()
    np.asarray(jax.jit(lambda x: x + 1)(jnp.ones((8, 128))))
    log(f"helper warm: {time.perf_counter()-t0:.1f}s")

    out = {}
    for b in (8, 16, 32, 64):
        pix = rng.integers(0, 256, (b, h, w), np.uint8)
        t0 = time.perf_counter()
        st = stage_timings(config, "bayer_gbrg8", pix, repeats=3)
        log(f"B={b} ({time.perf_counter()-t0:.0f}s): " +
            ", ".join(f"{k}={v*1e3:.1f}ms" for k, v in st.items()))
        out[f"stages_b{b}"] = {k: v * 1e3 for k, v in st.items()}

    # remap-only micro: current implementation at several batch sizes
    from raw_image_pipeline_tpu.pipeline import build_pipeline, make_params
    from raw_image_pipeline_tpu.ops.undistortion import remap_bilinear_u8
    params = make_params(config, (h, w))
    mx, my = params.map_x, params.map_y
    for b in (8, 32, 64):
        img = jax.device_put(rng.integers(0, 256, (b, h, w, 3), np.uint8))
        t = _timed_checksum(lambda im: remap_bilinear_u8(im, mx, my), img, repeats=3)
        log(f"remap-only B={b}: {t*1e3:.1f}ms total, {t/b*1e3:.3f}ms/frame (incl ~30ms overhead)")
        out[f"remap_b{b}_ms"] = t * 1e3

    # overhead measure
    img = jax.device_put(rng.integers(0, 256, (8, 128), np.uint8))
    t = _timed_checksum(lambda x: x.astype(jnp.int32) * 2, img, repeats=5)
    out["overhead_ms"] = t * 1e3
    log(f"tiny-op overhead: {t*1e3:.1f}ms")

    with open("/tmp/stage_profile.json", "w") as f:
        json.dump(out, f, indent=1)
    log("wrote /tmp/stage_profile.json")


if __name__ == "__main__":
    main()
