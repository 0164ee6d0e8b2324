"""Tool: validate TPU-backend numerics against CPU-backend golden outputs
for the exact colorspaces and the full chain. The CorrectedTable corrections
derive per-backend, so the TPU needs its own check."""
import os
import sys
import time

sys.path.insert(0, os.getcwd())

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    assert jax.default_backend() != "cpu", jax.default_backend()
    np.asarray(jax.jit(lambda x: x + 1)(jnp.ones((8, 128))))
    log("helper warm")

    from raw_image_pipeline_tpu.ops import colorspace as cs

    rng = np.random.default_rng(0)

    # exhaustive Lab inverse on TPU: all 2^24 in 8 slabs, diff counted on device
    import cv2
    bad = 0
    aa, bb = np.meshgrid(np.arange(256, dtype=np.uint8), np.arange(256, dtype=np.uint8), indexing="ij")
    t0 = time.perf_counter()
    for l0 in range(0, 256, 64):
        Ls = np.arange(l0, l0 + 64, dtype=np.uint8)
        lab = np.stack([
            np.broadcast_to(Ls[:, None, None], (64, 256, 256)),
            np.broadcast_to(aa, (64, 256, 256)),
            np.broadcast_to(bb, (64, 256, 256))], -1).reshape(64, -1, 3)
        ref = cv2.cvtColor(lab, cv2.COLOR_Lab2BGR)
        d = jax.jit(lambda x, r: jnp.sum((cs.lab_to_bgr_u8(x) != r).astype(jnp.int32)))(lab, ref)
        bad += int(np.asarray(d))
    log(f"TPU lab_to_bgr exhaustive: {bad} mismatches ({time.perf_counter()-t0:.0f}s)")

    bad = 0
    for h0 in range(0, 256, 64):
        Hs = np.arange(h0, h0 + 64, dtype=np.uint8)
        hsv = np.stack([
            np.broadcast_to(Hs[:, None, None], (64, 256, 256)),
            np.broadcast_to(aa, (64, 256, 256)),
            np.broadcast_to(bb, (64, 256, 256))], -1).reshape(64, -1, 3)
        ref = cv2.cvtColor(hsv, cv2.COLOR_HSV2BGR)
        d = jax.jit(lambda x, r: jnp.sum((cs.hsv_to_bgr_u8(x) != r).astype(jnp.int32)))(hsv, ref)
        bad += int(np.asarray(d))
    log(f"TPU hsv_to_bgr exhaustive: {bad} mismatches")

    # forward Lab (the vignetting entry conversion; its sRGB table is
    # poly-served since round 2 — the corrections pin every table entry,
    # this re-certifies the whole composition)
    bad = 0
    for b0 in range(0, 256, 64):
        Bs = np.arange(b0, b0 + 64, dtype=np.uint8)
        bgr = np.stack([
            np.broadcast_to(Bs[:, None, None], (64, 256, 256)),
            np.broadcast_to(aa, (64, 256, 256)),
            np.broadcast_to(bb, (64, 256, 256))], -1).reshape(64, -1, 3)
        ref = cv2.cvtColor(bgr, cv2.COLOR_BGR2Lab)
        d = jax.jit(lambda x, r: jnp.sum((cs.bgr_to_lab_u8(x) != r).astype(jnp.int32)))(bgr, ref)
        bad += int(np.asarray(d))
    log(f"TPU bgr_to_lab exhaustive: {bad} mismatches")

    # statistical WB on TPU vs committed oracle goldens
    from raw_image_pipeline_tpu.ops.white_balance import (
        balance_white_grey_world, balance_white_simple, balance_white_learned,
    )
    img = cv2.imread("tests/fixtures/alphasense.png")
    for name, fn, gold in [
        ("grey_world", lambda im: balance_white_grey_world(im, 0.8),
         "tests/fixtures/wb_oracle/alphasense_grey_0.8.png"),
        ("simple", lambda im: balance_white_simple(im, 20.0),
         "tests/fixtures/wb_oracle/alphasense_simple_20.0.png"),
        ("learned", lambda im: balance_white_learned(im, 0.8),
         "tests/fixtures/wb_oracle/alphasense_learned_0.8.png"),
    ]:
        ref = cv2.imread(gold)
        got = np.asarray(fn(img[None]))[0]
        d = int(np.abs(got.astype(np.int64) - ref.astype(np.int64)).max())
        log(f"TPU {name} WB vs oracle golden: max diff {d}")

    import __graft_entry__ as ge
    from raw_image_pipeline_tpu.pipeline import build_pipeline
    h, w = 540, 720
    img = cv2.imread("tests/fixtures/alphasense.png")
    ch = {"g": 1, "b": 0, "r": 2}
    bay = np.zeros((h, w), np.uint8)
    for i in range(2):
        for j in range(2):
            bay[i::2, j::2] = img[i::2, j::2, ch["grbg"[i * 2 + j]]]
    config = ge._full_config((h, w))
    pipe = build_pipeline(config, "bayer_gbrg8", frame_hw=(h, w))
    out, _ = pipe(np.stack([bay] * 4), None)
    got = np.asarray(out["processed"])
    np.save("/tmp/tpu_chain_out.npy", got)
    log(f"TPU full-chain output: shape {got.shape} checksum {int(got.astype(np.int64).sum())}")
    print("OK")


if __name__ == "__main__":
    main()
