"""Benchmark: frames/sec/chip for the full 9-stage ISP chain on 1080p Bayer
frames (BASELINE.json primary metric), vs the opencv-python CPU composition
of the same chain (the reference's backend).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "frames/s", "vs_baseline": R}
plus details on stderr.
"""

import json
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def tpu_fps(h=1080, w=1920, b_small=4, b_big=32):
    """Measure steady-state device throughput.

    On the axon platform block_until_ready() returns before execution
    finishes, so each timing dispatches one jitted pipeline call that
    reduces its output to a scalar checksum in-graph, and waits for the
    checksum via a device->host fetch (a genuine sync). The fetch + RPC
    overhead (~30 ms) is constant, so timing two batch sizes and taking the
    difference yields the per-frame compute time.
    """
    import jax
    import jax.numpy as jnp

    import __graft_entry__ as ge
    from raw_image_pipeline_tpu.pipeline import build_pipeline

    config = ge._full_config((h, w))
    pipe = build_pipeline(config, "bayer_gbrg8", frame_hw=(h, w))

    rng = np.random.default_rng(0)
    params = jax.device_put(pipe.params)
    pix = {
        b: jax.device_put(rng.integers(0, 256, (b, h, w), np.uint8))
        for b in (b_small, b_big)
    }

    # params as explicit jit args (closure device-constants are fetched to
    # host at lowering, unsupported for complex64 on axon)
    @jax.jit
    def step(p, px):
        out, _s = pipe.fn(p, px, None)
        return jnp.sum(out["processed"], dtype=jnp.int32)

    def run(b):
        t0 = time.perf_counter()
        out = step(params, pix[b])
        _ = np.asarray(out)  # force completion through the tunnel
        return time.perf_counter() - t0

    t0 = time.perf_counter()
    run(b_small)
    log(f"tpu compile+first: {time.perf_counter()-t0:.1f}s on {jax.devices()[0]}")
    run(b_big)  # warm/compile the big batch too

    t_small = min(run(b_small) for _ in range(5))
    t_big = min(run(b_big) for _ in range(5))
    dt_frame = (t_big - t_small) / (b_big - b_small)
    fps = 1.0 / dt_frame
    lat_ms = dt_frame * 1000
    log(f"tpu: {fps:.1f} frames/s ({lat_ms:.3f} ms/frame compute; "
        f"t{b_small}={t_small*1000:.1f}ms t{b_big}={t_big*1000:.1f}ms)")
    return fps, lat_ms


def cpu_fps(iters=6, h=1080, w=1920):
    """Reference chain composed from cv2 primitives (the reference's CPU
    backend calls), one frame at a time like the reference node."""
    import cv2

    from raw_image_pipeline_tpu.config import DEFAULT_CCC_MODEL_PATH
    from raw_image_pipeline_tpu.models.ccc_model import load_ccc_model
    from raw_image_pipeline_tpu.ops.gamma import build_gamma_lut
    from raw_image_pipeline_tpu.ops.undistortion import (
        estimate_new_camera_matrix,
        init_undistort_rectify_map,
    )
    from raw_image_pipeline_tpu.ops.vignetting import build_vignetting_mask
    import __graft_entry__ as ge

    model = load_ccc_model(DEFAULT_CCC_MODEL_PATH)
    filt_fft = cv2.dft(model.filt, flags=0, nonzeroRows=256)
    bias_fft = cv2.dft(model.bias, flags=0, nonzeroRows=256)

    cfgobj = ge._full_config((h, w))
    calib = cfgobj.calibration
    size = (w, h)
    newK = estimate_new_camera_matrix(calib.K(), calib.D(), size, calib.R(), 0.0, size, 1.0)
    mx, my = init_undistort_rectify_map(calib.K(), calib.D(), calib.R(), newK, size)
    lut = build_gamma_lut(0.9)
    vmask = build_vignetting_mask(h, w, 1.5, 1e-3, 1e-6)
    M = calib  # noqa
    cmat = cfgobj.color_calibration.matrix_np().astype(np.float32)
    cbias = cfgobj.color_calibration.bias_np().astype(np.float32)

    rng = np.random.default_rng(0)
    bayer = rng.integers(0, 256, (h, w), np.uint8)

    def one_frame(bayer):
        img = cv2.demosaicing(bayer, cv2.COLOR_BayerGB2BGR)
        img = cv2.cvtColor(img, cv2.COLOR_RGB2BGR)
        img = cv2.flip(img, -1)
        # ccc white balance
        small = cv2.resize(img, (360, 270))
        f = small.astype(np.float32)
        gray = cv2.cvtColor(f, cv2.COLOR_BGR2GRAY)
        include = (gray <= 255.0 * 0.8) & (gray > 255.0 * 0.2)
        with np.errstate(divide="ignore"):
            logs = np.log(f)
        finite = np.isfinite(logs).all(-1)
        valid = include & finite
        u = np.clip(np.nan_to_num(np.round((logs[..., 1] - logs[..., 2] + 1.421875) * 64)), 0, 255).astype(np.int64)
        v = np.clip(np.nan_to_num(np.round((logs[..., 1] - logs[..., 0] + 1.421875) * 64)), 0, 255).astype(np.int64)
        hist = np.zeros((256, 256), np.float32)
        np.add.at(hist, (u[valid], v[valid]), np.float32(1.0 / (270 * 360)))
        hist_fft = cv2.dft(hist, flags=0, nonzeroRows=256)
        resp_fft = cv2.mulSpectrums(filt_fft, hist_fft, flags=0)
        resp_fft = cv2.add(resp_fft, bias_fft)
        resp = cv2.dft(resp_fft, flags=cv2.DFT_INVERSE | cv2.DFT_REAL_OUTPUT, nonzeroRows=256)
        _, _, _, (x, y) = cv2.minMaxLoc(resp)
        Lu, Lv = x / 64.0 - 1.421875, y / 64.0 - 1.421875
        gr, gg, gb = np.exp(Lu), 1.0, np.exp(Lv)
        fac = min(gr, gg, gb)
        img = cv2.multiply(img, (gb / fac, gg / fac, gr / fac, 0))
        # color calibration
        flat = img.reshape(-1, 3).astype(np.float32)
        img = np.clip(np.rint(flat @ cmat.T + cbias), 0, 255).astype(np.uint8).reshape(img.shape)
        # gamma
        img = cv2.LUT(img, lut)
        # vignetting
        lab = cv2.cvtColor(img, cv2.COLOR_BGR2Lab)
        L = lab[..., 0].astype(np.float32) * vmask
        lab[..., 0] = np.clip(np.rint(L), 0, 255).astype(np.uint8)
        img = cv2.cvtColor(lab, cv2.COLOR_Lab2BGR)
        # color enhancer
        hsv = cv2.cvtColor(img, cv2.COLOR_BGR2HSV)
        hsv = cv2.multiply(hsv, (1.0, 1.2, 1.0, 0))
        img = cv2.cvtColor(hsv, cv2.COLOR_HSV2BGR)
        # undistortion
        return cv2.remap(img, mx, my, cv2.INTER_LINEAR,
                         borderMode=cv2.BORDER_CONSTANT, borderValue=0)

    one_frame(bayer)  # warmup
    t0 = time.perf_counter()
    for _ in range(iters):
        one_frame(bayer)
    dt = time.perf_counter() - t0
    fps = iters / dt
    log(f"cpu reference composition: {fps:.2f} frames/s ({dt/iters*1000:.1f} ms/frame)")
    return fps


def tpu_scaling(h=1080, w=1920, per_dev_batch=16):
    """Data-parallel scaling efficiency when >1 device is attached (the
    BASELINE >=80% multi-host target); no-op on single-chip hosts."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    import __graft_entry__ as ge
    from raw_image_pipeline_tpu.parallel.mesh import make_mesh
    from raw_image_pipeline_tpu.pipeline import build_pipeline

    devs = jax.devices()
    if len(devs) < 2:
        return None
    config = ge._full_config((h, w))
    pipe = build_pipeline(config, "bayer_gbrg8", frame_hw=(h, w))
    rng = np.random.default_rng(0)

    def run_on(devices):
        mesh = make_mesh(devices)
        n = len(devices)
        batch = per_dev_batch * n
        shard = NamedSharding(mesh, P("data", None, None))
        px = jax.device_put(
            rng.integers(0, 256, (batch, h, w), np.uint8), shard
        )
        params = jax.device_put(pipe.params)
        step = jax.jit(
            lambda p, x: jnp.sum(pipe.fn(p, x, None)[0]["processed"],
                                 dtype=jnp.int32)
        )
        np.asarray(step(params, px))
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            np.asarray(step(params, px))
            ts.append(time.perf_counter() - t0)
        return batch / min(ts)

    f1 = run_on(devs[:1])
    fn = run_on(devs)
    eff = fn / (f1 * len(devs))
    log(f"scaling: 1 dev {f1:.1f} fps, {len(devs)} devs {fn:.1f} fps, "
        f"efficiency {eff:.2%}")
    return eff


def main():
    cpu = cpu_fps()
    # the axon compile helper occasionally restarts; one retry covers it
    for attempt in range(2):
        try:
            tpu, lat_ms = tpu_fps()
            break
        except Exception as e:
            log(f"tpu attempt {attempt} failed: {e}")
            if attempt == 1:
                raise
            time.sleep(30)
    try:
        tpu_scaling()
    except Exception as e:
        log(f"scaling measurement skipped: {e}")
    print(json.dumps({
        "metric": "frames_per_sec_per_chip_1080p_full_isp",
        "value": round(tpu, 2),
        "unit": "frames/s",
        "vs_baseline": round(tpu / cpu, 2),
    }))


if __name__ == "__main__":
    main()
