"""Profiling helpers.

The reference ships no tracing (SURVEY.md §5 — a commented-out <chrono>
include is all there is). Here:

  * every ISP stage is wrapped in jax.named_scope (pipeline.py), so XLA/TPU
    traces attribute device time per stage;
  * trace_profile() captures a jax.profiler trace around a callable for
    TensorBoard/Perfetto;
  * stage_timings() gives coarse per-stage wall times by running the
    pipeline repeatedly with the chain truncated after each stage —
    useful where a profiler is unavailable (e.g. over the axon tunnel,
    where async dispatch makes naive timing meaningless; completion is
    forced via a scalar checksum fetch).
"""

from __future__ import annotations

import time
from typing import Callable, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np


def trace_profile(fn: Callable, *args, log_dir: str = "/tmp/rip_tpu_trace"):
    """Run fn(*args) under a jax.profiler trace; returns fn's result."""
    with jax.profiler.trace(log_dir):
        out = fn(*args)
        jax.block_until_ready(out)
    return out


def _timed_checksum(fn, *args, repeats: int = 3) -> float:
    g = jax.jit(
        lambda *a: jax.tree_util.tree_reduce(
            lambda acc, x: acc + jnp.sum(x.astype(jnp.float32)), fn(*a), jnp.float32(0)
        )
    )
    np.asarray(g(*args))  # compile + warm
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        np.asarray(g(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def stage_timings(
    config,
    encoding: str,
    pixels: np.ndarray,
    stages: Optional[List[str]] = None,
    repeats: int = 3,
) -> Dict[str, float]:
    """Cumulative-difference per-stage wall times (seconds) for the chain,
    including the fixed dispatch overhead as key "overhead"."""
    import dataclasses

    from raw_image_pipeline_tpu.pipeline import build_pipeline

    order = [
        "debayer", "flip", "white_balance", "color_calibration",
        "gamma_correction", "vignetting_correction", "color_enhancer",
        "undistortion",
    ]
    stages = stages or order

    px = jax.device_put(pixels)

    # overhead baseline: identity
    overhead = _timed_checksum(lambda x: {"y": x}, px, repeats=repeats)

    results: Dict[str, float] = {"overhead": overhead}
    prev = overhead
    for upto in range(len(order)):
        name = order[upto]
        if name not in stages:
            continue
        # truncate: disable everything after `upto`
        cfg = config
        for later in order[upto + 1:]:
            field = getattr(cfg, later)
            cfg = cfg.replace(**{later: dataclasses.replace(field, enabled=False)})
        pipe = build_pipeline(cfg, encoding, frame_hw=pixels.shape[1:3])
        t = _timed_checksum(
            lambda p, x: pipe.fn(p, x, None)[0]["processed"], pipe.params, px,
            repeats=repeats,
        )
        results[name] = max(t - prev, 0.0)
        prev = t
    return results
