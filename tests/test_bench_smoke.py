"""bench.py's measurement harness must run end-to-end on any backend —
the driver records its JSON on the real chip, and an import/trace break
there loses the round's perf artifact (round-5 lesson: a tunnel outage
masked whether bench-at-HEAD even ran; this pins the code path)."""

import json
import subprocess
import sys


def test_tpu_fps_code_path_on_cpu():
    code = """
import jax; jax.config.update("jax_platforms", "cpu")
import sys; sys.argv = ["bench.py"]
import bench
h = bench.tpu_fps(h=108, w=144, batches=(1, 2, 4), tag="ci smoke")
required = {"marginal_fps", "best_pair_fps", "steady_fps", "steady_batch",
            "steady_fps_enqueue_corrected", "null_dispatch_ms",
            "hbm_stream_gbps"}
missing = required - set(h)
assert not missing, f"missing keys: {missing}"
assert h["marginal_fps"] > 0 and h["steady_fps"] > 0
assert h["hbm_stream_gbps"] >= 0.0 and h["null_dispatch_ms"] >= 0.0
import json as j
print("BENCH_SMOKE_OK", j.dumps(sorted(h)))
"""
    out = subprocess.run([sys.executable, "-c", code], capture_output=True,
                         text=True, timeout=600, cwd=".")
    assert out.returncode == 0, out.stderr[-2000:]
    assert "BENCH_SMOKE_OK" in out.stdout
