"""2-process CPU smoke of the EXACT pod scaling bench script
(tools/pod_bench.py) — so the one command meant for a real N-host slice
is exercised end-to-end every CI run (VERDICT r04 next #4)."""

import json
import os
import socket
import subprocess
import sys


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_pod_bench_two_process_cpu_smoke():
    addr = f"127.0.0.1:{_free_port()}"
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    procs = [
        subprocess.Popen(
            [
                sys.executable, "-m",
                "raw_image_pipeline_tpu.tools.pod_bench",
                "--coordinator", addr, "--num-processes", "2",
                "--process-id", str(i), "--cpu", "--local-devices", "2",
                "--height", "64", "--width", "48",
                "--batch-per-device", "1", "--k-dispatch", "3",
                "--rounds", "1",
            ],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, env=env,
            cwd=root,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise AssertionError("pod_bench smoke timed out")
        outs.append((p.returncode, out.decode(), err.decode()))
    for rc, out, err in outs:
        assert rc == 0, f"pod_bench failed rc={rc}\nstdout:{out}\nstderr:{err[-2000:]}"
    # process 0 prints the one JSON result line
    line = outs[0][1].strip().splitlines()[-1]
    result = json.loads(line)
    assert result["metric"] == "pod_scaling_full_isp"
    assert result["processes"] == 2
    assert result["devices"] == 4
    assert result["global_fps"] > 0
    assert 0 < result["scaling_efficiency"]
    # only process 0 emits the result line (Gloo chatter aside)
    assert "pod_scaling_full_isp" not in outs[1][1]
