"""2-process jax.distributed smoke test on the CPU backend.

Keeps the multi-host path honest without pod hardware: two OS processes
initialize a coordinator, form a global device mesh (2 procs x 2 local CPU
devices), distribute per-process frame batches into one global array, and
run a jitted reduction over it (GSPMD inserts the cross-process collective).
"""

import os
import socket
import subprocess
import sys

import numpy as np

WORKER = r"""
import os, sys
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.getcwd())
from raw_image_pipeline_tpu.parallel.multihost import (
    initialize_multihost, global_data_mesh, distribute_batch,
)

addr, pid = sys.argv[1], int(sys.argv[2])
initialize_multihost(addr, 2, pid)
assert jax.process_count() == 2, jax.process_count()
assert jax.local_device_count() == 2
assert jax.device_count() == 4, jax.device_count()

mesh = global_data_mesh()
local = np.full((2, 8, 16), 1 + pid, np.int32)  # 2 frames per process
g = distribute_batch(local, mesh)
assert g.shape == (4, 8, 16), g.shape

total = jax.jit(lambda x: jnp.sum(x))(g)
# global sum = (2 frames * 1 + 2 frames * 2) * 8 * 16
expected = (2 * 1 + 2 * 2) * 8 * 16
got = int(jax.device_get(total))
assert got == expected, (got, expected)
print(f"proc {pid} OK", flush=True)
"""


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_distributed_smoke():
    addr = f"127.0.0.1:{_free_port()}"
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", WORKER, addr, str(i)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, env=env,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=180)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise AssertionError("distributed smoke timed out")
        outs.append((p.returncode, out.decode(), err.decode()))
    for rc, out, err in outs:
        assert rc == 0, f"worker failed rc={rc}\nstdout:{out}\nstderr:{err[-2000:]}"
        assert "OK" in out
