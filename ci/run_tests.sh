#!/usr/bin/env bash
# CI entry point (role of the reference's jenkins-pipeline, which only
# compiled the code — we also run the parity suite and build native code).
set -euo pipefail
cd "$(dirname "$0")/.."

echo "== native build =="
make -C native

echo "== test suite (CPU, 8 virtual devices) =="
python -m pytest tests/ -q

echo "== graft entry compile check (CPU) =="
python - << 'EOF'
import os
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
import jax
jax.config.update("jax_platforms", "cpu")
import __graft_entry__ as ge
fn, args = ge.entry()
out = fn(*args)
print("entry:", out.shape, out.dtype)
ge.dryrun_multichip(8)
print("dryrun_multichip(8): ok")
EOF
echo "CI OK"
