#!/bin/bash
# Local CI: build native components, run the suite on a virtual 8-CPU mesh,
# smoke the benchmark, and validate the driver entry points.
set -euo pipefail
cd "$(dirname "$0")/.."

echo "== native build =="
make -C native

echo "== test suite (8 virtual CPU devices) =="
python -m pytest tests/ -q

echo "== bench smoke (tiny, CPU) =="
MIT_BENCH_TINY=1 JAX_PLATFORM_NAME=cpu python bench.py

echo "== compositional quality gate (trains + evals; includes the"
echo "   int8_defect negative-control canary — exits nonzero on failure) =="
python scripts/compositional_gate.py /tmp/comp_gate_ci

echo "== graft entry (compile check + multichip dryrun) =="
JAX_PLATFORM_NAME=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
    python __graft_entry__.py

echo "== CI green =="
