#!/usr/bin/env bash
# One-command on-device QA gate (VERDICT r3 #6): refresh every TPU artifact
# in a single run so a round can never commit stale ones.
#
#   1. scripts/tpu_smoke.py     -> TPU_SMOKE.md  (3-integrator parity gate,
#                                  resumable via --state across tunnel drops)
#   2. cli bench --suite        -> BENCH_SUITE.md (production-shape suite)
#   3. python bench.py          -> stdout JSON    (headline number)
#
# Requires the real chip (no JAX_PLATFORMS override).  Exit code 0 only if
# every stage is green.
set -euo pipefail
cd "$(dirname "$0")/.."

echo "== 1/3 tpu_smoke (parity) =="
python scripts/tpu_smoke.py --state /tmp/tpu_gate_smoke_state.json

echo "== 2/3 bench --suite =="
python -m cpu_path_tracing_tpu.cli bench --suite --suite-out BENCH_SUITE.md

echo "== 3/3 headline bench =="
python bench.py

echo "tpu_gate OK — TPU_SMOKE.md + BENCH_SUITE.md refreshed"
