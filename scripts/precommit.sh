#!/usr/bin/env bash
# Lint + smoke harness — the counterpart of the reference's
# scripts/precommit.sh (clang-format + cmake-format + clang-tidy).
set -euo pipefail
cd "$(dirname "$0")/.."

echo "== compile check =="
python -m compileall -q cpu_path_tracing_tpu tests bench.py __graft_entry__.py

if command -v ruff >/dev/null 2>&1; then
    echo "== ruff =="
    ruff check cpu_path_tracing_tpu tests
fi

echo "== native build =="
make -C native >/dev/null

echo "== fast tests =="
python -m pytest tests/ -q -m "not slow" -x

echo "precommit OK"
