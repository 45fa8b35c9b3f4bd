#!/usr/bin/env bash
# CI entry point: CPU-mesh test suite + wheel build/install/CLI smoke.
# Run from the repo root; writes a summary line per stage and exits
# non-zero on any failure. Used by .github/workflows/ci.yml and runnable
# locally: bash scripts/ci.sh
set -euo pipefail
cd "$(dirname "$0")/.."

echo "== stage 1: test suite (CPU, 8-device virtual mesh) =="
JAX_PLATFORMS=cpu python -m pytest tests/ -q --tb=short

echo "== stage 2: multichip dryrun (8 virtual devices) =="
JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
  python -c "import __graft_entry__ as g; g.dryrun_multichip(8); print('dryrun ok')"

echo "== stage 3: wheel build + clean-venv install + CLI smoke =="
bash scripts/wheel_smoke.sh

echo "CI GREEN"
