#!/usr/bin/env bash
# Wheel build + clean-venv install smoke test (round-2 verdict #8; the
# reference's packaging equivalent is debian/control producing an
# installable artifact).
#
# Builds the wheel from pyproject.toml, installs it into a FRESH venv
# (--system-site-packages so jax/numpy resolve locally — this image has
# zero network egress; the wheel itself installs with --no-deps
# --no-index), and runs a minimal topology + the CLI catalog from a
# neutral working directory so only the installed wheel provides the
# package.
#
# Usage: bash scripts/wheel_smoke.sh [artifact_out.json]
set -euo pipefail
REPO="$(cd "$(dirname "$0")/.." && pwd)"
WORK="$(mktemp -d)"
trap 'rm -rf "$WORK"' EXIT

echo "== building wheel =="
cd "$REPO"
python -m pip wheel . --no-deps --no-build-isolation -w "$WORK/dist" -q
WHEEL="$(ls "$WORK"/dist/pothoscomms_tpu-*.whl)"
echo "built: $WHEEL"

echo "== creating fresh venv =="
python -m venv "$WORK/venv"
# the build image has zero network egress, so dependencies (jax, numpy)
# come from the invoking environment via a .pth link; the wheel itself
# installs offline with --no-deps --no-index
BASESITE=$(python -c "import sysconfig; print(sysconfig.get_paths()['purelib'])")
VENVSITE=$("$WORK/venv/bin/python" - <<'EOF'
import sysconfig
print(sysconfig.get_paths()['purelib'])
EOF
)
echo "$BASESITE" > "$VENVSITE/base-deps.pth"
"$WORK/venv/bin/pip" install --no-deps --no-index -q "$WHEEL"

echo "== smoke: minimal topology from installed wheel =="
cd "$WORK"
JAX_PLATFORMS=cpu "$WORK/venv/bin/python" - <<'EOF'
import sys
assert not any("repo" in p for p in sys.path if p), sys.path[:3]
import pothoscomms_tpu
assert "venv" in pothoscomms_tpu.__file__, pothoscomms_tpu.__file__
import numpy as np
from pothoscomms_tpu import BlockRegistry, Topology
from pothoscomms_tpu.core.fixtures import FeederSource, CollectorSink

feed = FeederSource("float32")
feed.feed_buffer(np.arange(1000, dtype=np.float32))
blk = BlockRegistry.make("/comms/scale", "float32")
blk.set_factor(2.5)
sink = CollectorSink("float32")
topo = Topology()
topo.connect(feed, 0, blk, 0)
topo.connect(blk, 0, sink, 0)
topo.commit()
assert topo.wait_inactive()
out = sink.get_buffer()
np.testing.assert_allclose(out, np.arange(1000) * 2.5, rtol=1e-6)
print("topology smoke OK:", len(out), "elements")
EOF

echo "== smoke: CLI catalog =="
N_BLOCKS=$(JAX_PLATFORMS=cpu "$WORK/venv/bin/pothoscomms-tpu" list | wc -l)
echo "CLI lists $N_BLOCKS registered block paths"
test "$N_BLOCKS" -ge 57

if [ -n "${1:-}" ]; then
  printf '{"metric": "wheel_smoke", "ok": true, "wheel": "%s", "cli_blocks": %s}\n' \
    "$(basename "$WHEEL")" "$N_BLOCKS" > "$1"
fi
echo "WHEEL SMOKE PASSED"
