#!/usr/bin/env bash
# CI gate (parity: /root/reference/.github/workflows/ci.yml — fmt + clippy +
# test matrix). Runs the full suite on the virtual 8-device CPU mesh
# (tests/conftest.py forces jax_platforms=cpu + host_platform_device_count=8),
# a compile-check of the graft entry points, and basic lint.
set -euo pipefail
cd "$(dirname "$0")"

echo "== lint: compile all sources =="
python -m compileall -q futuresdr_tpu examples perf tests bench.py __graft_entry__.py

echo "== lint: no stray debugging/scratch artifacts =="
! git ls-files | grep -E '_tmp\.py$|\.wav$|\.orig$' \
    | grep -v '^tests/data/' || {
    echo "scratch artifacts tracked in git"; exit 1; }

echo "== tests (virtual 8-device CPU mesh) =="
python -m pytest tests/ -q

echo "== multichip dryrun (8 virtual devices) =="
python - <<'EOF'
import jax
# this container pins the axon TPU backend at interpreter start; force the
# virtual CPU mesh in-process (JAX_PLATFORMS env is ignored here)
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
import __graft_entry__ as g
g.dryrun_multichip(8)
print("dryrun_multichip(8): ok")
EOF

echo "== multihost dryrun (2 processes x 4 devices) =="
python -c "import __graft_entry__ as g; g.dryrun_multihost(2, 4)"

echo "ALL CHECKS PASSED"
