#!/usr/bin/env bash
# Full local check battery: tests (CPU 8-virtual-device backend), driver
# entry points, and the bench in dry mode.
set -euo pipefail
cd "$(dirname "$0")/.."

echo "=== pytest ==="
python -m pytest tests/ -q

echo "=== driver entry points (virtual 8-device mesh) ==="
JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 python - <<'EOF'
import jax
jax.config.update("jax_platforms", "cpu")
import __graft_entry__ as ge
fn, args = ge.entry()
jax.block_until_ready(jax.jit(fn)(*args))
print("entry OK")
ge.dryrun_multichip(8)
EOF

echo "=== sharded end-to-end demo (8-virtual-device mesh) ==="
python scripts/demo_sharded.py

echo "All checks passed."
