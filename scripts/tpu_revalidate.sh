#!/bin/bash
# One-stop TPU re-validation session (run when the relay is healthy).
# Everything is time-bounded so a relay death mid-run cannot hang the
# shell; results append to /tmp/tpu_revalidate.log and should be copied
# into BENCH_NOTES.md with the session noted.
#
# Owed since the 2026-08-17 ~19:40 UTC relay outage:
#   1. kernel_parity 10-window run (incl. cmix_high_targets) — the
#      production pipelined-Mosaic path; CPU-interpret already agrees
#      to <= 9.4e-10 on all ten windows.
#   2. arith_bench k=9 A/B — the cmix headline (plan: 32 sweeps -> 5).
#   3. /verify-style end-to-end smoke on the real backend.
#   4. bench.py fresh headline (replaces the stale-flagged fallback).
set -u
LOG=/tmp/tpu_revalidate.log
cd "$(dirname "$0")/.."
echo "=== tpu_revalidate $(date -u) ===" | tee -a "$LOG"

probe() {
  timeout 180 python -c "
import jax
assert jax.default_backend() == 'tpu', jax.default_backend()
import jax.numpy as jnp
print('relay OK', float(jnp.sum(jnp.ones((8,128)))))
" 2>&1 | tail -1
}
if ! probe | grep -q "relay OK"; then
  echo "relay DOWN — aborting" | tee -a "$LOG"
  exit 1
fi
echo "relay healthy" | tee -a "$LOG"

echo "--- 1. kernel parity (10 windows) ---" | tee -a "$LOG"
timeout 1500 python scripts/kernel_parity.py 2>&1 | tail -3 | tee -a "$LOG"

echo "--- 2. arith_bench k=9: kernel arm ---" | tee -a "$LOG"
RUSTQIP_TPU_PALLAS=1 timeout 1500 python benches/arith_bench.py 9 \
  2>&1 | tail -2 | tee -a "$LOG"
echo "--- 2b. arith_bench k=9: dense arm (A/B) ---" | tee -a "$LOG"
RUSTQIP_TPU_PALLAS=1 RUSTQIP_TPU_WINDOW_FUSION=0 RUSTQIP_TPU_KEEP_BUTTERFLY=0 \
  timeout 1500 python benches/arith_bench.py 9 2>&1 | tail -2 | tee -a "$LOG"

echo "--- 3. end-to-end smoke (real backend) ---" | tee -a "$LOG"
timeout 600 python - <<'EOF' 2>&1 | tail -3 | tee -a "$LOG"
import jax, numpy as np
print("backend:", jax.default_backend())
from rustqip_tpu.prelude import *
b = LocalBuilder()
q = b.qubit(); ra = b.register(3); rb = b.register(3)
q = b.h(q)
cb = b.condition_with(q)
ra, rb = cb.swap(ra, rb)
q = cb.dissolve()
q = b.h(q)
q, m = b.measure(q)
state, measured = b.calculate_state_with_init([(ra, 0b000), (rb, 0b001)])
print("measurement:", measured.get_measurement(m))
print("norm:", float(np.sum(np.abs(np.asarray(state)) ** 2)))
EOF

echo "--- 4. bench.py headline ---" | tee -a "$LOG"
RUSTQIP_TPU_BENCH_BUDGET_S=1800 timeout 2100 python bench.py \
  2>&1 | tail -1 | tee -a "$LOG"

echo "=== done $(date -u) ===" | tee -a "$LOG"
