#!/bin/bash
# One-stop TPU validation session (run when the relay is healthy).
# Everything is time-bounded so a relay death mid-run cannot hang the
# shell; results append to /tmp/tpu_revalidate.log and should be copied
# into BENCH_NOTES.md with the session noted.
#
# Current gate set (2026-08-18 refresh):
#   1. kernel_parity — 10 fixed synthetic windows vs the complex XLA
#      oracle, production pipelined-Mosaic path.
#   2. tpu_circuit_parity — seeded random 18-op circuit through the
#      FULL compile pipeline vs a forced-CPU per-op reference.
#   3. arith_bench k=9 A/B — cmix + scalar-fold headline
#      (2026-08-18: 98.4 ms kernel vs 338.8 ms dense, 3.44x).
#   4. grover_bench 28 — kernel arm (2026-08-18: 174.5 ms/iteration).
#   5. /verify-style end-to-end smoke on the real backend.
#   6. bench.py fresh headline (non-stale JSON line).
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

echo "--- 2. random-circuit parity (seed 42) ---" | tee -a "$LOG"
timeout 1500 python scripts/tpu_circuit_parity.py 42 2>&1 | tail -1 | tee -a "$LOG"

echo "--- 3. arith_bench k=9: kernel arm ---" | tee -a "$LOG"
RUSTQIP_TPU_PALLAS=1 timeout 1500 python benches/arith_bench.py 9 \
  2>&1 | tail -2 | tee -a "$LOG"
echo "--- 3b. arith_bench k=9: dense arm (A/B) ---" | tee -a "$LOG"
RUSTQIP_TPU_PALLAS=1 RUSTQIP_TPU_WINDOW_FUSION=0 RUSTQIP_TPU_KEEP_BUTTERFLY=0 \
  timeout 1500 python benches/arith_bench.py 9 2>&1 | tail -2 | tee -a "$LOG"

echo "--- 4. grover_bench 28: kernel arm ---" | tee -a "$LOG"
RUSTQIP_TPU_PALLAS=1 timeout 1500 python benches/grover_bench.py 28 \
  2>&1 | tail -2 | tee -a "$LOG"

echo "--- 5. end-to-end smoke (real backend) ---" | tee -a "$LOG"
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

echo "--- 6. bench.py headline ---" | tee -a "$LOG"
RUSTQIP_TPU_BENCH_BUDGET_S=1800 timeout 2100 python bench.py \
  2>&1 | tail -1 | tee -a "$LOG"

echo "=== done $(date -u) ===" | tee -a "$LOG"
