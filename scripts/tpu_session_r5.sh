#!/bin/bash
# Round-5 one-shot TPU measurement session (VERDICT r4 #2/#6/#8).
# Order front-loads decision data: kernel micro A/Bs (anatomy, il2 folds,
# wide segments, pipe), then the full bench (+ per-stage table), then the
# tile8 e2e A/B, then loop-pool honest re-measure + MRRP train step.
# Each step is its own process; logs land in $OUT.
set -u
OUT=${1:-/tmp/tpu_r5}
mkdir -p "$OUT"
cd "$(dirname "$0")/.."

step() {
  name=$1; shift
  echo "=== $name: $*"
  timeout 2400 "$@" > "$OUT/$name.log" 2>&1
  echo "--- $name exit=$? tail:"
  tail -6 "$OUT/$name.log"
}

step probe python -c "import jax; print(jax.devices())"

# 1. per-ROI fixed overhead / tile8 / flat-ROI isolation
step anatomy python scripts/bench_pool_anatomy.py

# 2. branchless interleaved stage-A folds (queued r4, never measured)
step fold_il python scripts/bench_fold_il.py

# 3. width-split segments incl. full-row force (mixed honest dist)
step wseg python scripts/bench_wseg.py

# 4. full bench: shipped default (now with the per-stage table)
step bench_default python bench.py

# 5. tile8 e2e (pre-pool per-image int8: VERDICT r4 #2c)
step bench_tile8 env WSOVOD_POOL_TILE8=1 python bench.py

# 6. full-row single-body program, without and with the pipe interleave
step bench_fullrow env WSOVOD_POOL_FULLROW=1 python bench.py
step bench_fullrow_pipe env WSOVOD_POOL_FULLROW=1 WSOVOD_POOL_PIPE=1 python bench.py

# 7. loop-pool honest re-measure (DCE-suspect round-3 numbers)
step bench_loop python scripts/bench_maxpool_kernel.py loop

# 8. MRRP train step B=4 (round-3 ask, target <= 2.5 s/step)
step bench_train_mrrp python scripts/bench_train.py

echo "=== session done; logs in $OUT"
