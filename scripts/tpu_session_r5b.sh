#!/bin/bash
# Round-5 follow-up TPU block: the levers the first session pointed at.
# - w8hc re-measure: the 481 ms verdict predates the lane-block band fix
#   (bench_w8hc.py was written after the last on-chip block of round 4).
# - sl2 2-row slab carry fold: the wide walk is overhead-bound (~0.39 us
#   per row at ~10% VPU) — fatter trips amortize it.
# - pipe on the NARROW force program (the first session only measured pipe
#   at full-row, where the bigger j_cap dot set ate the overlap win).
set -u
OUT=${1:-/tmp/tpu_r5b}
mkdir -p "$OUT"
cd "$(dirname "$0")/.."

step() {
  name=$1; shift
  echo "=== $name: $*"
  timeout 2400 "$@" > "$OUT/$name.log" 2>&1
  echo "--- $name exit=$? tail:"
  tail -8 "$OUT/$name.log"
}

step w8hc python scripts/bench_w8hc.py
step fold_sl2 python scripts/bench_fold_sl2.py
step pipe_narrow python - <<'EOF'
import os, sys, time
sys.path.insert(0, os.getcwd())
import jax, jax.numpy as jnp, numpy as np
from wsovod_tpu.ops.pallas.roi_pool_fused import roi_pool_fused_batched

C, scale = 2048, 1.0 / 8
B, N, CT = 8, 5024, 512
feat = jax.jit(lambda: jax.random.normal(jax.random.PRNGKey(0), (B, 86, 132, C), jnp.bfloat16))()
rng = np.random.RandomState(0)
xy = rng.uniform(0, 634, (B, N, 2))
rois = jnp.asarray(np.concatenate([xy, xy + rng.uniform(8, 300, (B, N, 2))], -1).astype(np.float32))
gate = jnp.ones((B, N), jnp.float32)

def fetch(o):
    np.asarray(jax.tree_util.tree_leaves(o)[0].ravel()[0:1])

def mk(pipe):
    @jax.jit
    def run(feat, rois, gate):
        acc = None
        for cb in range(0, C, CT):
            r = roi_pool_fused_batched(
                feat, rois, gate, cb, c_take=CT, spatial_scale=scale,
                win=48, force_narrow=True, pipe=pipe,
            )
            v = (r[tuple(0 for _ in r.shape)].astype(jnp.float32)
                 + r[tuple(-1 for _ in r.shape)].astype(jnp.float32))
            acc = v if acc is None else acc + v
        return acc
    return run

for name, pipe in (("narrow FORCE seq ", False), ("narrow FORCE PIPE", True)):
    fn = mk(pipe)
    out = fn(feat, rois, gate); fetch(out)
    t0 = time.perf_counter()
    for _ in range(10):
        out = fn(feat, rois, gate)
    fetch(out)
    print(f"{name}: {(time.perf_counter()-t0)/10*1000:.2f} ms", flush=True)
EOF

echo "=== r5b done; logs in $OUT"

step hpyr python scripts/bench_hpyr.py

# MRRP-R50 flagship train step (VERDICT r4 #6; target <= 2.5 s/step at B=4)
step train_mrrp50 env BENCH_ONLY=mrrp50 python scripts/bench_train.py
