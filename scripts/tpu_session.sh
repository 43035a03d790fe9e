#!/bin/bash
# One-shot TPU measurement session for the round-3c levers (run when the
# axon tunnel is back). Order matters: tiny-shape compile smokes first (catch
# Mosaic lowering errors in seconds), then kernel microbenches, then the full
# bench. Each step is its own process (an OOM poisons later allocs in-process)
# and logs to $OUT. Steps continue on failure.
set -u
OUT=${1:-/tmp/tpu_session}
mkdir -p "$OUT"
cd "$(dirname "$0")/.."

step() {
  name=$1; shift
  echo "=== $name: $*"
  timeout 1500 "$@" > "$OUT/$name.log" 2>&1
  echo "--- $name exit=$? tail:"
  tail -3 "$OUT/$name.log"
}

# 1. compile smokes (small shapes; includes the class-sorted, maxabs, loop
#    meta, branched, and int8-conv paths that have never lowered on-chip)
step smoke_kernels python - << 'EOF'
import numpy as np, jax, jax.numpy as jnp
from wsovod_tpu.ops.pallas.roi_pool_fused import (
    roi_pool_fused_batched, pool_width_classes, POOL_WIN_CLASSES,
)
from wsovod_tpu.models.poolers import branch_partition
from wsovod_tpu.models.layers import conv3x3_shifted_int8

rng = np.random.RandomState(0)
feat = jnp.asarray(rng.randn(2, 20, 56, 256).astype(np.float32)).astype(jnp.bfloat16)
xy = rng.uniform(0, 90, (2, 24, 2))
wh = np.concatenate([rng.uniform(2, 40, (2, 12, 2)), rng.uniform(60, 160, (2, 12, 2))], 1)
rois = jnp.asarray(np.concatenate([xy, xy + wh], -1).astype(np.float32))
gate = jnp.ones((2, 24), jnp.float32)

print("plain meta...", flush=True)
o = roi_pool_fused_batched(feat, rois, gate, spatial_scale=0.25)
print("ok", np.asarray(o).sum(), flush=True)
print("plain maxabs...", flush=True)
o, pm = roi_pool_fused_batched(feat, rois, gate, spatial_scale=0.25, quant="maxabs")
print("ok", np.asarray(pm).max(), flush=True)
print("class-sorted...", flush=True)
cls = pool_width_classes(rois, 0.25, 56)
bs, gs, ks, un = branch_partition(rois, gate, cls, len(POOL_WIN_CLASSES))
o = roi_pool_fused_batched(feat, bs, gs, spatial_scale=0.25, cls_tbl=ks[:, ::8])
print("ok", np.asarray(o).sum(), flush=True)
print("class-sorted maxabs...", flush=True)
o, pm = roi_pool_fused_batched(feat, bs, gs, spatial_scale=0.25, cls_tbl=ks[:, ::8], quant="maxabs")
print("ok", np.asarray(pm).max(), flush=True)
print("loop meta...", flush=True)
o = roi_pool_fused_batched(feat, rois, gate, spatial_scale=0.25, loop_pool=True)
print("ok", np.asarray(o).sum(), flush=True)
print("loop maxabs...", flush=True)
o, pm = roi_pool_fused_batched(feat, rois, gate, spatial_scale=0.25, loop_pool=True, quant="maxabs")
print("ok", np.asarray(pm).max(), flush=True)
print("int8 conv...", flush=True)
k = jnp.asarray(rng.randn(3, 3, 256, 256).astype(np.float32) * 0.01).astype(jnp.bfloat16)
y = conv3x3_shifted_int8(feat, k, None)
print("ok", float(jnp.sum(y.astype(jnp.float32))), flush=True)
print("ALL SMOKES PASS", flush=True)
EOF

# 2. kernel microbenches (bench shapes)
step bench_pool python scripts/bench_maxpool_kernel.py pool
step bench_loop python scripts/bench_maxpool_kernel.py loop
step bench_chain python scripts/bench_maxpool_kernel.py chain
step bench_rpn_conv python scripts/bench_rpn_conv.py
step bench_fc1_int4 python scripts/bench_fc1.py

# 3. full bench: shipped flagship (ROIPool + int8 fc1), then variants
step bench_roipool python bench.py
step bench_roipool_rpnq env BENCH_RPN_QUANT=int8 python bench.py
step bench_roialign env BENCH_POOLER=ROIAlignV2 python bench.py
# A/B the (now opt-in) round-3c levers (skip if short on tunnel time);
# measured 2026-08-18: cls-sort 9.4 img/s (dead end), maxabs 18.80 vs
# 19.19 without -> both default OFF
step bench_pool_cls env WSOVOD_POOL_CLS=1 python bench.py
step bench_pool_maxabs env WSOVOD_POOL_MAXABS=1 python bench.py

echo "=== session done; logs in $OUT"
