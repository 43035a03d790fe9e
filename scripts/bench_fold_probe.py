# Stage-A bottleneck probe: trips vs bytes.
"""tallnarrow (rw<=39 win48, rh 42-88: ~65 trips x 49KB rows) vs shortwide
(rw 42-88 full-row, rh 8-19: ~14 trips x 139KB rows). If per-ROI cost
tracks TRIPS, the walk is latency/sequencing-bound; if it tracks BYTES,
it's VMEM-bandwidth-bound and the lever is halving element width (int8
walk with bf16 max), not restructuring loops.

Usage: python scripts/bench_fold_probe.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import jax.numpy as jnp
import numpy as np

from wsovod_tpu.ops.pallas.roi_pool_fused import roi_pool_fused_batched

C, scale = 2048, 1.0 / 8
B, N, CT = 8, 5024, 512
H, W = 688, 1056
iters = 10

feat = jax.jit(
    lambda: jax.random.normal(jax.random.PRNGKey(0), (B, 86, 132, C), jnp.bfloat16)
)()
rng = np.random.RandomState(0)
xy = rng.uniform(0, W * 0.6, (B, N, 2))


def mk_rois(wlo, whi_, hlo, hhi_):
    wh = np.stack(
        [rng.uniform(wlo, whi_, (B, N)), rng.uniform(hlo, hhi_, (B, N))], -1
    )
    b_ = np.concatenate([xy, xy + wh], -1)
    b_[..., [0, 2]] = b_[..., [0, 2]].clip(0, W)
    b_[..., [1, 3]] = b_[..., [1, 3]].clip(0, H)
    return jnp.asarray(b_.astype(np.float32))


rois_tallnarrow = mk_rois(8, 300, 340, 700)   # ~65 trips, 49KB/row (win48)
rois_shortwide = mk_rois(340, 700, 64, 150)   # ~8-19 trips, 139KB/row
rois_wide = mk_rois(340, 700, 340, 700)
gate = jnp.ones((B, N), jnp.float32)


def fetch(o):
    np.asarray(jax.tree_util.tree_leaves(o)[0].ravel()[0:1])


def timeit(name, fn, *args):
    try:
        out = fn(*args)
        fetch(out)
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        fetch(out)
        print(f"{name}: {(time.perf_counter() - t0) / iters * 1000:.2f} ms", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"{name}: FAILED {type(e).__name__}: {e}", flush=True)


def mk(win=48, force=False, fold="seq", ablate=""):
    @jax.jit
    def run(feat, rois, gate):
        acc = None
        for cb in range(0, C, CT):
            r = roi_pool_fused_batched(
                feat, rois, gate, cb, c_take=CT, spatial_scale=scale,
                win=win, force_narrow=force, fold=fold, ablate=ablate,
            )
            v = (
                r[tuple(0 for _ in r.shape)].astype(jnp.float32)
                + r[tuple(-1 for _ in r.shape)].astype(jnp.float32)
            )
            acc = v if acc is None else acc + v
        return acc

    return run


timeit("tallnarrow win48 F seq (65t x 49KB)", mk(48, True), feat, rois_tallnarrow, gate)
timeit("shortwide fullrow F seq (14t x139KB)", mk(1024, True), feat, rois_shortwide, gate)
timeit("wide fullrow F NODOT (stageA only)  ", mk(1024, True, ablate="nodot"), feat, rois_wide, gate)
timeit("tallnarrow win48 F NODOT            ", mk(48, True, ablate="nodot"), feat, rois_tallnarrow, gate)
