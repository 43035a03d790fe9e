# Stage-A 2-row slab carry fold (fold="sl2") A/B vs the 1-row carry.
"""The wide-path walk measured ~0.39 us per [136, 512] row (~10% VPU) —
overhead-bound, not bandwidth-bound. sl2 folds two rows per fori trip to
amortize the per-trip scalar/branch cost; this measures it on the honest
mixed dist, all-wide, and narrow (win48 both-body + force).

Usage: python scripts/bench_fold_sl2.py
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
u = rng.rand(B, N, 1)
wh = np.where(
    u < 0.80,
    rng.uniform(8, 300, (B, N, 2)),
    np.where(
        u < 0.95,
        rng.uniform(300, 700, (B, N, 2)),
        np.stack(
            [rng.uniform(0.7, 1.0, (B, N)) * W,
             rng.uniform(0.7, 1.0, (B, N)) * H], -1
        ),
    ),
)
xy = rng.uniform(0, W * 0.6, (B, N, 2))


def clip_boxes(b_):
    b_[..., [0, 2]] = b_[..., [0, 2]].clip(0, W)
    b_[..., [1, 3]] = b_[..., [1, 3]].clip(0, H)
    return jnp.asarray(b_.astype(np.float32))


rois_mixed = clip_boxes(np.concatenate([xy, xy + wh], -1))
rois_wide = clip_boxes(
    np.concatenate([xy, xy + rng.uniform(340, 700, (B, N, 2))], -1)
)
rois_narrow = clip_boxes(
    np.concatenate([xy, xy + rng.uniform(8, 300, (B, N, 2))], -1)
)
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


def mk(win=48, force=False, fold="seq"):
    @jax.jit
    def run(feat, rois, gate):
        acc = None
        for cb in range(0, C, CT):
            r = roi_pool_fused_batched(
                feat, rois, gate, cb, c_take=CT, spatial_scale=scale,
                win=win, force_narrow=force, fold=fold,
            )
            v = (
                r[tuple(0 for _ in r.shape)].astype(jnp.float32)
                + r[tuple(-1 for _ in r.shape)].astype(jnp.float32)
            )
            acc = v if acc is None else acc + v
        return acc

    return run


# on-chip exactness gate (mixed dist exercises all bodies)
a = roi_pool_fused_batched(
    feat, rois_mixed, gate, 0, c_take=CT, spatial_scale=scale, win=48
)
b = roi_pool_fused_batched(
    feat, rois_mixed, gate, 0, c_take=CT, spatial_scale=scale, win=48,
    fold="sl2",
)
print(f"exact[mixed sl2]: {'OK' if bool(jnp.all(a == b)) else 'MISMATCH'}",
      flush=True)

timeit("mixed  sl2 win48 2body", mk(fold="sl2"), feat, rois_mixed, gate)
timeit("wide   sl2 fullrow F  ", mk(1024, True, "sl2"), feat, rois_wide, gate)
timeit("wide   seq fullrow F  ", mk(1024, True, "seq"), feat, rois_wide, gate)
timeit("narrow sl2 win48 2body", mk(fold="sl2"), feat, rois_narrow, gate)
timeit("narrow sl2 win48 FORCE", mk(force=True, fold="sl2"), feat, rois_narrow, gate)
