# Wide-path pyramid stage B A/B (see _onehot_gather_max_pyr).
"""Round-4 wide-path fix: both prior wide forms (VPU _band_max and j~24
gather dots) measured ~890 ms all-wide vs 175 all-narrow — their cost
scales with the per-bin candidate count. The range-max pyramid cuts the
candidates to 5 spans at a per-ROI scalar level k.

Measures all-narrow (regression check: the wide body is traced into the
same program), all-wide, and the honest long-tail mix, pyramid vs vpu.

Usage: python scripts/bench_pyr.py
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


def clip_boxes(b_):
    b_[..., [0, 2]] = b_[..., [0, 2]].clip(0, W)
    b_[..., [1, 3]] = b_[..., [1, 3]].clip(0, H)
    return jnp.asarray(b_.astype(np.float32))


u = rng.rand(B, N, 1)
wh_mixed = np.where(
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
rois_mixed = clip_boxes(np.concatenate([xy, xy + wh_mixed], -1))
rois_narrow = clip_boxes(
    np.concatenate([xy, xy + rng.uniform(8, 300, (B, N, 2))], -1)
)
rois_wide = clip_boxes(
    np.concatenate([xy, xy + rng.uniform(340, 700, (B, N, 2))], -1)
)
gate = jnp.ones((B, N), jnp.float32)


def fetch(o):
    for leaf in jax.tree_util.tree_leaves(o):
        np.asarray(leaf.ravel()[0:1])


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


def mk(**kw):
    @jax.jit
    def run(feat, rois, gate):
        acc = None
        for cb in range(0, C, CT):
            r = roi_pool_fused_batched(
                feat, rois, gate, cb, c_take=CT, spatial_scale=scale, **kw
            )
            v = (
                r[tuple(0 for _ in r.shape)].astype(jnp.float32)
                + r[tuple(-1 for _ in r.shape)].astype(jnp.float32)
            )
            acc = v if acc is None else acc + v
        return acc

    return run


pyr, vpu = mk(), mk(stage_b_wide="vpu")
timeit("narrow pyr-program", pyr, feat, rois_narrow, gate)
timeit("narrow vpu-program", vpu, feat, rois_narrow, gate)
timeit("wide   pyr        ", pyr, feat, rois_wide, gate)
timeit("wide   vpu        ", vpu, feat, rois_wide, gate)
timeit("mixed  pyr        ", pyr, feat, rois_mixed, gate)
timeit("mixed  vpu        ", vpu, feat, rois_mixed, gate)
