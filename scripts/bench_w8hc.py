# w8hc lane-block band A/B: single-dot stage B after the store fix.
"""The round-4 w8hc postmortem blamed the [win, 8, CT] wband's 1-of-8
masked-SUBLANE stores (481 ms vs 175). This session re-lays the band as
[win, 8*CT] with ph as contiguous LANE blocks (store cost == a plain
[win, CT] store) — stage B stays ONE [p*j_cap, win] x [win, 8*CT] gather
dot vs the 7 fill/drain-bound small dots (~67 ms of the 183 ms sweep),
and the per-ROI output store is a contiguous [8, 8*CT] block.

Also probes c_tile=1024 (trip-bound stage A: per-trip cost is fixed
~12 ns regardless of band width, so wider lanes halve the cell count).

Usage: python scripts/bench_w8hc.py
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
B, N = 8, 5024
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


def mk(win=48, ct=512, **kw):
    @jax.jit
    def run(feat, rois, gate):
        acc = None
        for cb in range(0, C, ct):
            r = roi_pool_fused_batched(
                feat, rois, gate, cb, c_take=ct, spatial_scale=scale,
                win=win, force_narrow=True, **kw,
            )
            # touch every output region (DCE guard: first+last element)
            v = (
                r[tuple(0 for _ in r.shape)].astype(jnp.float32)
                + r[tuple(-1 for _ in r.shape)].astype(jnp.float32)
            )
            acc = v if acc is None else acc + v
        return acc

    return run


timeit("narrow base  win48 ct512 ", mk(48), feat, rois_narrow, gate)
timeit("narrow w8hc  win48 ct512 ", mk(48, out_layout="w8hc"), feat, rois_narrow, gate)
timeit("wide   base  fullrow ct512", mk(1024), feat, rois_wide, gate)
timeit("wide   w8hc  fullrow ct512", mk(1024, out_layout="w8hc"), feat, rois_wide, gate)
timeit("narrow base  win48 ct1024", mk(48, 1024, c_tile=1024), feat, rois_narrow, gate)
timeit("narrow w8hc  win48 ct1024", mk(48, 1024, c_tile=1024, out_layout="w8hc"), feat, rois_narrow, gate)
timeit("wide   w8hc  fullrow ct1024", mk(1024, 1024, c_tile=1024, out_layout="w8hc"), feat, rois_wide, gate)
