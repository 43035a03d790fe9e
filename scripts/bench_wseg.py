# Width-split WIDE-SEGMENT hypothesis: a separate single-body full-row
# force_narrow program for the wide ROIs.
"""In-kernel per-ROI wide branches are dead (3rd body slowed even all-narrow
183 -> 639 ms). This measures the call-level split instead: mixed honest
dist, ROIs width-sorted; narrow segment at win48, wide segment at
win=w_dma force_narrow (carry-fold full-row walk + j_cap24 gather dots,
ONE body). Also isolates the all-wide cost in the new form vs 891 ms VPU.

Usage: python scripts/bench_wseg.py
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


def consume(r):
    return (
        r[tuple(0 for _ in r.shape)].astype(jnp.float32)
        + r[tuple(-1 for _ in r.shape)].astype(jnp.float32)
    )


def mk(win=48, force=False, pipe=False, fold="seq"):
    @jax.jit
    def run(feat, rois, gate):
        acc = None
        for cb in range(0, C, CT):
            r = roi_pool_fused_batched(
                feat, rois, gate, cb, c_take=CT, spatial_scale=scale,
                win=win, force_narrow=force, pipe=pipe, fold=fold,
            )
            v = consume(r)
            acc = v if acc is None else acc + v
        return acc

    return run


def mk_split(frac, win_n=48, force_n=False):
    k = int(round(frac * N / 8)) * 8

    @jax.jit
    def run(feat, rois, gate):
        rx1 = jnp.floor(rois[..., 0] * scale + 0.5).astype(jnp.int32)
        rx2 = jnp.floor(rois[..., 2] * scale + 0.5).astype(jnp.int32)
        rw = jnp.maximum(rx2 - rx1 + 1, 1)
        order = jnp.argsort(jnp.where(gate > 0, rw, -1), axis=1).astype(jnp.int32)
        boxes_w = jnp.take_along_axis(rois, order[..., None], axis=1)
        gate_w = jnp.take_along_axis(gate, order, axis=1)
        acc = None
        for cb in range(0, C, CT):
            r1 = roi_pool_fused_batched(
                feat, boxes_w[:, :k], gate_w[:, :k], cb, c_take=CT,
                spatial_scale=scale, win=win_n, force_narrow=force_n,
            )
            r2 = roi_pool_fused_batched(
                feat, boxes_w[:, k:], gate_w[:, k:], cb, c_take=CT,
                spatial_scale=scale, win=1024, force_narrow=True,
            )
            v = consume(r1) + consume(r2)
            acc = v if acc is None else acc + v
        return acc

    return run


# exactness of the sorted-split vs single-call (value sums differ by
# permutation; compare via sum over everything instead)
@jax.jit
def total_single(feat, rois, gate):
    r = roi_pool_fused_batched(
        feat, rois, gate, 0, c_take=CT, spatial_scale=scale, win=48
    )
    return jnp.sum(r.astype(jnp.float32))


@jax.jit
def total_split(feat, rois, gate):
    rx1 = jnp.floor(rois[..., 0] * scale + 0.5).astype(jnp.int32)
    rx2 = jnp.floor(rois[..., 2] * scale + 0.5).astype(jnp.int32)
    rw = jnp.maximum(rx2 - rx1 + 1, 1)
    order = jnp.argsort(jnp.where(gate > 0, rw, -1), axis=1).astype(jnp.int32)
    boxes_w = jnp.take_along_axis(rois, order[..., None], axis=1)
    gate_w = jnp.take_along_axis(gate, order, axis=1)
    k = int(round(0.75 * N / 8)) * 8
    r1 = roi_pool_fused_batched(
        feat, boxes_w[:, :k], gate_w[:, :k], 0, c_take=CT,
        spatial_scale=scale, win=48,
    )
    r2 = roi_pool_fused_batched(
        feat, boxes_w[:, k:], gate_w[:, k:], 0, c_take=CT,
        spatial_scale=scale, win=1024, force_narrow=True,
    )
    return jnp.sum(r1.astype(jnp.float32)) + jnp.sum(r2.astype(jnp.float32))


a = float(total_single(feat, rois_mixed, gate))
b = float(total_split(feat, rois_mixed, gate))
print(f"exact[sum single vs split]: {a:.1f} vs {b:.1f} "
      f"{'OK' if abs(a - b) < 2.0 else 'MISMATCH'}", flush=True)

timeit("all-wide  fullrow FORCE    ", mk(1024, True), feat, rois_wide, gate)
timeit("mixed split75 n48/full     ", mk_split(0.75), feat, rois_mixed, gate)
timeit("mixed split75 n48F/full    ", mk_split(0.75, force_n=True), feat, rois_mixed, gate)
timeit("mixed split85 n48/full     ", mk_split(0.85), feat, rois_mixed, gate)
timeit("mixed fullrow FORCE 1call  ", mk(1024, True), feat, rois_mixed, gate)
timeit("mixed fullrow FORCE PIPE   ", mk(1024, True, pipe=True), feat, rois_mixed, gate)
timeit("wide  fullrow FORCE PIPE   ", mk(1024, True, pipe=True), feat, rois_wide, gate)
timeit("mixed fullrow FORCE il2    ", mk(1024, True, fold="il2"), feat, rois_mixed, gate)
