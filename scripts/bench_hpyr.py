# Shared H-direction 4-row pyramid stage A (hpyr) A/B.
"""The stage-A walk is VMEM-bandwidth-bound (measured ~26 ns per [48, 512]
row / ~87 ns per [136, 512] — 2026-08-20 v5e), so the only lever is fewer
bytes: hpyr builds a stride-1 4-row range-max level once per resident tile
and bins >= 4 rows fold ceil(n/4) pyramid rows. Costs a second tile-sized
buffer (auto c_tile halves 512 -> 256 at the bench tile), so the A/B must
answer whether the byte saving beats the doubled per-visit fixed cost.

Rows: all-wide and mixed at the production split (narrow win48 two-body +
wide tail fullrow-force hpyr), plus the pure-kernel all-wide hpyr form.

Usage: python scripts/bench_hpyr.py
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


def mk(win=48, force=False, hpyr=False, c_tile=None):
    @jax.jit
    def run(feat, rois, gate):
        acc = None
        for cb in range(0, C, CT):
            r = roi_pool_fused_batched(
                feat, rois, gate, cb, c_take=CT, spatial_scale=scale,
                win=win, force_narrow=force, hpyr=hpyr, c_tile=c_tile,
            )
            v = consume(r)
            acc = v if acc is None else acc + v
        return acc

    return run


def mk_split(frac=0.78):
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
                spatial_scale=scale, win=48,
            )
            r2 = roi_pool_fused_batched(
                feat, boxes_w[:, k:], gate_w[:, k:], cb, c_take=CT,
                spatial_scale=scale, win=1024, force_narrow=True, hpyr=True,
            )
            v = consume(r1) + consume(r2)
            acc = v if acc is None else acc + v
        return acc

    return run


# on-chip exactness gate (sum compare; permutation-free single call)
a = roi_pool_fused_batched(
    feat, rois_wide, gate, 0, c_take=CT, spatial_scale=scale, win=48
)
b = roi_pool_fused_batched(
    feat, rois_wide, gate, 0, c_take=CT, spatial_scale=scale,
    win=1024, force_narrow=True, hpyr=True,
)
ok = bool(jnp.all(a.astype(jnp.float32) == b.astype(jnp.float32)))
print(f"exact[wide hpyr vs 2body]: {'OK' if ok else 'MISMATCH'}", flush=True)

timeit("all-wide hpyr fullrowF (auto ct)", mk(1024, True, True), feat, rois_wide, gate)
timeit("all-wide base fullrowF ct256   ", mk(1024, True, False, 256), feat, rois_wide, gate)
timeit("all-wide base 2body win48      ", mk(48), feat, rois_wide, gate)
timeit("mixed  split78 n48/hpyr        ", mk_split(0.78), feat, rois_mixed, gate)
timeit("mixed  split85 n48/hpyr        ", mk_split(0.85), feat, rois_mixed, gate)
timeit("mixed  base 2body win48        ", mk(48), feat, rois_mixed, gate)


# stage B for the hpyr wide segment: the per-ROI W-direction pyramid build
# is k levels x p bins of in-place [wd, CT] RMW (~2-3 MB VMEM traffic per
# visit — possibly THE wide stage-B cost); the j_cap~24 gather dots pay 7
# MXU issues instead. A/B both under hpyr stage A.
def mk_sbw(sbw):
    @jax.jit
    def run(feat, rois, gate):
        acc = None
        for cb in range(0, C, CT):
            r = roi_pool_fused_batched(
                feat, rois, gate, cb, c_take=CT, spatial_scale=scale,
                win=1024, force_narrow=True, hpyr=True, stage_b_wide=sbw,
            )
            v = consume(r)
            acc = v if acc is None else acc + v
        return acc

    return run


if os.environ.get("BENCH_HPYR_SBW", "0") == "1":
    a = roi_pool_fused_batched(
        feat, rois_wide, gate, 0, c_take=CT, spatial_scale=scale,
        win=1024, force_narrow=True, hpyr=True, stage_b_wide="pyr",
    )
    b = roi_pool_fused_batched(
        feat, rois_wide, gate, 0, c_take=CT, spatial_scale=scale,
        win=1024, force_narrow=True, hpyr=True, stage_b_wide="vpu",
    )
    ok = bool(jnp.all(a.astype(jnp.float32) == b.astype(jnp.float32)))
    print(f"exact[hpyr sbw dots vs pyr]: {'OK' if ok else 'MISMATCH'}",
          flush=True)
    timeit("all-wide hpyr sbw=pyr ", mk_sbw("pyr"), feat, rois_wide, gate)
    timeit("all-wide hpyr sbw=dots", mk_sbw("vpu"), feat, rois_wide, gate)
