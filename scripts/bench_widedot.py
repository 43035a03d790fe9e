# Wide-path A/B: VPU masked band maxes vs full-row MXU gather dots, plus a
# c_tile=1024 probe (wider lanes amortize the per-ROI scalar sequencing).
"""The honest long-tail ROI mix put 19% of ROIs on the wide full-row path
and cost ~4 img/s end-to-end (~80 ms/batch): _band_max's 49 masked maxes
over a [7, 136, CT] band are ~23k vreg-ops per ROI-c-tile (~21 us) vs the
narrow path's ~3 us of MXU gather dots. wide_dot gives wide ROIs the same
gather-dot stage B with a width-sized candidate budget.

Usage: python scripts/bench_widedot.py
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
rois_narrow = clip_boxes(
    np.concatenate([xy, xy + rng.uniform(8, 300, (B, N, 2))], -1)
)
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


def mk(wide_dot=True, ct=None, quant="none"):
    @jax.jit
    def run(feat, rois, gate):
        acc = None
        for cb in range(0, C, CT):
            r = roi_pool_fused_batched(
                feat, rois, gate, cb, c_take=CT, spatial_scale=scale,
                wide_dot=wide_dot, c_tile=ct, quant=quant,
            )
            x = r[0] if quant in ("int8", "tile8", "maxabs") else r
            v = (
                x[tuple(0 for _ in x.shape)].astype(jnp.float32)
                + x[tuple(-1 for _ in x.shape)].astype(jnp.float32)
            )
            acc = v if acc is None else acc + v
        return acc

    return run


def mk_ct(ct):
    # single call over the whole channel range at c_tile=ct
    @jax.jit
    def run(feat, rois, gate):
        x = roi_pool_fused_batched(
            feat, rois, gate, 0, c_take=C, spatial_scale=scale, c_tile=ct,
        )
        return (
            x[tuple(0 for _ in x.shape)].astype(jnp.float32)
            + x[tuple(-1 for _ in x.shape)].astype(jnp.float32)
        )

    return run


# on-chip exactness gate
a = roi_pool_fused_batched(
    feat, rois_mixed, gate, 0, c_take=CT, spatial_scale=scale, wide_dot=False
)
b = roi_pool_fused_batched(
    feat, rois_mixed, gate, 0, c_take=CT, spatial_scale=scale, wide_dot=True
)
print(f"exact[mixed widedot]: {'OK' if bool(jnp.all(a == b)) else 'MISMATCH'}",
      flush=True)

timeit("mixed  VPU-wide (old)", mk(False), feat, rois_mixed, gate)
timeit("mixed  wide_dot      ", mk(True), feat, rois_mixed, gate)
timeit("wide   VPU-wide (old)", mk(False), feat, rois_wide, gate)
timeit("wide   wide_dot      ", mk(True), feat, rois_wide, gate)
timeit("narrow wide_dot      ", mk(True), feat, rois_narrow, gate)
timeit("mixed  wide_dot ct256", mk(True, ct=256), feat, rois_mixed, gate)
timeit("mixed  wd ct1024 1call", mk_ct(1024), feat, rois_mixed, gate)
timeit("narrow wd ct1024 1call", mk_ct(1024), feat, rois_narrow, gate)
