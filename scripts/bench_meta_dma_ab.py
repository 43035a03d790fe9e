# meta_dma vs prefetch A/B at the bench shape (scalar consumer, j_cap fixed).
"""B=8 meta_dma (one call) vs B=4x2 prefetch (two calls) vs B=8 forced
prefetch... the last is impossible (SMEM overflow), so the B=4x2 pair is the
prefetch reference. Scalar consumer = kernel cost only.

Usage: python scripts/bench_meta_dma_ab.py
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
iters = 10

feat = jax.jit(
    lambda: jax.random.normal(jax.random.PRNGKey(0), (B, 86, 132, C), jnp.bfloat16)
)()
xy = jax.random.uniform(jax.random.PRNGKey(1), (B, N, 2), minval=0, maxval=634)
wh = jax.random.uniform(jax.random.PRNGKey(2), (B, N, 2), minval=8, maxval=300)
rois = jnp.concatenate([xy, xy + wh], -1).astype(jnp.float32)
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


def mk(dma, nb, layout="hwnc"):
    @jax.jit
    def run(feat, rois, gate):
        acc = None
        step = B // nb
        for cb in range(0, C, CT):
            for i in range(0, B, step):
                sl = slice(i, i + step)
                r = roi_pool_fused_batched(
                    feat[sl], rois[sl], gate[sl], cb, c_take=CT,
                    spatial_scale=scale, meta_dma=dma, out_layout=layout,
                )
                v = r[tuple(0 for _ in r.shape)].astype(jnp.float32)
                acc = v if acc is None else acc + v
        return acc

    return run


timeit("hwnc meta_dma  B=8   (scalar)", mk(True, 1), feat, rois, gate)
timeit("hwnc meta_dma  B=4x2 (scalar)", mk(True, 2), feat, rois, gate)
timeit("hwnc prefetch  B=4x2 (scalar)", mk(False, 2), feat, rois, gate)
timeit("hwnc prefetch  B=2x4 (scalar)", mk(False, 4), feat, rois, gate)
timeit("nhwc meta_dma  B=8   (scalar)", mk(True, 1, "nhwc"), feat, rois, gate)
