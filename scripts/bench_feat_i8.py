"""On-chip A/B for the round-5 int8-feature-tile levers.

1. Plain pool, narrow win48 force program (the 80% segment of the honest
   mix): default bf16 vs tile8-hybrid (int8 tiles, widen-on-load bands,
   int8 payload) vs FEAT_I8 (int8 tiles, bf16 payload).
2. Loop pool (ROILoopPool, the MRRP wall): default bf16 ct256 vs FEAT_I8
   ct256 vs FEAT_I8 ct512 (int8 tiles halve the resident-tile VMEM, which
   freed the ct512 budget the bf16 loop pool could not afford).

Dispatch-loop timing, every-output-region consumers (no DCE), cost must
scale with batch (TODO.md BENCHMARK RULE).
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
rng = np.random.RandomState(0)
xy = rng.uniform(0, 634, (B, N, 2))
rois_n = jnp.asarray(
    np.concatenate([xy, xy + rng.uniform(8, 300, (B, N, 2))], -1).astype(np.float32)
)
gate = jnp.ones((B, N), jnp.float32)


def fetch(o):
    leaves = jax.tree_util.tree_leaves(o)
    np.asarray(leaves[0].ravel()[0:1])


def timeit(name, fn, *args):
    try:
        out = fn(*args)
        fetch(out)
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        fetch(out)
        print(f"{name}: {(time.perf_counter() - t0) / iters * 1000:7.1f} ms",
              flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"{name}: FAILED {type(e).__name__}: {str(e)[:240]}", flush=True)


def mk_plain(quant, **kw):
    def run(feat, rois, gate):
        acc = None
        for cb in range(0, C, CT):
            r = roi_pool_fused_batched(
                feat, rois, gate, cb, c_take=CT, spatial_scale=scale,
                win=48, force_narrow=True, quant=quant, **kw,
            )
            x = r[0] if isinstance(r, tuple) else r
            v = (x[tuple(0 for _ in x.shape)].astype(jnp.float32)
                 + x[tuple(-1 for _ in x.shape)].astype(jnp.float32))
            if isinstance(r, tuple):
                v = v + r[1].ravel()[0] + r[1].ravel()[-1]
            acc = v if acc is None else acc + v
        return acc
    return jax.jit(run)


def mk_loop(c_tile):
    def run(feat, rois, gate):
        acc = None
        for cb in range(0, C, c_tile):
            r = roi_pool_fused_batched(
                feat, rois, gate, cb, c_take=c_tile, spatial_scale=scale,
                loop_pool=True, win=96, force_narrow=True, c_tile=c_tile,
            )
            v = (r[tuple(0 for _ in r.shape)].astype(jnp.float32)
                 + r[tuple(-1 for _ in r.shape)].astype(jnp.float32))
            acc = v if acc is None else acc + v
        return acc
    return jax.jit(run)


which = sys.argv[1] if len(sys.argv) > 1 else "all"

if which in ("all", "plain"):
    os.environ.pop("WSOVOD_POOL_FEAT_I8", None)
    timeit("plain narrow bf16 (base)   ", mk_plain(None), feat, rois_n, gate)
    timeit("plain narrow tile8 hybrid  ", mk_plain("tile8"), feat, rois_n, gate)
    os.environ["WSOVOD_POOL_FEAT_I8"] = "1"
    timeit("plain narrow FEAT_I8       ", mk_plain(None), feat, rois_n, gate)
    os.environ.pop("WSOVOD_POOL_FEAT_I8", None)

if which in ("all", "loop"):
    os.environ.pop("WSOVOD_POOL_FEAT_I8", None)
    timeit("loop narrow bf16 ct256     ", mk_loop(256), feat, rois_n, gate)
    os.environ["WSOVOD_POOL_FEAT_I8"] = "1"
    timeit("loop narrow FEAT_I8 ct256  ", mk_loop(256), feat, rois_n, gate)
    timeit("loop narrow FEAT_I8 ct512  ", mk_loop(512), feat, rois_n, gate)
    os.environ.pop("WSOVOD_POOL_FEAT_I8", None)
