# Stage-B A/B: 7 per-ph gather dots vs ONE block-diagonal dot ("bd").
"""The 7 small [56,48]x[48,CT] dots measured ~67 ms of the 183 ms bench
sweep at ~3% MXU efficiency (per-dot fill/drain dominated). The bd form
trades 7x MAC waste for a single [392,336]x[336,CT] fill/drain.

Usage: python scripts/bench_stage_b.py
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


def mk_rois(wmax, hmax):
    wh = jax.random.uniform(
        jax.random.PRNGKey(2), (B, N, 2), minval=8,
        maxval=jnp.asarray([wmax, hmax], jnp.float32),
    )
    return jnp.concatenate([xy, xy + wh], -1).astype(jnp.float32)


rois_bench = mk_rois(300.0, 300.0)  # narrow class (rw <= 39)
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


def mk(win=None, quant="none", force_narrow=False, layout="hwnc",
       stage_b="dots"):
    @jax.jit
    def run(feat, rois, gate):
        acc = None
        for cb in range(0, C, CT):
            r = roi_pool_fused_batched(
                feat, rois, gate, cb, c_take=CT, spatial_scale=scale,
                win=win, quant=quant, force_narrow=force_narrow,
                out_layout=layout, stage_b=stage_b,
            )
            x = r[0] if quant in ("int8", "tile8", "maxabs") else r
            v = (
                x[tuple(0 for _ in x.shape)].astype(jnp.float32)
                + x[tuple(-1 for _ in x.shape)].astype(jnp.float32)
            )
            acc = v if acc is None else acc + v
        return acc

    return run


# on-chip exactness gate first (exact gathers -> bit-equal)
def check(desc, **kw):
    a = roi_pool_fused_batched(
        feat, rois_bench, gate, 0, c_take=CT, spatial_scale=scale,
        stage_b="dots", **kw,
    )
    b = roi_pool_fused_batched(
        feat, rois_bench, gate, 0, c_take=CT, spatial_scale=scale,
        stage_b="bd", **kw,
    )
    ok = bool(jnp.all(a == b))
    print(f"exact[{desc}]: {'OK' if ok else 'MISMATCH'}", flush=True)


check("win48 fn", win=48, force_narrow=True)
check("win48 n56c", win=48, out_layout="n56c")

timeit("bench FN win48 dots", mk(48, force_narrow=True), feat, rois_bench, gate)
timeit("bench FN win48 bd  ", mk(48, force_narrow=True, stage_b="bd"), feat, rois_bench, gate)
timeit("bench n56c dots    ", mk(48, layout="n56c"), feat, rois_bench, gate)
timeit("bench n56c bd      ", mk(48, layout="n56c", stage_b="bd"), feat, rois_bench, gate)
timeit("bench n56c int8 dots", mk(48, quant="int8", layout="n56c"), feat, rois_bench, gate)
timeit("bench n56c int8 bd ", mk(48, quant="int8", layout="n56c", stage_b="bd"), feat, rois_bench, gate)
