# Pool-kernel anatomy: what actually costs ~9 us per ROI-c-tile?
"""All-narrow ROI set (rw <= 17 fits both win 24 and 48) pooled at win 24
vs 48 isolates the stage-A walk + stage-B j_cap term; tile8 isolates the
element-width term; a degenerate 1-row ROI set isolates the fixed per-ROI
overhead (scalar sequencing + epilogue).

Usage: python scripts/bench_pool_anatomy.py
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
    r = jnp.concatenate([xy, xy + wh], -1).astype(jnp.float32)
    return r


rois_narrow = mk_rois(130.0, 300.0)  # rw <= 17: fits win 24 AND 48
rois_flat = mk_rois(130.0, 9.0)  # 1-2 feature rows: stage A ~nil
rois_bench = mk_rois(300.0, 300.0)  # the bench's narrow class (rw <= 39)
_u = jax.random.uniform(jax.random.PRNGKey(5), (B, N, 1))
rois_mixed = jnp.where(_u < 0.81, rois_bench, mk_rois(800.0, 700.0))
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


def mk(win=None, quant="none", force_narrow=False, row_unroll=None, ablate="",
       layout="hwnc"):
    @jax.jit
    def run(feat, rois, gate):
        acc = None
        for cb in range(0, C, CT):
            r = roi_pool_fused_batched(
                feat, rois, gate, cb, c_take=CT, spatial_scale=scale,
                win=win, quant=quant, force_narrow=force_narrow,
                row_unroll=row_unroll, ablate=ablate, out_layout=layout,
            )
            x = r[0] if quant in ("int8", "tile8", "maxabs") else r
            v = (
                x[tuple(0 for _ in x.shape)].astype(jnp.float32)
                + x[tuple(-1 for _ in x.shape)].astype(jnp.float32)
            )
            acc = v if acc is None else acc + v
        return acc

    return run


timeit("narrow(rw<=17) win48 bf16", mk(48), feat, rois_narrow, gate)
timeit("narrow(rw<=17) win24 bf16", mk(24), feat, rois_narrow, gate)
timeit("flat(rh<=2)    win48 bf16", mk(48), feat, rois_flat, gate)
timeit("bench(rw<=39)  win48 bf16", mk(48), feat, rois_bench, gate)
# tile8 int8 walk: DEAD on this stack — Mosaic cannot legalize arith.maxsi
# on vector<...xi8> (measured 2026-08-19); keep for future toolchains
timeit("bench(rw<=39)  win48 TILE8", mk(48, "tile8"), feat, rois_bench, gate)
timeit("bench  win48 FORCE-NARROW ", mk(48, force_narrow=True), feat, rois_bench, gate)
timeit("narrow win24 FORCE-NARROW ", mk(24, force_narrow=True), feat, rois_narrow, gate)
timeit("flat   win48 FORCE-NARROW ", mk(48, force_narrow=True), feat, rois_flat, gate)
timeit("flat   win48 FN+UNROLL2   ", mk(48, force_narrow=True, row_unroll=2), feat, rois_flat, gate)
timeit("bench  win48 FN+UNROLL7   ", mk(48, force_narrow=True, row_unroll=7), feat, rois_bench, gate)
timeit("narrow win24 FN+UNROLL7   ", mk(24, force_narrow=True, row_unroll=7), feat, rois_narrow, gate)
timeit("bench FN ABLATE=nodot     ", mk(48, force_narrow=True, ablate="nodot"), feat, rois_bench, gate)
timeit("bench FN ABLATE=nojg      ", mk(48, force_narrow=True, ablate="nojg"), feat, rois_bench, gate)
timeit("bench FN ABLATE=cheapstore", mk(48, force_narrow=True, ablate="cheapstore"), feat, rois_bench, gate)
timeit("bench win48 N56C          ", mk(48, layout="n56c"), feat, rois_bench, gate)
timeit("bench win48 N56C int8     ", mk(48, quant="int8", layout="n56c"), feat, rois_bench, gate)
timeit("mixed-dist  N56C (19% wide)", mk(48, layout="n56c"), feat, rois_mixed, gate)
