# VPU packing microbench: is jnp.maximum over f32/bf16/int8 rows packed?
"""Measures a stage-A-like row-fold (carry max over [48, 512] slabs) for
f32 / bf16 / int8 element types. If the VPU packs bf16 2-per-lane and int8
4-per-lane, the per-element walk cost should halve at each step — that sets
the ceiling for an int8 resident-tile walk in the fused pool kernel.

Usage: python scripts/bench_vpu_pack.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

H, W, CT = 86, 136, 512
ROWS = 20  # rows folded per pseudo-ROI
NROI = 256  # pseudo-ROIs per grid step
WIN = 48


def mk(dtype):
    neg = {jnp.float32: -3e38, jnp.bfloat16: -3e38, jnp.int8: -127}[dtype]

    def kern(seed_ref, feat, out_ref, full, sem):
        @pl.when(pl.program_id(0) == 0)
        def _():
            cp = pltpu.make_async_copy(feat, full, sem)
            cp.start()
            cp.wait()

        for r in range(NROI):
            h0 = (r * 7) % (H - ROWS)
            x0 = ((r * 13) % ((W - WIN) // 8)) * 8

            def body(h, acc):
                return jnp.maximum(acc, full[h, pl.ds(x0, WIN)])

            acc = jax.lax.fori_loop(
                h0, h0 + ROWS, body,
                jnp.full((WIN, CT), neg, dtype), unroll=False,
            )
            out_ref[0, :, :] = acc

    @jax.jit
    def run(feat):
        return pl.pallas_call(
            kern,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(8,),
                in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
                out_specs=pl.BlockSpec((1, WIN, CT), lambda i, *_: (i, 0, 0)),
                scratch_shapes=[
                    pltpu.VMEM((H, W, CT), dtype),
                    pltpu.SemaphoreType.DMA,
                ],
            ),
            out_shape=jax.ShapeDtypeStruct((8, WIN, CT), dtype),
        )(jnp.zeros((1,), jnp.int32), feat)

    return run


def fetch(o):
    np.asarray(jax.tree_util.tree_leaves(o)[0].ravel()[0:1])


for dt, name in ((jnp.float32, "f32 "), (jnp.bfloat16, "bf16"), (jnp.int8, "int8")):
    feat = jax.jit(
        lambda dt=dt: (jax.random.normal(jax.random.PRNGKey(0), (H, W, CT)) * 10)
        .astype(dt)
    )()
    run = mk(dt)
    try:
        out = run(feat)
        fetch(out)
        t0 = time.perf_counter()
        for _ in range(20):
            out = run(feat)
        fetch(out)
        dt_ms = (time.perf_counter() - t0) / 20 * 1000
        elems = 8 * NROI * ROWS * WIN * CT
        print(f"{name}: {dt_ms:7.2f} ms  ({elems/dt_ms*1e3/1e9:.1f} Gelem/s)", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"{name}: FAILED {type(e).__name__}: {str(e)[:200]}", flush=True)
