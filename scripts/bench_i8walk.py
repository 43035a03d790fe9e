"""Microbench: stage-A row walk with int8 resident tiles, widened to bf16
on load.

The round-5 diagnostic measured the fused-pool stage-A walk at VMEM
load-port speed of light (~1.9 TB/s reads: 26 ns per [48, 512] bf16 row,
87 ns per [136, 512] row).  If Mosaic legalizes dynamic-row loads from an
int8 VMEM tile plus an i8->bf16 vector widen, the walk's bytes halve and
the walk should approach ~13/~45 ns per row.  This bench answers, on-chip:

  A. bf16 full-row walk          (baseline, expect ~87 ns/row)
  B. int8 full-row walk + widen  (target ~45 ns/row)
  C. bf16 win=48 x0-sliced walk  (baseline, expect ~26 ns/row)
  D. int8 win=48 x0-sliced walk  (8-aligned x0 against the (32,128) int8
     tile -- may not legalize; the try/except records that verdict)
  E. int8 win=96 (loop-pool narrow window)

Exactness is not at issue here (max commutes with a positive per-channel
scale; the production path is guarded by tests/test_golden_eval_int8.py);
this measures legality + speed of the load pattern only.
"""
import sys, os, time
sys.path.insert(0, os.getcwd())
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

H, W, CT = 86, 136, 512
P, RB = 7, 8
NB = 628  # 5024 ROIs
ROWS = 3  # rows folded per bin


def build(dtype, win):
    wd = W if win is None else win

    def kern(hlo_s, x0_s, feat_hbm, out_ref, full, sem):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            cp = pltpu.make_async_copy(feat_hbm, full, sem)
            cp.start()
            cp.wait()

        def roi(r, _):
            base = (i * RB + r) * P
            for ph in range(P):
                hlo = hlo_s[base + ph]
                x0 = x0_s[base + ph]

                def body(t, acc):
                    if win is None:
                        row = full[0, hlo + t]
                    else:
                        row = full[0, hlo + t, pl.ds(x0, win)]
                    return jnp.maximum(acc, row.astype(jnp.bfloat16))

                acc = jax.lax.fori_loop(
                    0, ROWS, body,
                    jnp.full((wd, CT), jnp.bfloat16(-3e38), jnp.bfloat16),
                    unroll=False,
                )
                out_ref[ph] = acc
            return 0

        jax.lax.fori_loop(0, RB, roi, 0, unroll=False)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(NB,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((P, wd, CT), lambda i, *_: (0, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((1, H, W, CT), dtype),
            pltpu.SemaphoreType.DMA,
        ],
    )
    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((P, wd, CT), jnp.bfloat16),
    )


def main():
    rng = np.random.RandomState(0)
    feat_f = rng.randn(1, H, W, CT).astype(np.float32)
    feats = {
        "bf16": jnp.asarray(feat_f, jnp.bfloat16),
        "int8": jnp.asarray(
            np.clip(feat_f * 16, -127, 127).astype(np.int8)
        ),
    }
    n_meta = NB * RB * P
    hlo = jnp.asarray(rng.randint(0, H - ROWS, n_meta).astype(np.int32))

    rows_per_iter = n_meta * ROWS
    cases = [
        ("A bf16 fullrow", "bf16", None),
        ("B int8 fullrow", "int8", None),
        ("C bf16 win48  ", "bf16", 48),
        ("D int8 win48  ", "int8", 48),
        ("E int8 win96  ", "int8", 96),
        ("F bf16 win96  ", "bf16", 96),
    ]
    for name, dt, win in cases:
        wlim = W - (win or W)
        x0 = jnp.asarray(
            (rng.randint(0, wlim // 8 + 1, n_meta) * 8).astype(np.int32)
        )
        try:
            fn = jax.jit(build(feats[dt].dtype, win))
            out = fn(hlo, x0, feats[dt])
            np.asarray(out[0, 0, 0:1])
            t0 = time.perf_counter()
            it = 10
            for _ in range(it):
                out = fn(hlo, x0, feats[dt])
            np.asarray(out[0, 0, 0:1] + out[-1, -1, -1:])
            ms = (time.perf_counter() - t0) / it * 1000
            print(
                f"{name}: {ms:7.2f} ms  "
                f"({ms * 1e6 / rows_per_iter:6.1f} ns/row)",
                flush=True,
            )
        except Exception as e:  # noqa: BLE001 - verdict capture
            print(f"{name}: FAILED {type(e).__name__}: {str(e)[:300]}",
                  flush=True)


if __name__ == "__main__":
    main()
