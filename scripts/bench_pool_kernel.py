"""Microbenchmark: pooling kernels at the bench shape (one TPU chip).

Times the round-1 exact per-image path vs the round-2 fused image-batched
resident-tile kernel, via REPS serialized in-jit invocations (per-call wall
timings through the axon tunnel are unreliable).

Usage: python scripts/bench_pool_kernel.py [fused|old|both] [reps]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    B, H, W, C = 4, 86, 132, 2048
    N = 5024
    scale = 1.0 / 8
    rng = np.random.RandomState(0)
    feat = jnp.asarray(rng.randn(B, H, W, C).astype(np.float32)).astype(jnp.bfloat16)
    xy = rng.uniform(0, 800, (B, N, 2))
    wh = rng.uniform(8, 300, (B, N, 2))
    rois = jnp.asarray(np.concatenate([xy, xy + wh], -1).astype(np.float32))
    gate = jnp.asarray(rng.uniform(0.5, 2.0, (B, N)).astype(np.float32))

    def timeit(name, fn, *args):
        out = fn(*args)
        np.asarray(jax.tree_util.tree_leaves(out)[0][0, 0])  # force fetch
        t0 = time.perf_counter()
        out = fn(*args)
        np.asarray(jax.tree_util.tree_leaves(out)[0][0, 0])
        dt = (time.perf_counter() - t0) / reps * 1000
        print(f"{name}: {dt:.2f} ms/iter ({reps} serialized reps)", flush=True)
        return dt

    if which in ("fused", "both"):
        from wsovod_tpu.ops.pallas.roi_align_fused import roi_align_fused_batched

        @jax.jit
        def run_fused(feat, rois, gate):
            out = None
            r = rois
            for _ in range(reps):
                out = roi_align_fused_batched(feat, r, gate, spatial_scale=scale)
                r = rois + (out[0, 0, 0, 0, 0] * 0).astype(rois.dtype)
            return out

        timeit("fused  batched (full C)", run_fused, feat, rois, gate)

        @jax.jit
        def run_fused_chunk(feat, rois, gate):
            out = None
            r = rois
            for _ in range(reps):
                outs = []
                for cb in range(0, C, 512):
                    outs.append(
                        roi_align_fused_batched(
                            feat, r, gate, c_base=cb, c_take=512, spatial_scale=scale
                        )
                    )
                out = jnp.concatenate(outs, -1)
                r = rois + (out[0, 0, 0, 0, 0] * 0).astype(rois.dtype)
            return out

        timeit("fused  batched (4x512 chunks)", run_fused_chunk, feat, rois, gate)

    if which in ("old", "both"):
        from wsovod_tpu.ops.pallas.roi_align_kernel import roi_align_pallas_exact

        @jax.jit
        def run_old(feat, rois, gate):
            out = None
            r = rois
            for _ in range(reps):
                pooled = [
                    roi_align_pallas_exact(feat[b], r[b], 7, scale) for b in range(B)
                ]
                out = jnp.stack(pooled) * gate[:, :, None, None, None].astype(
                    pooled[0].dtype
                )
                r = rois + (out[0, 0, 0, 0, 0] * 0).astype(rois.dtype)
            return out

        timeit("old exact per-image + gate", run_old, feat, rois, gate)




def sweep():
    import itertools
    from wsovod_tpu.ops.pallas.roi_align_fused import roi_align_fused_batched

    B, H, W, C = 4, 86, 132, 2048
    N = 5024
    scale = 1.0 / 8
    reps = 8
    rng = np.random.RandomState(0)
    feat = jnp.asarray(rng.randn(B, H, W, C).astype(np.float32)).astype(jnp.bfloat16)
    xy = rng.uniform(0, 800, (B, N, 2))
    wh = rng.uniform(8, 300, (B, N, 2))
    rois = jnp.asarray(np.concatenate([xy, xy + wh], -1).astype(np.float32))
    gate = jnp.asarray(rng.uniform(0.5, 2.0, (B, N)).astype(np.float32))

    for c_take, c_tile, rb in itertools.product((2048, 512, 256), (256, 128), (16, 32, 64)):
        if c_take < c_tile:
            continue

        @jax.jit
        def run(feat, rois, gate, c_take=c_take, c_tile=c_tile, rb=rb):
            out = None
            r = rois
            for _ in range(reps):
                outs = []
                for cb in range(0, C, c_take):
                    outs.append(
                        roi_align_fused_batched(
                            feat, r, gate, c_base=cb, c_take=c_take,
                            c_tile=c_tile, roi_block=rb, spatial_scale=scale,
                        )
                    )
                out = jnp.concatenate(outs, -1) if len(outs) > 1 else outs[0]
                r = rois + (out[0, 0, 0, 0, 0] * 0).astype(rois.dtype)
            return out

        try:
            out = run(feat, rois, gate)
            np.asarray(out[0, 0, 0, 0, 0])
            t0 = time.perf_counter()
            out = run(feat, rois, gate)
            np.asarray(out[0, 0, 0, 0, 0])
            dt = (time.perf_counter() - t0) / reps * 1000
            print(f"c_take={c_take} c_tile={c_tile} rb={rb}: {dt:.2f} ms", flush=True)
        except Exception as e:
            print(f"c_take={c_take} c_tile={c_tile} rb={rb}: FAIL {str(e)[:100]}", flush=True)


if __name__ == "__main__" and len(sys.argv) > 1 and sys.argv[1] == "sweep":
    sweep()
elif __name__ == "__main__":
    main()
