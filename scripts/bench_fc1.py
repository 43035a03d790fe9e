"""fc1 microbenchmark: bf16 chunked einsum vs int8 MXU path, plus accuracy.

fc1 is the model's FLOP wall (2*(49*2048)*4096 ~ 822 MFLOP/proposal). v5e's
MXU does int8 at 2x bf16 throughput; this measures the real gain and the
quantization error of per-row dynamic activation scales x per-column weight
scales at the bench shape.

Usage: python scripts/bench_fc1.py [reps]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp


def quant_int8_matmul(x, w_i8, s_w, bias):
    """x [M, K] bf16 -> per-row int8 quant -> int8 matmul -> rescale.

    w_i8 [K, N] int8, s_w [N] f32 per-column scales."""
    ax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=1, keepdims=True)
    s_a = jnp.maximum(ax, 1e-8) / 127.0
    x_i8 = jnp.clip(
        jnp.round(x.astype(jnp.float32) / s_a), -127, 127
    ).astype(jnp.int8)
    acc = jax.lax.dot_general(
        x_i8, w_i8, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    return acc.astype(jnp.float32) * s_a * s_w[None, :] + bias[None, :]


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    B, P = 8, 5024
    K1, N = 49 * 512, 4096  # per 512-channel chunk
    rng = np.random.RandomState(0)

    # realistic-ish activations: ReLU'd features scaled by gate
    # generate ON DEVICE: 16 GB of host data through the axon tunnel takes
    # minutes; content barely matters for timing/quant stats
    keys = jax.random.split(jax.random.PRNGKey(0), 4)
    make = jax.jit(
        lambda k: jnp.abs(
            jax.random.normal(k, (B * P, K1), jnp.bfloat16)
        )
    )
    chunks = [make(k) for k in keys]
    w = rng.randn(4 * K1, N).astype(np.float32) * 0.005
    bias = rng.randn(N).astype(np.float32) * 0.1
    w_bf = jnp.asarray(w).astype(jnp.bfloat16)
    bias_j = jnp.asarray(bias)

    # per-column int8 weights
    s_w = np.maximum(np.abs(w).max(axis=0), 1e-8) / 127.0
    w_i8 = jnp.asarray(np.clip(np.round(w / s_w[None, :]), -127, 127).astype(np.int8))
    s_w = jnp.asarray(s_w.astype(np.float32))

    @jax.jit
    def run_bf16(chunks, w_bf, bias_j):
        out = None
        cs = chunks
        for _ in range(reps):
            acc = None
            for i, c in enumerate(cs):
                y = jax.lax.dot_general(
                    c, w_bf[i * K1 : (i + 1) * K1],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                acc = y if acc is None else acc + y
            out = (acc + bias_j).astype(jnp.bfloat16)
            cs = [c + out[0, 0].astype(c.dtype) * 0 for c in cs]
        return out

    @jax.jit
    def run_int8(chunks, w_i8, s_w, bias_j):
        out = None
        cs = chunks
        for _ in range(reps):
            acc = None
            for i, c in enumerate(cs):
                y = quant_int8_matmul(
                    c, w_i8[i * K1 : (i + 1) * K1], s_w, jnp.zeros((N,), jnp.float32)
                )
                acc = y if acc is None else acc + y
            out = (acc + bias_j).astype(jnp.bfloat16)
            cs = [c + out[0, 0].astype(c.dtype) * 0 for c in cs]
        return out

    def timeit(name, fn, *args):
        out = fn(*args)
        np.asarray(out.ravel()[:1])
        t0 = time.perf_counter()
        out = fn(*args)
        np.asarray(out.ravel()[:1])
        dt = (time.perf_counter() - t0) / reps * 1000
        print(f"{name}: {dt:.2f} ms/iter", flush=True)
        return out

    o_bf = timeit("fc1 bf16 (4x512 chunks)", run_bf16, chunks, w_bf, bias_j)
    o_i8 = timeit("fc1 int8 per-row dyn    ", run_int8, chunks, w_i8, s_w, bias_j)

    # int4 probe: does v5e run int4 x int4 dot_general above the int8 rate?
    # (Trillium has native int4; on v5e this may upcast and win nothing —
    # measure before building a real int4 fc1 path.)
    try:
        w_i4 = jnp.clip(jnp.round(jnp.asarray(w) / (s_w * 8.0)[None, :]), -7, 7).astype(jnp.int4)
        x_i4 = jnp.clip(jnp.round(chunks[0].astype(jnp.float32) * 2.0), -7, 7).astype(jnp.int4)

        @jax.jit
        def run_int4(x4, w4):
            out = None
            xx = x4
            for _ in range(reps):
                acc = None
                for i in range(4):
                    y = jax.lax.dot_general(
                        xx, w4[i * K1 : (i + 1) * K1],
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.int32,
                    )
                    acc = y if acc is None else acc + y
                out = acc
                xx = (x4.astype(jnp.int32) + (out[0, 0] * 0)).astype(jnp.int4)
            return out

        timeit("fc1 int4 x int4 probe   ", run_int4, x_i4, w_i4)
    except Exception as e:  # int4 may not lower on this backend at all
        print(f"int4 probe failed: {type(e).__name__}: {e}")

    a = np.asarray(o_bf[:4096].astype(jnp.float32))
    b = np.asarray(o_i8[:4096].astype(jnp.float32))
    denom = np.abs(a).max()
    rel = np.abs(a - b) / max(denom, 1e-8)
    cos = float(
        (a * b).sum() / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-9)
    )
    print(
        f"int8 vs bf16: max-rel {rel.max():.4f} p99-rel {np.percentile(rel, 99):.4f} cos {cos:.6f}"
    )


if __name__ == "__main__":
    main()
