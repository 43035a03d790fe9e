# fc1-layout probe: hwnc einsum vs flat GEMM from the same pooled chunk
"""Measures the cost of contracting fc1 straight from the fused pool
kernels' hwnc chunk layout ([B, 7, 7, N, ct] -> einsum "bhwnc,hwcf->bnf")
vs a pre-flattened [B, N, 49*ct] row layout ([.., k] x [k, f] GEMM).

The chain microbench (scripts/bench_maxpool_kernel.py chain) measures
pool+fc1 ~100 ms above the sum of pool-only and flat-fc1 — hypothesis:
XLA physically transposes each ~2 GB hwnc chunk into the flat layout
before the GEMM. If flat wins here, the kernels should emit flat rows.

Usage: python scripts/bench_fc1_layout.py [bf16|int8|all]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import jax.numpy as jnp
import numpy as np

mode = sys.argv[1] if len(sys.argv) > 1 else "all"
B, N, CT, F, S = 8, 5024, 512, 4096, 7
iters = 10

chunk_hwnc = jax.jit(
    lambda: jax.random.normal(jax.random.PRNGKey(0), (B, S, S, N, CT), jnp.bfloat16)
)()
chunk_flat = jax.jit(
    lambda: jax.random.normal(jax.random.PRNGKey(0), (B, N, S * S * CT), jnp.bfloat16)
)()
kern = jax.jit(
    lambda: jax.random.normal(jax.random.PRNGKey(1), (S, S, CT, F), jnp.bfloat16) * 0.01
)()


def fetch(o):
    np.asarray(jax.tree_util.tree_leaves(o)[0].ravel()[0:1])


def timeit(name, fn, *args):
    out = fn(*args)
    fetch(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    fetch(out)
    print(f"{name}: {(time.perf_counter() - t0) / iters * 1000:.2f} ms", flush=True)


# NOTE: return the FULL product — slicing inside jit lets XLA narrow the
# GEMM to the sliced row/col and the timing lies (first version of this
# probe reported 2.6 ms for an 84 ms-roofline GEMM that way)
@jax.jit
def hwnc_bf16(x, k):
    return jnp.einsum("bhwnc,hwcf->bnf", x, k, preferred_element_type=jnp.float32)


@jax.jit
def flat_bf16(x, k):
    kf = k.reshape(S * S * CT, F)
    return jnp.einsum("bnk,kf->bnf", x, kf, preferred_element_type=jnp.float32)


def quant_rows(x, red_axes):
    m = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=red_axes, keepdims=True)
    s = jnp.maximum(m, 1e-8) / 127.0
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / s), -127, 127).astype(jnp.int8)
    return q, s


@jax.jit
def hwnc_int8(x, k):
    q, s = quant_rows(x, (1, 2, 4))
    kf = k.astype(jnp.float32)
    s_w = jnp.max(jnp.abs(kf), axis=(0, 1, 2)) / 127.0
    kq = jnp.clip(jnp.round(kf / s_w), -127, 127).astype(jnp.int8)
    y = jnp.einsum("bhwnc,hwcf->bnf", q, kq, preferred_element_type=jnp.int32)
    y = y.astype(jnp.float32) * jnp.squeeze(s, (1, 2, 4))[..., None] * s_w
    return y


@jax.jit
def flat_int8(x, k):
    q, s = quant_rows(x, (2,))
    kf = k.reshape(S * S * CT, F).astype(jnp.float32)
    s_w = jnp.max(jnp.abs(kf), axis=0) / 127.0
    kq = jnp.clip(jnp.round(kf / s_w), -127, 127).astype(jnp.int8)
    y = jnp.einsum("bnk,kf->bnf", q, kq, preferred_element_type=jnp.int32)
    y = y.astype(jnp.float32) * s * s_w
    return y


if mode in ("bf16", "all"):
    timeit("fc1 chunk bf16 hwnc einsum", hwnc_bf16, chunk_hwnc, kern)
    timeit("fc1 chunk bf16 flat GEMM  ", flat_bf16, chunk_flat, kern)
if mode in ("int8", "all"):
    timeit("fc1 chunk int8 hwnc einsum", hwnc_int8, chunk_hwnc, kern)
    timeit("fc1 chunk int8 flat GEMM  ", flat_int8, chunk_flat, kern)
