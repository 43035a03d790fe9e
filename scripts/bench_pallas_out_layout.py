# Is reading the fused-pool kernel's output more expensive than reading a
# regular XLA array of the same shape/dtype?
"""bench_chain_diag showed every consumer of the pallas [B,7,7,N,CT] bf16
output paying ~90-130 ms over the same consumer on a plain array —
suspected Mosaic-vs-XLA bf16 tiling mismatch ((8,128) sublane-packed vs
(16,128) packed) forcing a retile of each ~2 GB chunk.

Variants (4 chunks of 512, same einsum consumer):
  einsum(plain array)     — baseline consumer cost
  einsum(pallas bf16 out) — shipped path
  einsum(pallas f32 out)  — kernel emits f32 (2x write bytes, natural tiling)

Usage: python scripts/bench_pallas_out_layout.py
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
B, N, CT, F = 8, 5024, 512, 4096
iters = 10

feat16 = jax.jit(
    lambda: jax.random.normal(jax.random.PRNGKey(0), (B, 86, 132, C), jnp.bfloat16)
)()
xy = jax.random.uniform(jax.random.PRNGKey(1), (B, N, 2), minval=0, maxval=634)
wh = jax.random.uniform(jax.random.PRNGKey(2), (B, N, 2), minval=8, maxval=300)
rois = jnp.concatenate([xy, xy + wh], -1).astype(jnp.float32)
gate = jnp.ones((B, N), jnp.float32)
kern = jax.jit(
    lambda: jax.random.normal(jax.random.PRNGKey(9), (7, 7, C, F), jnp.bfloat16) * 0.005
)()
pre_chunk = jax.jit(
    lambda: jax.random.normal(jax.random.PRNGKey(3), (B, 7, 7, N, CT), jnp.bfloat16)
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


@jax.jit
def einsum_plain(pre, kern):
    acc = None
    for cb in range(0, C, CT):
        ks = jax.lax.slice_in_dim(kern, cb, cb + CT, axis=2)
        y = jnp.einsum("bhwnc,hwcf->bnf", pre, ks, preferred_element_type=jnp.float32)
        acc = y if acc is None else acc + y
    return acc


def make_chain(feat_dtype):
    @jax.jit
    def chain(feat, rois, gate, kern):
        acc = None
        for cb in range(0, C, CT):
            r = roi_pool_fused_batched(
                feat, rois, gate, cb, c_take=CT, spatial_scale=scale
            )
            ks = jax.lax.slice_in_dim(kern, cb, cb + CT, axis=2)
            y = jnp.einsum(
                "bhwnc,hwcf->bnf", r, ks, preferred_element_type=jnp.float32
            )
            acc = y if acc is None else acc + y
        return acc

    return chain


timeit("einsum x4 (plain bf16 array)  ", einsum_plain, pre_chunk, kern)
timeit("pool+einsum x4 (pallas bf16)  ", make_chain(jnp.bfloat16), feat16, rois, gate, kern)
feat32 = feat16.astype(jnp.float32)
timeit("pool+einsum x4 (pallas f32)   ", make_chain(jnp.float32), feat32, rois, gate, kern)
