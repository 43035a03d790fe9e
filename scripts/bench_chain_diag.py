# Chain-gap diagnostic: why is pool+fc1-in-one-jit ~90 ms > sum of parts?
"""bench_maxpool_kernel chain (pool -> fc1 einsum, one jit) measures ~364 ms
bf16 vs pool-only 92 + einsum-only 187 = 279. Candidate costs:

  a) consuming the pallas output in an einsum forces an XLA relayout copy
  b) scheduling: per-chunk kernel->einsum alternation leaves MXU bubbles

Variants (all one jit, 4 chunks of 512):
  chain      — einsum reads the kernel output (the shipped path)
  broken-dep — einsum reads a pre-materialized chunk; kernel output is
               consumed by a cheap elementwise sum (both still execute)
  copy-only  — kernel output consumed by an elementwise sum only (price of
               a full read of the pooled output, no fc1)

Usage: python scripts/bench_chain_diag.py
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

feat = jax.jit(
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


def pool_chunk(f, r, g, cb):
    # NB: args must be the traced values — module-level closure capture
    # embeds the concrete arrays as HLO constants and the axon remote
    # compile rejects the request (HTTP 413)
    return roi_pool_fused_batched(f, r, g, cb, c_take=CT, spatial_scale=scale)


@jax.jit
def chain(feat, rois, gate, kern):
    acc = None
    for cb in range(0, C, CT):
        r = pool_chunk(feat, rois, gate, cb)
        ks = jax.lax.slice_in_dim(kern, cb, cb + CT, axis=2)
        y = jnp.einsum("bhwnc,hwcf->bnf", r, ks, preferred_element_type=jnp.float32)
        acc = y if acc is None else acc + y
    return acc


@jax.jit
def broken_dep(feat, rois, gate, kern, pre):
    acc = None
    for cb in range(0, C, CT):
        r = pool_chunk(feat, rois, gate, cb)
        ks = jax.lax.slice_in_dim(kern, cb, cb + CT, axis=2)
        y = jnp.einsum("bhwnc,hwcf->bnf", pre, ks, preferred_element_type=jnp.float32)
        # consume the kernel output cheaply so it still runs
        y = y + jnp.sum(r.astype(jnp.float32), axis=(1, 2, 4))[..., None]
        acc = y if acc is None else acc + y
    return acc


@jax.jit
def copy_only(feat, rois, gate):
    acc = None
    for cb in range(0, C, CT):
        r = pool_chunk(feat, rois, gate, cb)
        y = jnp.sum(r.astype(jnp.float32), axis=(1, 2, 4))
        acc = y if acc is None else acc + y
    return acc


timeit("chain (einsum reads kernel out)", chain, feat, rois, gate, kern)
timeit("broken-dep (einsum reads const)", broken_dep, feat, rois, gate, kern, pre_chunk)
timeit("copy-only (read kernel out)    ", copy_only, feat, rois, gate)
