# Chain-gap isolation: same-program vs split-dispatch pool->fc1
"""bench_pallas_out_layout pinned the chain gap to the einsum consuming the
pallas output INSIDE one XLA program (+~88 ms over einsum-on-plain-array;
components add exactly when independent). Here:

  one-jit chain      — shipped structure (baseline ~365 ms)
  two-jit chain      — pool chunk in its own jit, einsum in another;
                       chunks already materialize in HBM either way
  one-jit, 1 chunk   — c_take=2048 single kernel call + single einsum
                       (does the gap scale per-chunk or per-program?)

Usage: python scripts/bench_chain_split.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import functools

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
def one_jit(feat, rois, gate, kern):
    acc = None
    for cb in range(0, C, CT):
        r = roi_pool_fused_batched(feat, rois, gate, cb, c_take=CT, spatial_scale=scale)
        ks = jax.lax.slice_in_dim(kern, cb, cb + CT, axis=2)
        y = jnp.einsum("bhwnc,hwcf->bnf", r, ks, preferred_element_type=jnp.float32)
        acc = y if acc is None else acc + y
    return acc


@functools.partial(jax.jit, static_argnums=3)
def pool_jit(feat, rois, gate, cb):
    return roi_pool_fused_batched(feat, rois, gate, cb, c_take=CT, spatial_scale=scale)


@functools.partial(jax.jit, static_argnums=2)
def fc1_jit(r, kern, cb, acc=None):
    ks = jax.lax.slice_in_dim(kern, cb, cb + CT, axis=2)
    y = jnp.einsum("bhwnc,hwcf->bnf", r, ks, preferred_element_type=jnp.float32)
    return y if acc is None else acc + y


def two_jit(feat, rois, gate, kern):
    acc = None
    for cb in range(0, C, CT):
        r = pool_jit(feat, rois, gate, cb)
        acc = fc1_jit(r, kern, cb, acc)
    return acc


@jax.jit
def one_chunk(feat, rois, gate, kern):
    r = roi_pool_fused_batched(feat, rois, gate, 0, c_take=C, spatial_scale=scale)
    return jnp.einsum("bhwnc,hwcf->bnf", r, kern, preferred_element_type=jnp.float32)


timeit("one-jit chain x4 chunks   ", one_jit, feat, rois, gate, kern)
timeit("two-jit chain x4 chunks   ", two_jit, feat, rois, gate, kern)
timeit("one-jit single 2048 chunk ", one_chunk, feat, rois, gate, kern)
