# Chain-gap isolation, step 4: barrier/copy variants + device trace.
"""bench_chain_data: fc1 on the materialized pooled output (computed once,
re-read 10x) is FULL SPEED. The gap only appears when pool + consumer run
freshly each iteration (one jit OR alternating jits). Variants:

  chain            — baseline (pool -> einsum, one jit)
  chain-barrier    — einsum(optimization_barrier(pool_out))
  chain-copy       — pool -> barrier -> +0 copy -> barrier -> einsum
                     (who pays: the copy or the einsum?)
  pool-only        — kernel only, one-element consumer
  einsum-only      — einsum on a plain array

Then a jax.profiler trace of `chain` (if the axon backend supports it) to
read per-op device times directly.

Usage: python scripts/bench_chain_barrier.py [trace]
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
    lambda: jax.random.normal(jax.random.PRNGKey(9), (7, 7, CT, F), jnp.bfloat16) * 0.005
)()
pre = jax.jit(
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


def pool(feat, rois, gate):
    return roi_pool_fused_batched(feat, rois, gate, 0, c_take=CT, spatial_scale=scale)


@jax.jit
def chain(feat, rois, gate, kern):
    r = pool(feat, rois, gate)
    return jnp.einsum("bhwnc,hwcf->bnf", r, kern, preferred_element_type=jnp.float32)


@jax.jit
def chain_barrier(feat, rois, gate, kern):
    r = jax.lax.optimization_barrier(pool(feat, rois, gate))
    return jnp.einsum("bhwnc,hwcf->bnf", r, kern, preferred_element_type=jnp.float32)


@jax.jit
def chain_copy(feat, rois, gate, kern):
    r = jax.lax.optimization_barrier(pool(feat, rois, gate))
    r = jax.lax.optimization_barrier(r + jnp.bfloat16(0))
    return jnp.einsum("bhwnc,hwcf->bnf", r, kern, preferred_element_type=jnp.float32)


@jax.jit
def pool_only(feat, rois, gate):
    r = pool(feat, rois, gate)
    return r[0, 0, 0, 0, 0]


@jax.jit
def einsum_only(pre, kern):
    return jnp.einsum("bhwnc,hwcf->bnf", pre, kern, preferred_element_type=jnp.float32)


if len(sys.argv) > 1 and sys.argv[1] == "trace":
    out = chain(feat, rois, gate, kern)
    fetch(out)
    with jax.profiler.trace("/tmp/chain_trace"):
        for _ in range(3):
            out = chain(feat, rois, gate, kern)
        fetch(out)
    print("trace written to /tmp/chain_trace", flush=True)
    sys.exit(0)

timeit("pool-only    ", pool_only, feat, rois, gate)
timeit("einsum-only  ", einsum_only, pre, kern)
timeit("chain        ", chain, feat, rois, gate, kern)
timeit("chain-barrier", chain_barrier, feat, rois, gate, kern)
timeit("chain-copy   ", chain_copy, feat, rois, gate, kern)
