# Chain-gap isolation, step 3: is the einsum slowdown DATA-dependent?
"""bench_chain_split showed the gap survives a jit boundary: fc1 on the
materialized pallas output compiles to the IDENTICAL program as fc1 on a
random array (same shape/layout/entry params) yet runs ~60% slower. The only
remaining difference is the bits. Suspects: value distribution (pooled maxes
+ zeroed empty bins) or leaked NEG/inf sentinels.

  fc1(random)       — N(0,1) bf16
  fc1(pooled)       — the actual kernel output, materialized then re-fed
  fc1(pooled+0)     — pooled round-tripped through an XLA elementwise copy
  fc1(zeros)        — all zeros
  stats(pooled)     — min/max/nan/inf counts of the pooled tensor

Usage: python scripts/bench_chain_data.py
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
rand = jax.jit(
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
def fc1(r, kern):
    return jnp.einsum("bhwnc,hwcf->bnf", r, kern, preferred_element_type=jnp.float32)


pooled = jax.jit(
    lambda feat, rois, gate: roi_pool_fused_batched(
        feat, rois, gate, 0, c_take=CT, spatial_scale=scale
    )
)(feat, rois, gate)
pooled.block_until_ready()

st = jax.jit(
    lambda x: (
        jnp.min(x.astype(jnp.float32)),
        jnp.max(x.astype(jnp.float32)),
        jnp.sum(jnp.isnan(x).astype(jnp.int32)),
        jnp.sum(jnp.isinf(x).astype(jnp.int32)),
        jnp.mean((x == 0).astype(jnp.float32)),
    )
)(pooled)
print(
    "pooled stats: min=%g max=%g nan=%d inf=%d zero_frac=%.4f"
    % tuple(np.asarray(v) for v in st),
    flush=True,
)

timeit("fc1(random)  ", fc1, rand, kern)
timeit("fc1(pooled)  ", fc1, pooled, kern)
pooled0 = jax.jit(lambda x: x + jnp.bfloat16(0))(pooled)
pooled0.block_until_ready()
timeit("fc1(pooled+0)", fc1, pooled0, kern)
zeros = jax.jit(lambda: jnp.zeros((B, 7, 7, N, CT), jnp.bfloat16))()
timeit("fc1(zeros)   ", fc1, zeros, kern)
