# Chain-gap fix candidate: einsum per B-split half (no 2 GB concat).
"""HLO (scripts/dump_chain_hlo.py) showed the gap's mechanism: the SMEM meta
budget B-splits the fused pool into two B=4 custom calls, and XLA CONCATENATES
the two 2 GB halves inside the conv fusion (%fusion.36) before the dot —
that nested concat regeneration is the ~90 ms.

  chain-concat  — shipped structure: einsum reads the concatenated [8,...]
  chain-halves  — einsum per [4,...] half, concat the two [4,N,F] f32 accs
                  once at the end (658 MB instead of 16 GB of concat traffic)

Usage: python scripts/bench_chain_halves.py
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
def chain_concat(feat, rois, gate, kern):
    acc = None
    for cb in range(0, C, CT):
        r = roi_pool_fused_batched(feat, rois, gate, cb, c_take=CT, spatial_scale=scale)
        ks = jax.lax.slice_in_dim(kern, cb, cb + CT, axis=2)
        y = jnp.einsum("bhwnc,hwcf->bnf", r, ks, preferred_element_type=jnp.float32)
        acc = y if acc is None else acc + y
    return acc


@jax.jit
def chain_halves(feat, rois, gate, kern):
    accs = [None, None]
    for cb in range(0, C, CT):
        ks = jax.lax.slice_in_dim(kern, cb, cb + CT, axis=2)
        for hi, sl in enumerate((slice(0, B // 2), slice(B // 2, B))):
            r = roi_pool_fused_batched(
                feat[sl], rois[sl], gate[sl], cb, c_take=CT, spatial_scale=scale
            )
            y = jnp.einsum(
                "bhwnc,hwcf->bnf", r, ks, preferred_element_type=jnp.float32
            )
            accs[hi] = y if accs[hi] is None else accs[hi] + y
    return jnp.concatenate(accs, axis=0)


timeit("chain-concat (shipped)", chain_concat, feat, rois, gate, kern)
timeit("chain-halves (fix)    ", chain_halves, feat, rois, gate, kern)
o1 = chain_concat(feat, rois, gate, kern)
o2 = chain_halves(feat, rois, gate, kern)
print("max abs diff:", float(jnp.max(jnp.abs(o1 - o2))), flush=True)
