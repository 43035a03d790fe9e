# Dispatch-loop pooling/fc1 microbench (honest timing; see tpu-axon gotchas)
"""Dispatch-loop timing (bench.py style): one computation per jit call,
timed over N dispatches. No in-jit rep chaining."""
import sys, time
sys.path.insert(0, __import__("os").path.dirname(__import__("os").path.dirname(__import__("os").path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp
from wsovod_tpu.ops.pallas.roi_align_fused import roi_align_fused_batched

iters = 10
C, CT, scale = 2048, 512, 1.0 / 8
B = 8
feat = jax.jit(lambda: jax.random.normal(jax.random.PRNGKey(0), (B, 86, 132, C), jnp.bfloat16))()
xy = jax.random.uniform(jax.random.PRNGKey(1), (B, 5024, 2), minval=0, maxval=800)
wh = jax.random.uniform(jax.random.PRNGKey(2), (B, 5024, 2), minval=8, maxval=300)
rois = jnp.concatenate([xy, xy + wh], -1).astype(jnp.float32)
gate = jnp.ones((B, 5024), jnp.float32)
kern = jax.jit(lambda: jax.random.normal(jax.random.PRNGKey(9), (7, 7, C, 4096), jnp.bfloat16) * 0.005)()
keys = jax.random.split(jax.random.PRNGKey(3), 4)
chunks0 = [jax.jit(lambda k: jnp.abs(jax.random.normal(k, (B, 7, 7, 5024, CT), jnp.bfloat16)))(k) for k in keys]

def fetch(o):
    leaf = jax.tree_util.tree_leaves(o)[0]
    idx = tuple(0 for _ in leaf.shape)
    np.asarray(leaf[idx])  # scalar device-slice fetch: actually waits

def timeit(name, fn, *args):
    out = fn(*args); fetch(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    fetch(out)
    print(f"{name}: {(time.perf_counter()-t0)/iters*1000:.2f} ms", flush=True)

@jax.jit
def pool_only(feat, rois, gate):
    chunks = [
        roi_align_fused_batched(feat, rois, gate, cb, c_take=CT, spatial_scale=scale, hwnc_out=True)
        for cb in range(0, C, CT)
    ]
    return sum(c[0, 0, 0, 0, 0].astype(jnp.float32) for c in chunks)

@jax.jit
def fc1_only(chunks, kern):
    acc = None
    for i, c in enumerate(chunks):
        ks = jax.lax.slice_in_dim(kern, i * CT, (i + 1) * CT, axis=2)
        y = jnp.einsum("bhwnc,hwcf->bnf", c, ks, preferred_element_type=jnp.float32)
        acc = y if acc is None else acc + y
    return acc[0, 0, 0]

@jax.jit
def chain(feat, rois, gate, kern):
    acc = None
    for cb in range(0, C, CT):
        chunk = roi_align_fused_batched(feat, rois, gate, cb, c_take=CT, spatial_scale=scale, hwnc_out=True)
        ks = jax.lax.slice_in_dim(kern, cb, cb + CT, axis=2)
        y = jnp.einsum("bhwnc,hwcf->bnf", chunk, ks, preferred_element_type=jnp.float32)
        acc = y if acc is None else acc + y
    return acc[0, 0, 0]

timeit("noop      (dispatch overhead) ", jax.jit(lambda r: r[0, 0, 0]), rois)
timeit("pool-only hwnc B=8 (dispatch)", pool_only, feat, rois, gate)
timeit("fc1-only  hwnc B=8 (dispatch)", fc1_only, chunks0, kern)
timeit("pool->fc1 hwnc B=8 (dispatch)", chain, feat, rois, gate, kern)
