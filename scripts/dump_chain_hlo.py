# Dump optimized HLO for the pool->fc1 chain and the plain-einsum consumer
# to find what XLA inserts around the pallas custom call (suspected 2 GB
# copy/transpose per chunk; bench_chain_diag + bench_pallas_out_layout).
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import jax.numpy as jnp

from wsovod_tpu.ops.pallas.roi_pool_fused import roi_pool_fused_batched

C, scale = 2048, 1.0 / 8
B, N, CT, F = 8, 5024, 512, 4096

feat = jax.ShapeDtypeStruct((B, 86, 132, C), jnp.bfloat16)
rois = jax.ShapeDtypeStruct((B, N, 4), jnp.float32)
gate = jax.ShapeDtypeStruct((B, N), jnp.float32)
kern = jax.ShapeDtypeStruct((7, 7, C, F), jnp.bfloat16)
# four distinct chunk inputs so 'plain' mirrors the chain's dataflow — one
# shared operand lets XLA fuse/schedule the repeated read differently
pres = [
    jax.ShapeDtypeStruct((B, 7, 7, N, CT), jnp.bfloat16)
    for _ in range(C // CT)
]


def chain(feat, rois, gate, kern):
    acc = None
    for cb in range(0, C, CT):
        r = roi_pool_fused_batched(feat, rois, gate, cb, c_take=CT, spatial_scale=scale)
        ks = jax.lax.slice_in_dim(kern, cb, cb + CT, axis=2)
        y = jnp.einsum("bhwnc,hwcf->bnf", r, ks, preferred_element_type=jnp.float32)
        acc = y if acc is None else acc + y
    return acc


def plain(pres, kern):
    acc = None
    for i, cb in enumerate(range(0, C, CT)):
        ks = jax.lax.slice_in_dim(kern, cb, cb + CT, axis=2)
        y = jnp.einsum(
            "bhwnc,hwcf->bnf", pres[i], ks, preferred_element_type=jnp.float32
        )
        acc = y if acc is None else acc + y
    return acc


which = sys.argv[1] if len(sys.argv) > 1 else "chain"
if which == "chain":
    txt = jax.jit(chain).lower(feat, rois, gate, kern).compile().as_text()
else:
    txt = jax.jit(plain).lower(pres, kern).compile().as_text()
out = f"/tmp/hlo_{which}.txt"
with open(out, "w") as f:
    f.write(txt)
print("wrote", out, len(txt))
