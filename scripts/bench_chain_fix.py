# Chain-gap fix candidates: pool -> fc1 consumer-layout strategies, on-chip.
"""RESOLUTION (2026-08-19, round 4): the round-3 "chain gap" was a
MEASUREMENT ARTIFACT, not a relayout. The old kernel entry B-split B=8 into
two B=4 calls + concatenate, and the pool-only benchmark's one-scalar
consumer let XLA dead-code-eliminate the second half-batch: "pool-only
92 ms" was really 182 ms (B=4 91.6 / B=8-both-halves 181.5 measured).
chain 364 ≈ true pool 182 + fc1 187 — no gap. The round-3 numbers below
are kept for the record; "copy-only 191.5" was simply the true pool cost.

Round-3 diagnosis (scripts/bench_chain_diag.py, 2026-08-19 on-chip):

  chain (einsum reads kernel out) : 365.5 ms
  broken-dep (einsum reads const) : 374.8 ms  -> NOT a scheduling/dep issue
  copy-only (read kernel out)     : 191.5 ms  -> the TRUE pool cost (see above)

Candidates measured here (all consumers read every output — no DCE trap):

  bf16: hwnc einsum (baseline) | nhwc einsum | hwnc xpose+flat GEMM |
        nhwc reshape+flat GEMM
  int8 (shipped): quantize+einsum from hwnc (baseline) | from nhwc |
        nhwc quantize->flat int8 GEMM

Usage: python scripts/bench_chain_fix.py
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
Q = 49  # 7*7
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
# flat per-chunk weights [(Q*CT, F)] precomputed outside the timed jit (a
# one-time transform of a constant in the real model)
kflat = jax.jit(
    lambda k: [
        jax.lax.slice_in_dim(k, cb, cb + CT, axis=2)
        .transpose(0, 1, 2, 3)
        .reshape(Q * CT, F)
        for cb in range(0, C, CT)
    ]
)(kern)
kflat = [jax.block_until_ready(x) for x in kflat]


def fetch(o):
    np.asarray(jax.tree_util.tree_leaves(o)[0].ravel()[0:1])


def timeit(name, fn, *args):
    try:
        out = fn(*args)
        fetch(out)
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        fetch(out)
        print(f"{name}: {(time.perf_counter() - t0) / iters * 1000:.2f} ms", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"{name}: FAILED {type(e).__name__}: {e}", flush=True)


def pool(f, r, g, cb, layout):
    return roi_pool_fused_batched(
        f, r, g, cb, c_take=CT, spatial_scale=scale, out_layout=layout
    )


# ---------------- bf16 family ----------------
@jax.jit
def chain_hwnc(feat, rois, gate, kern):
    acc = None
    for cb in range(0, C, CT):
        r = pool(feat, rois, gate, cb, "hwnc")
        ks = jax.lax.slice_in_dim(kern, cb, cb + CT, axis=2)
        y = jnp.einsum("bhwnc,hwcf->bnf", r, ks, preferred_element_type=jnp.float32)
        acc = y if acc is None else acc + y
    return acc


@jax.jit
def chain_nhwc(feat, rois, gate, kern):
    acc = None
    for cb in range(0, C, CT):
        r = pool(feat, rois, gate, cb, "nhwc")
        ks = jax.lax.slice_in_dim(kern, cb, cb + CT, axis=2)
        y = jnp.einsum("bnhwc,hwcf->bnf", r, ks, preferred_element_type=jnp.float32)
        acc = y if acc is None else acc + y
    return acc


@jax.jit
def chain_hwnc_xt(feat, rois, gate, kflat):
    acc = None
    for i, cb in enumerate(range(0, C, CT)):
        r = pool(feat, rois, gate, cb, "hwnc")  # [B,7,7,N,CT]
        rf = jnp.transpose(r, (0, 3, 1, 2, 4)).reshape(B, N, Q * CT)
        y = jax.lax.dot_general(
            rf, kflat[i], (((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc = y if acc is None else acc + y
    return acc


@jax.jit
def chain_nhwc_flat(feat, rois, gate, kflat):
    acc = None
    for i, cb in enumerate(range(0, C, CT)):
        r = pool(feat, rois, gate, cb, "nhwc")  # [B,N,7,7,CT]
        rf = r.reshape(B, N, Q * CT)
        y = jax.lax.dot_general(
            rf, kflat[i], (((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc = y if acc is None else acc + y
    return acc


# ---------------- int8 family (per-ROI activation scales, as shipped) -----
def quant_roi(x, red_axes):
    ax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=red_axes, keepdims=True)
    s = jnp.maximum(ax, 1e-8) / 127.0
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / s), -127, 127).astype(jnp.int8)
    return q, s


kq_chunks = jax.jit(
    lambda k: [
        jnp.clip(
            jnp.round(
                jax.lax.slice_in_dim(k, cb, cb + CT, axis=2)
                / (jnp.maximum(jnp.max(jnp.abs(jax.lax.slice_in_dim(k, cb, cb + CT, axis=2)), axis=(0, 1, 2)), 1e-8) / 127.0)
            ),
            -127, 127,
        ).astype(jnp.int8)
        for cb in range(0, C, CT)
    ]
)(kern)
kq_chunks = [jax.block_until_ready(x) for x in kq_chunks]
kq_flat = jax.jit(
    lambda ks: [k.transpose(0, 1, 2, 3).reshape(Q * CT, F) for k in ks]
)(kq_chunks)
kq_flat = [jax.block_until_ready(x) for x in kq_flat]


@jax.jit
def int8_hwnc(feat, rois, gate, kq):
    acc = None
    for i, cb in enumerate(range(0, C, CT)):
        r = pool(feat, rois, gate, cb, "hwnc")
        q, s = quant_roi(r, (1, 2, 4))  # scale per (b, n)
        y = jnp.einsum("bhwnc,hwcf->bnf", q, kq[i], preferred_element_type=jnp.int32)
        y = y.astype(jnp.float32) * jnp.squeeze(s, (1, 2))
        acc = y if acc is None else acc + y
    return acc


@jax.jit
def int8_nhwc(feat, rois, gate, kq):
    acc = None
    for i, cb in enumerate(range(0, C, CT)):
        r = pool(feat, rois, gate, cb, "nhwc")
        q, s = quant_roi(r, (2, 3, 4))
        y = jnp.einsum("bnhwc,hwcf->bnf", q, kq[i], preferred_element_type=jnp.int32)
        y = y.astype(jnp.float32) * jnp.squeeze(s, (2, 3))
        acc = y if acc is None else acc + y
    return acc


@jax.jit
def int8_nhwc_flat(feat, rois, gate, kqf):
    acc = None
    for i, cb in enumerate(range(0, C, CT)):
        r = pool(feat, rois, gate, cb, "nhwc")
        q, s = quant_roi(r, (2, 3, 4))
        qf = q.reshape(B, N, Q * CT)
        y = jax.lax.dot_general(
            qf, kqf[i], (((2,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        y = y.astype(jnp.float32) * jnp.squeeze(s, (2, 3))
        acc = y if acc is None else acc + y
    return acc


@jax.jit
def int8_hwnc_xq_flat(feat, rois, gate, kqf):
    # hwnc pool (native stores) + TRANSPOSING quantize (the quantize pass
    # reads the whole chunk anyway; emitting its int8 output n-major folds
    # the consumer relayout into a pass that must run regardless, and the
    # moved payload is half the bf16 bytes) + flat int8 GEMM
    acc = None
    for i, cb in enumerate(range(0, C, CT)):
        r = pool(feat, rois, gate, cb, "hwnc")  # [B,7,7,N,CT]
        q, s = quant_roi(r, (1, 2, 4))  # scale per (b, n)
        qf = jnp.transpose(q, (0, 3, 1, 2, 4)).reshape(B, N, Q * CT)
        y = jax.lax.dot_general(
            qf, kqf[i], (((2,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        y = y.astype(jnp.float32) * jnp.squeeze(s, (1, 2))
        acc = y if acc is None else acc + y
    return acc


@jax.jit
def pool_only_nhwc(feat, rois, gate):
    acc = None
    for cb in range(0, C, CT):
        r = pool(feat, rois, gate, cb, "nhwc")
        y = jnp.sum(r.astype(jnp.float32), axis=(2, 3, 4))
        acc = y if acc is None else acc + y
    return acc


if __name__ == "__main__":
    timeit("bf16 chain hwnc einsum (base)", chain_hwnc, feat, rois, gate, kern)
    timeit("bf16 chain nhwc einsum       ", chain_nhwc, feat, rois, gate, kern)
    timeit("bf16 chain hwnc xpose+flat   ", chain_hwnc_xt, feat, rois, gate, kflat)
    timeit("bf16 chain nhwc reshape+flat ", chain_nhwc_flat, feat, rois, gate, kflat)
    timeit("int8 chain hwnc einsum (base)", int8_hwnc, feat, rois, gate, kq_chunks)
    timeit("int8 chain nhwc einsum       ", int8_nhwc, feat, rois, gate, kq_chunks)
    timeit("int8 chain nhwc flat GEMM    ", int8_nhwc_flat, feat, rois, gate, kq_flat)
    timeit("int8 hwnc xpose-quant flat   ", int8_hwnc_xq_flat, feat, rois, gate, kq_flat)
    timeit("pool-only nhwc (read cost)   ", pool_only_nhwc, feat, rois, gate)
