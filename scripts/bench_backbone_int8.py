# Backbone int8 A/B: R50-DC5 res4/res5 convs as shift-decomposed int8 GEMMs.
"""The RPN conv's 9-shift int8 GEMM decomposition measured 38 -> 29 ms;
res4/res5 are ~3/4 of R50 MACs (the bottleneck 1x1s dominate), so
TPU.BACKBONE_CONV_QUANT=int8 should recover ~10-15 ms of the ~40 ms
backbone stage. Inference-scale numerics; frozen backbone only.

Usage: python scripts/bench_backbone_int8.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp

from wsovod_tpu.config import get_cfg
from wsovod_tpu.models.backbones.resnet_wsl import build_wsl_resnet_backbone

B, H, W = 8, 688, 1056
iters = 10

x = jax.jit(
    lambda: jax.random.normal(jax.random.PRNGKey(0), (B, H, W, 3), jnp.bfloat16)
)()


def build(quant):
    cfg = get_cfg()
    cfg.MODEL.RESNETS.DEPTH = 50
    cfg.MODEL.RESNETS.RES2_OUT_CHANNELS = 256
    cfg.TPU.BACKBONE_CONV_QUANT = quant
    return build_wsl_resnet_backbone(cfg)


bb_fp = build("none")
params = jax.jit(lambda: bb_fp.init(jax.random.PRNGKey(0), x[:1]))()


def fetch(o):
    leaves = jax.tree_util.tree_leaves(o)
    np.asarray(leaves[0].ravel()[0:1] + leaves[-1].ravel()[-1:])


def timeit(name, fn, *args):
    try:
        out = fn(*args)
        fetch(out)
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        fetch(out)
        print(f"{name}: {(time.perf_counter() - t0) / iters * 1000:.2f} ms",
              flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"{name}: FAILED {type(e).__name__}: {e}", flush=True)


def mk(quant):
    bb = build(quant)

    @jax.jit
    def run(p, x):
        return bb.apply(p, x)

    return run


fp = mk("none")
q8 = mk("int8")

# numeric sanity: relative error of the res5 output
a = fp(params, x)
b = q8(params, x)
fa = list(a.values())[-1].astype(jnp.float32)
fb = list(b.values())[-1].astype(jnp.float32)
rel = float(jnp.linalg.norm(fa - fb) / (jnp.linalg.norm(fa) + 1e-9))
print(f"res5 relative error int8 vs fp: {rel:.4f}", flush=True)

timeit("backbone R50-DC5 bf16     ", fp, params, x)
timeit("backbone R50-DC5 int8 r4/5", q8, params, x)
