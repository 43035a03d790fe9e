# Dispatch-loop microbench: RPN head 3x3 conv, bf16 XLA conv vs 9-shift int8 GEMMs
"""Times the RPN head's 3x3 2048->2048 conv at the COCO bench shape
(B=8, 86x132). The bf16 conv measured 39 ms (~90% MXU roofline); XLA's int8
conv lowers at the bf16 rate, but int8 dot_general hits ~1.9x — hence the
shifted-GEMM decomposition (wsovod_tpu/models/layers.py:conv3x3_shifted_int8).

Usage: python scripts/bench_rpn_conv.py [smoke]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
if os.environ.get("WSOVOD_PLATFORM"):  # sitecustomize pins JAX_PLATFORMS
    os.environ["JAX_PLATFORMS"] = os.environ["WSOVOD_PLATFORM"]
import numpy as np
import jax
import jax.numpy as jnp

from wsovod_tpu.models.layers import conv3x3_shifted_int8

smoke = len(sys.argv) > 1 and sys.argv[1] == "smoke"
B, H, W, C = (2, 16, 24, 256) if smoke else (8, 86, 132, 2048)
iters = 3 if smoke else 10

x = jax.jit(
    lambda: jax.random.normal(jax.random.PRNGKey(0), (B, H, W, C), jnp.bfloat16)
)()
k = jax.jit(
    lambda: jax.random.normal(jax.random.PRNGKey(1), (3, 3, C, C), jnp.bfloat16)
    * 0.01
)()
bias = jnp.zeros((C,), jnp.float32)


def fetch(o):
    np.asarray(o[tuple(0 for _ in o.shape)])


def timeit(name, fn, *args):
    out = fn(*args)
    fetch(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    fetch(out)
    print(f"{name}: {(time.perf_counter() - t0) / iters * 1000:.2f} ms", flush=True)


@jax.jit
def conv_bf16(x, k):
    return jax.lax.conv_general_dilated(
        x, k, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


@jax.jit
def conv_int8(x, k, bias):
    return conv3x3_shifted_int8(x, k, bias)


timeit("rpn 3x3 conv bf16 (XLA conv)", conv_bf16, x, k)
timeit("rpn 3x3 conv int8 (9-shift GEMMs)", conv_int8, x, k, bias)
