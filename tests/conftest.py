import os
import sys

# Force CPU with a virtual 8-device mesh BEFORE jax import, so multi-chip
# sharding semantics are testable without TPU hardware. NOTE: must OVERRIDE
# (not setdefault) — the environment's sitecustomize pins JAX_PLATFORMS=axon.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

try:
    import jax

    jax.config.update("jax_platforms", "cpu")
except ImportError:
    pass

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
