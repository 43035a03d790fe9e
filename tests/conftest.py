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

import pytest

# Three test tiers (VERDICT r3 #8 recalibration): `-m unit` gates every
# commit (~7 min measured on this 1-core host), `-m integration` is the
# per-round whole-model tier (~10 min), and `-m kernel` holds the
# interpret-mode Pallas suites (minutes PER CASE — ~20 min total) so
# per-commit gating stays under ~10 min.
_INTEGRATION_MODULES = {
    "test_end_to_end",
    "test_more_integration",
    "test_meta_arch",
    "test_sam",
    "test_weight_import",
    "test_clip_text",
    "test_multiprocess",  # spawns 2 jax.distributed CPU processes
    "test_golden_forward",  # full-model compile
    "test_golden_eval_int8",  # full-model compile + interpret fused pool
}
_KERNEL_MODULES = {
    "test_roi_pool_fused",  # interpret-mode Pallas: minutes per case
    "test_roi_align_fused",
    "test_pallas_roi_pool",
}


def pytest_collection_modifyitems(items):
    for item in items:
        mod = item.module.__name__.rsplit(".", 1)[-1]
        if mod in _KERNEL_MODULES:
            item.add_marker(pytest.mark.kernel)
        elif mod in _INTEGRATION_MODULES:
            item.add_marker(pytest.mark.integration)
        else:
            item.add_marker(pytest.mark.unit)


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_per_module():
    """Monolithic full-suite runs segfault XLA:CPU's JIT after ~175 compiled
    programs accumulate in one process (observed twice, deterministic;
    tier-split runs are unaffected). Dropping the compiled-executable caches
    between modules keeps the JIT footprint bounded."""
    yield
    try:
        import jax

        jax.clear_caches()
    except Exception:
        pass
