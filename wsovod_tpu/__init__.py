"""WSOVOD-TPU: a TPU-native (JAX/XLA/Pallas/pjit) weakly supervised
open-vocabulary object detection framework.

Re-implements the capabilities of HunterJ-Lin/WSOVOD (AAAI 2024,
arXiv 2312.12437) with a TPU-first architecture: static padded shapes with
validity masks instead of ragged per-image lists, functional train steps under
`pjit` over a device mesh, Pallas kernels for the ROI pooling hot path, and a
cosine-similarity GEMM against cached CLIP text embeddings for region
classification.
"""

__version__ = "0.1.0"


def _enable_compile_cache():
    """Persistent XLA/Mosaic compilation cache (kernel compiles through the
    axon tunnel run minutes; the cache makes them one-time per shape).
    Opt out with WSOVOD_NO_COMPILE_CACHE=1; relocate with JAX_CACHE_DIR."""
    import os

    if os.environ.get("WSOVOD_NO_COMPILE_CACHE"):
        return
    # the cache exists for the minutes-long accelerator (Mosaic/tunnel)
    # compiles; CPU runs (tests, tools under WSOVOD_PLATFORM=cpu) would only
    # bloat it — and a cache entry truncated by a killed CPU test process
    # segfaults later readers (observed with jax 0.9.0)
    if (
        "cpu" in os.environ.get("JAX_PLATFORMS", "")
        or os.environ.get("WSOVOD_PLATFORM") == "cpu"
    ):
        return
    try:
        import jax

        path = os.environ.get(
            "JAX_CACHE_DIR",
            os.path.join(os.path.dirname(os.path.dirname(__file__)), ".jax_cache"),
        )
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:  # pragma: no cover - cache is best-effort
        pass


_enable_compile_cache()
