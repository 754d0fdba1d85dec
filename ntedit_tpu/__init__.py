"""ntedit_tpu — a TPU-native genome polishing & SNV detection framework.

A from-scratch re-design of the capabilities of bcgsc/ntEdit v2.1.1
(reference layout documented in SURVEY.md) built on JAX/XLA/Pallas:
dense prefix-scan rolling-hash flagging, HBM-resident Bloom filters,
and a batched edit state machine over sharded contig windows.
"""

__version__ = "0.1.0"

import os as _os


def _enable_persistent_compile_cache() -> None:
    """XLA compiles of the dense flag pass take minutes per process on a
    tunneled TPU backend; the persistent cache amortizes them across runs
    (reference analogue: the engine is a recompiled-per-invocation C++
    binary — here one cached XLA program serves every invocation)."""
    try:
        import jax

        cache = _os.environ.get(
            "NTEDIT_TPU_CACHE",
            _os.path.join(_os.path.expanduser("~"), ".cache", "ntedit_tpu", "xla"),
        )
        if cache and cache != "0":
            _os.makedirs(cache, exist_ok=True)
            jax.config.update("jax_compilation_cache_dir", cache)
            jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
            jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass  # older jax or read-only home: compile-per-process still works


def _apply_platform_override() -> None:
    """NTEDIT_TPU_PLATFORM=cpu|tpu|... forces the JAX platform through
    jax.config.  Some PJRT plugins (the tunneled single-chip axon backend
    in this environment) re-force their platform at registration, so a
    plain JAX_PLATFORMS env var is silently ignored — hermetic CPU runs
    (demo goldens, multi-process tests) need the config-level override."""
    plat = _os.environ.get("NTEDIT_TPU_PLATFORM")
    if not plat:
        return
    try:
        import jax

        jax.config.update("jax_platforms", plat)
    except Exception:
        pass


_enable_persistent_compile_cache()
_apply_platform_override()
