"""CLI entry points (reference: train.py / render.py / mesh_evaluation.py).

``apply_platform_override()`` honors ``DGMESH_PLATFORM`` (e.g. ``cpu``) at
CLI startup.  The env var ``JAX_PLATFORMS`` alone is NOT reliable in
environments whose ``sitecustomize`` imports jax at interpreter start —
jax resolves the env default at import time, so the running config must be
updated too (same pattern as tests/conftest.py).
"""

import os


def apply_platform_override():
    plat = os.environ.get("DGMESH_PLATFORM")
    if plat:
        import jax
        jax.config.update("jax_platforms", plat)
    _enable_compile_cache()


def _enable_compile_cache():
    """Persistent XLA compile cache for every CLI (same dir as bench.py).

    A training run compiles ~8 step-flag variants; through the remote-compile
    tunnel each can take many minutes, so cold starts without the cache cost
    more than an hour before the first iteration.
    """
    cache_dir = os.environ.get(
        "DGMESH_JAX_CACHE",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.dirname(os.path.abspath(__file__)))), ".jax_cache"))
    try:
        import jax
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
    except Exception:
        pass
