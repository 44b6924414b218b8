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
