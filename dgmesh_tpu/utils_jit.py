"""Shared jit helpers (TPU compiler options).

``jit_options(cfg)`` returns extra ``jax.jit`` kwargs for the big mesh-branch
programs: when ``cfg.tpu.scoped_vmem_kib`` is set and the backend is TPU, the
scoped-VMEM budget is raised via ``xla_tpu_scoped_vmem_limit_kib`` — the
Pallas mesh-raster backward holds ~30 (K, P) f32 temporaries in VMEM and
exceeds the 16 MiB default at ``max_faces_per_tile=512`` (measured 26.9 MiB
at the quality-config shapes; 48 MiB compiles and runs).  No-op off-TPU: the
flag is unknown to other backends.
"""

from __future__ import annotations

import jax


def jit_options(cfg) -> dict:
    kib = int(getattr(cfg.tpu, "scoped_vmem_kib", 0))
    if kib > 0 and jax.default_backend() == "tpu":
        return {"compiler_options": {"xla_tpu_scoped_vmem_limit_kib": kib}}
    return {}
