"""tensor4all_tpu — a TPU-native tensor-network framework.

A ground-up JAX/XLA/Pallas re-design of the capabilities of
``tensor4all/tensor4all-rs`` (tensor trains, tensor cross interpolation,
quantics tensor trains, tree tensor networks, DMRG/TDVP/linsolve), built
TPU-first:

- contraction lowers to ``jax.numpy.einsum`` / ``lax.dot_general`` on the MXU,
- decompositions (SVD/QR/rrLU) run as jitted XLA programs with static-shape
  masking so data-dependent ranks never force recompilation inside sweeps,
- batched function evaluation (the TCI hot loop) is shardable over a
  ``jax.sharding.Mesh`` via ``parallel``,
- host Python keeps only the control plane (index identity, pivot sets,
  tree topology, sweep schedules) — exactly the state the reference keeps
  in Rust ``Vec``/``HashMap``.

The reference implementation studied for feature/behavior parity lives at
tensor4all-rs (Rust); file:line citations in docstrings point there.
"""

from __future__ import annotations

import os

import jax

# The reference is float64/complex128 end-to-end with 1e-10..1e-14 accuracy
# contracts (SURVEY.md §6); x64 is required for parity. Opt out with
# T4A_NO_X64=1 for pure-speed experiments.
if not os.environ.get("T4A_NO_X64"):
    jax.config.update("jax_enable_x64", True)

# Persistent XLA compilation cache (T4A_COMPILE_CACHE=<dir>): the heavy
# one-program engines compile in 30-130 s per (shape, knob) signature on
# TPU (e.g. the blocked-rook device rrLU, the multi-sweep DMRG/TDVP
# programs); the disk cache makes every signature a one-time cost across
# processes/sessions. Opt-in because the default tempdir policy varies
# across deployments (the reference's analog is the process-global
# GraphCompiler plan cache, context.rs:73-85 — persistence is the
# TPU-native upgrade).
_cc = os.environ.get("T4A_COMPILE_CACHE")
if _cc:
    try:
        jax.config.update("jax_compilation_cache_dir", _cc)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:  # noqa: BLE001 — older jax: knob absent
        pass
del _cc

# Some TPU plugins ignore the JAX_PLATFORMS env var: they pre-set the
# jax_platforms *config* at import time (e.g. "axon,cpu"), which shadows
# an explicit `JAX_PLATFORMS=cpu` env pin. Honor the env var here iff it
# NARROWS the current platform list (every requested platform is already
# allowed): that restores `JAX_PLATFORMS=cpu` on plugin boxes without
# letting an ambient `JAX_PLATFORMS=axon` (exported by the plugin's own
# environment) clobber a user's explicit
# jax.config.update("jax_platforms", "cpu").
_plat = os.environ.get("JAX_PLATFORMS", "")
_cur = jax.config.jax_platforms or ""
if _plat and _cur != _plat:
    _want = {p.strip() for p in _plat.split(",") if p.strip()}
    _have = {p.strip() for p in _cur.split(",") if p.strip()}
    if not _have or _want <= _have:
        try:
            jax.config.update("jax_platforms", _plat)
        except Exception:
            pass
del _plat, _cur

from .config import (  # noqa: E402
    SingularValueMeasure,
    SvdTruncationPolicy,
    ThresholdScale,
    get_default_qr_rtol,
    get_default_svd_truncation_policy,
    set_default_qr_rtol,
    set_default_svd_truncation_policy,
)
from .core.index import Index, TagSet, new_id, sim  # noqa: E402
from .core.tensor import Tensor  # noqa: E402
from .core.contract import contract  # noqa: E402
from .core.decomp import (  # noqa: E402
    FactorizeAlg,
    Canonical,
    factorize,
    qr,
    svd,
    truncated_svd_matrix,
)

__all__ = [
    "Index",
    "TagSet",
    "Tensor",
    "contract",
    "svd",
    "qr",
    "factorize",
    "FactorizeAlg",
    "Canonical",
    "truncated_svd_matrix",
    "new_id",
    "sim",
    "SvdTruncationPolicy",
    "ThresholdScale",
    "SingularValueMeasure",
    "get_default_svd_truncation_policy",
    "set_default_svd_truncation_policy",
    "get_default_qr_rtol",
    "set_default_qr_rtol",
]

__version__ = "0.1.0"
