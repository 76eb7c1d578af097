"""Environment-variable runtime behavior flags.

Analogue of ``Tpetra::Details::Behavior``
(reference: packages/tpetra/core/src/Tpetra_Details_Behavior.hpp:95-165 —
TPETRA_DEBUG, TPETRA_VERBOSE, threshold knobs read once from the env).

TT_DEBUG enables O(expensive) invariant checks inside Map / halo / apply,
mirroring the reference's debug-mode cross-process consistency checks
(Tpetra_CrsMatrix_def.hpp:5117-5167).
"""
from __future__ import annotations

import functools
import os


def _env_flag(name: str, default: bool = False) -> bool:
    v = os.environ.get(name)
    if v is None:
        return default
    return v.strip().lower() in ("1", "true", "yes", "on")


@functools.lru_cache(maxsize=None)
def debug() -> bool:
    """Expensive invariant checking (TT_DEBUG)."""
    return _env_flag("TT_DEBUG")


@functools.lru_cache(maxsize=None)
def verbose() -> bool:
    """Chatty per-component logging (TT_VERBOSE)."""
    return _env_flag("TT_VERBOSE")


@functools.lru_cache(maxsize=None)
def ell_pad_limit() -> float:
    """Max allowed ELL padding blowup before falling back to row-binned
    formats (TT_ELL_PAD_LIMIT, default 3.0x)."""
    return float(os.environ.get("TT_ELL_PAD_LIMIT", "3.0"))


def reset_cache() -> None:
    debug.cache_clear()
    verbose.cache_clear()
    ell_pad_limit.cache_clear()
