"""Row-distribution maps.

TPU-native analogue of ``Tpetra::Map``
(packages/tpetra/core/src/Tpetra_Map_decl.hpp:246 — the distribution of
global row indices over processes, with GID↔LID translation at :682-:730
and owner lookup via the Directory). Differences, by design:

  * the shard count and local sizes are **static** (compiled into the
    program), so GID↔LID and owner-of-GID are closed-form integer maps —
    no distributed Directory is needed for the contiguous-uniform case
    (the reference's ContiguousUniformDirectory,
    src/Tpetra_DirectoryImpl_decl.hpp:209, reduced to arithmetic);
  * every shard carries the same padded local length ``n_local_pad``
    (multiple of the sublane count) — the SPMD uniformity XLA requires.
    Padding rows follow the framework-wide identity-row convention.

A "global padded vector" for Map m is the concatenation of the P padded
local chunks — shape (P * n_local_pad,); helpers translate between that
layout and logical host vectors.
"""
from __future__ import annotations

import dataclasses

import numpy as np

from ..ops.formats import ROW_ALIGN, round_up


@dataclasses.dataclass(frozen=True)
class Map:
    """Contiguous uniform row partition: shard s owns GIDs
    [chunk*s, min(chunk*(s+1), n_global)), chunk = ceil(n_global / P)."""

    n_global: int
    n_shards: int
    n_local_pad: int

    @classmethod
    def uniform(cls, n_global: int, n_shards: int,
                align: int = ROW_ALIGN) -> "Map":
        chunk = -(-n_global // n_shards)
        return cls(n_global=n_global, n_shards=n_shards,
                   n_local_pad=round_up(chunk, align))

    @property
    def chunk(self) -> int:
        return -(-self.n_global // self.n_shards)

    def shard_lo(self, s: int) -> int:
        return min(self.chunk * s, self.n_global)

    def shard_hi(self, s: int) -> int:
        return min(self.chunk * (s + 1), self.n_global)

    def n_owned(self, s: int) -> int:
        return self.shard_hi(s) - self.shard_lo(s)

    def owner_of(self, gids: np.ndarray) -> np.ndarray:
        return np.minimum(np.asarray(gids) // self.chunk, self.n_shards - 1)

    def gid_to_lid(self, gids: np.ndarray, s: int) -> np.ndarray:
        """Local index (into the padded local chunk) of owned GIDs."""
        return np.asarray(gids) - self.shard_lo(s)

    @property
    def n_global_pad(self) -> int:
        return self.n_shards * self.n_local_pad

    # -- host-side layout helpers -----------------------------------------
    def to_padded(self, x: np.ndarray) -> np.ndarray:
        """Host (n_global, ...) → padded sharded layout (P*n_local_pad, ...)."""
        x = np.asarray(x)
        out = np.zeros((self.n_global_pad,) + x.shape[1:], dtype=x.dtype)
        for s in range(self.n_shards):
            lo, hi = self.shard_lo(s), self.shard_hi(s)
            out[s * self.n_local_pad:s * self.n_local_pad + (hi - lo)] = x[lo:hi]
        return out

    def from_padded(self, xp: np.ndarray) -> np.ndarray:
        xp = np.asarray(xp)
        out = np.zeros((self.n_global,) + xp.shape[1:], dtype=xp.dtype)
        for s in range(self.n_shards):
            lo, hi = self.shard_lo(s), self.shard_hi(s)
            out[lo:hi] = xp[s * self.n_local_pad:s * self.n_local_pad + (hi - lo)]
        return out
