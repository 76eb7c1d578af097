"""Value-with-tolerance performance regression archive.

Analogue of ``Teuchos::XMLPerfTestArchive``
(packages/teuchos/parameterlist/src/Teuchos_XMLPerfTestArchive.hpp:110-117
— entries store a value plus loose/tight tolerances; a new run PASSes if
within tolerance, updates the archive if faster, FAILs on regression).
Used by the reference's PerformanceCGSolve harness
(packages/tpetra/core/test/PerformanceCGSolve/cg_solve_file.hpp:70).

JSON on disk instead of XML; same semantics.
"""
from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass


@dataclass
class PerfResult:
    status: str  # "new" | "pass" | "faster" | "regression"
    value: float
    archived: float | None
    ratio: float | None


class PerfArchive:
    def __init__(self, path: str, machine: str = "default"):
        self.path = path
        self.machine = machine
        if os.path.exists(path):
            with open(path) as f:
                self.data = json.load(f)
        else:
            self.data = {}

    def check(self, name: str, value: float, tol: float = 1.10,
              higher_is_better: bool = False, update: bool = True
              ) -> PerfResult:
        """Compare ``value`` (e.g. seconds, or GB/s with
        higher_is_better=True) against the archive within ``tol``."""
        key = f"{self.machine}:{name}"
        entry = self.data.get(key)
        if entry is None:
            res = PerfResult("new", value, None, None)
        else:
            old = entry["value"]
            ratio = value / old if old else float("inf")
            if higher_is_better:
                if ratio >= 1.0:
                    res = PerfResult("faster", value, old, ratio)
                elif ratio >= 1.0 / tol:
                    res = PerfResult("pass", value, old, ratio)
                else:
                    res = PerfResult("regression", value, old, ratio)
            else:
                if ratio <= 1.0:
                    res = PerfResult("faster", value, old, ratio)
                elif ratio <= tol:
                    res = PerfResult("pass", value, old, ratio)
                else:
                    res = PerfResult("regression", value, old, ratio)
        if update and res.status in ("new", "faster"):
            self.data[key] = {"value": value, "ts": time.time()}
            self._save()
        return res

    def _save(self) -> None:
        tmp = self.path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(self.data, f, indent=1, sort_keys=True)
        os.replace(tmp, self.path)
