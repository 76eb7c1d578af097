"""Smoke tier: one distributed solve per factory solver kind.

VERDICT r3 #2/#4: the fast (`-m "not slow"`) suite must exercise
``dist_solve(<each kind>)`` so a shard_map breakage in ANY solver is
caught before snapshot — the analogue of the reference's per-solver
NUM_MPI_PROCS test matrix
(packages/belos/tpetra/test/BlockGmres/CMakeLists.txt:38).
"""
import jax.numpy as jnp

from trilinos_tpu.parallel.solve_kinds import run_all_solver_kinds
from trilinos_tpu.solvers import factory as fct


def test_every_factory_kind_solves_on_mesh():
    results = run_all_solver_kinds(4)
    assert set(results) == set(fct.ALIASES.values())
    for kind, res in results.items():
        assert bool(jnp.all(jnp.isfinite(res.x))), kind
        assert bool(jnp.all(jnp.isfinite(res.resnorm))), kind


def test_kind_loop_reports_all_failures():
    """The gate must fail loudly if coverage goes missing (simulated by
    an alias pointing at an unknown kind)."""
    import pytest

    fct.ALIASES["__FAKE"] = "not_a_kind"
    try:
        with pytest.raises(RuntimeError, match="no distributed coverage"):
            run_all_solver_kinds(2)
    finally:
        del fct.ALIASES["__FAKE"]


def test_every_eigen_kind_solves_on_mesh():
    """Same contract for the eigensolver factory: every kind runs
    distributed, mass-aware kinds also as a generalized pencil."""
    from trilinos_tpu.eigen import factory as efct
    from trilinos_tpu.parallel.solve_kinds import run_all_eigen_kinds

    results = run_all_eigen_kinds(4)
    base_kinds = {k.split("+")[0] for k in results}
    assert base_kinds == set(efct.ALIASES.values())
    # the six mass-aware kinds also ran as pencils
    assert {k for k in results if k.endswith("+M")} == {
        "lobpcg+M", "davidson+M", "gen_davidson+M", "tracemin+M",
        "rtr+M", "bks+M"}
