"""Filter machinery tests (mirror of the reference filter semantics in
interior_point_utils.cpp:79-139 and FilterPoint::dominates)."""

import jax.numpy as jnp
import numpy as np

from cddp_tpu.solvers import filter as flt


def test_accept_and_dominate():
    f = flt.empty_filter(7)
    f, acc = flt.accept_entry(f, 10.0, 5.0)
    assert bool(acc) and int(flt.size(f)) == 1

    # Dominated candidate rejected (both worse)
    f, acc = flt.accept_entry(f, 11.0, 6.0)
    assert not bool(acc) and int(flt.size(f)) == 1

    # Dominating candidate removes the old point
    f, acc = flt.accept_entry(f, 9.0, 4.0)
    assert bool(acc) and int(flt.size(f)) == 1
    mf, cv, nonempty = flt.back(f)
    assert bool(nonempty) and float(mf) == 9.0 and float(cv) == 4.0

    # Non-dominated (trade-off) point coexists
    f, acc = flt.accept_entry(f, 8.0, 100.0)
    assert bool(acc) and int(flt.size(f)) == 2
    mf, cv, _ = flt.back(f)
    assert float(mf) == 8.0 and float(cv) == 100.0


def test_prune_to_best():
    f = flt.empty_filter(7)
    for mf, cv in [(10.0, 1.0), (9.0, 2.0), (8.0, 3.0), (7.0, 4.0)]:
        f, _ = flt.accept_entry(f, mf, cv)
    f = flt.prune_to_best(f)
    # best violation (10,1) and best merit (7,4), distinct -> 2 entries
    assert int(flt.size(f)) == 2
    pts = sorted(
        [(float(m), float(v)) for m, v, ok in zip(f.merit, f.violation, f.valid) if ok]
    )
    assert pts == [(7.0, 4.0), (10.0, 1.0)]


def test_candidate_dominated():
    f = flt.empty_filter(7)
    f, _ = flt.accept_entry(f, 5.0, 5.0)
    assert bool(flt.candidate_dominated(f, 6.0, 6.0))
    assert not bool(flt.candidate_dominated(f, 4.0, 6.0))


def test_contains_invalid():
    f = flt.empty_filter(7)
    assert not bool(flt.contains_invalid(f))
    f, _ = flt.accept_entry(f, jnp.nan, 1.0)
    assert bool(flt.contains_invalid(f))
