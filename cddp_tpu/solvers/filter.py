"""Fixed-size IPOPT-style filter.

Rebuild of the reference filter machinery (``FilterPoint::dominates``,
cddp_core.hpp:153-175; ``detail::acceptFilterEntry`` /
``isFilterCandidateDominated`` / ``pruneFilterToBestPoints``,
interior_point_utils.cpp:79-139) as a static-shape pytree: the reference
filter is pruned to <= max_filter_size (5) entries, so a fixed array of
``max_filter_size + 2`` slots with a validity mask represents it exactly —
jit/vmap-friendly with zero dynamic allocation.

A point (mf, cv) dominates another iff mf <= other.mf and cv <= other.cv.
Insertion preserves order (the forward pass reads filter.back(), the most
recently accepted entry).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

_BIG = jnp.inf


class Filter(NamedTuple):
    merit: jax.Array  # (F,)
    violation: jax.Array  # (F,)
    valid: jax.Array  # (F,) bool


def empty_filter(capacity: int, dtype=jnp.float64) -> Filter:
    return Filter(
        merit=jnp.full((capacity,), _BIG, dtype),
        violation=jnp.full((capacity,), _BIG, dtype),
        valid=jnp.zeros((capacity,), bool),
    )


def size(f: Filter) -> jax.Array:
    return jnp.sum(f.valid)


def candidate_dominated(f: Filter, mf, cv) -> jax.Array:
    """isFilterCandidateDominated (interior_point_utils.cpp:97-105)."""
    return jnp.any(f.valid & (f.merit <= mf) & (f.violation <= cv))


def accept_entry(f: Filter, mf, cv) -> Tuple[Filter, jax.Array]:
    """acceptFilterEntry (interior_point_utils.cpp:79-95): reject if dominated
    by an existing point; otherwise drop points the candidate dominates
    (preserving order) and append the candidate. Returns (filter, accepted)."""
    dominated = candidate_dominated(f, mf, cv)

    keep = f.valid & ~((mf <= f.merit) & (cv <= f.violation))
    # Stable compaction: kept entries first, original order preserved.
    order = jnp.argsort(jnp.where(keep, 0, 1), stable=True)
    merit_c = f.merit[order]
    viol_c = f.violation[order]
    n_kept = jnp.sum(keep)
    cap = f.merit.shape[0]
    idx = jnp.arange(cap)
    merit_new = jnp.where(idx == n_kept, mf, jnp.where(idx < n_kept, merit_c, _BIG))
    viol_new = jnp.where(idx == n_kept, cv, jnp.where(idx < n_kept, viol_c, _BIG))
    valid_new = idx <= n_kept

    out = Filter(
        merit=jnp.where(dominated, f.merit, merit_new),
        violation=jnp.where(dominated, f.violation, viol_new),
        valid=jnp.where(dominated, f.valid, valid_new),
    )
    return out, ~dominated


def back(f: Filter) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """(merit, violation, nonempty) of the most recently inserted entry
    (filter_.back() reads in the forward pass, ipddp_solver.cpp:1797-1800)."""
    n = size(f)
    nonempty = n > 0
    i = jnp.maximum(n - 1, 0)
    return f.merit[i], f.violation[i], nonempty


def prune_to_best(f: Filter) -> Filter:
    """pruneFilterToBestPoints (interior_point_utils.cpp:114-139): keep the
    min-violation point, plus the min-merit point if distinct (1e-12 tol)."""
    nonempty = jnp.any(f.valid)
    viol_masked = jnp.where(f.valid, f.violation, _BIG)
    merit_masked = jnp.where(f.valid, f.merit, _BIG)
    i_bv = jnp.argmin(viol_masked)
    i_bm = jnp.argmin(merit_masked)
    bv = (f.merit[i_bv], f.violation[i_bv])
    bm = (f.merit[i_bm], f.violation[i_bm])
    distinct = (jnp.abs(bm[1] - bv[1]) > 1e-12) | (jnp.abs(bm[0] - bv[0]) > 1e-12)

    cap = f.merit.shape[0]
    idx = jnp.arange(cap)
    merit_new = jnp.where(idx == 0, bv[0], jnp.where((idx == 1) & distinct, bm[0], _BIG))
    viol_new = jnp.where(idx == 0, bv[1], jnp.where((idx == 1) & distinct, bm[1], _BIG))
    valid_new = (idx == 0) | ((idx == 1) & distinct)
    return Filter(
        merit=jnp.where(nonempty, merit_new, f.merit),
        violation=jnp.where(nonempty, viol_new, f.violation),
        valid=jnp.where(nonempty, valid_new, f.valid),
    )


def contains_invalid(f: Filter) -> jax.Array:
    """filterContainsInvalidValues (interior_point_utils.cpp:107-112)."""
    bad = ~(jnp.isfinite(f.merit) & jnp.isfinite(f.violation))
    return jnp.any(f.valid & bad)


def clear(f: Filter) -> Filter:
    return empty_filter(f.merit.shape[0], f.merit.dtype)
