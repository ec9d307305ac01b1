"""Checkpoint / resume.

SURVEY.md §5: the reference realizes checkpointing as warm starting inside
solver objects, with no serialization anywhere. Here solver state is an
explicit pytree (IPDDPSolverState / MSIPDDPSolverState / (k, K) gain tuples),
so checkpointing is trivial: these helpers persist any solver-state pytree
with orbax when available, falling back to numpy .npz.
"""

from __future__ import annotations

from pathlib import Path

import jax
import numpy as np


def save_state(path, state) -> None:
    """Persist a solver-state pytree (orbax if installed, else .npz)."""
    path = Path(path)
    try:
        import orbax.checkpoint as ocp
    except ImportError:
        ocp = None
    leaves, _ = jax.tree.flatten(state)
    # orbax cannot serialize zero-size arrays, and solver states routinely
    # contain them (e.g. empty terminal-dual leaves) — choose the backend
    # up front so real orbax failures surface instead of being masked by a
    # silent fallback.
    use_orbax = ocp is not None and all(
        getattr(l, "size", 1) > 0 for l in leaves
    )
    if use_orbax:
        ckptr = ocp.StandardCheckpointer()
        ckptr.save(path.resolve(), state, force=True)
        ckptr.wait_until_finished()
        return
    np.savez(
        path.with_suffix(".npz"),
        **{f"leaf_{i}": np.asarray(l) for i, l in enumerate(leaves)},
    )


def load_state(path, like):
    """Restore a solver-state pytree with the structure of ``like``."""
    path = Path(path)
    try:
        import orbax.checkpoint as ocp
    except ImportError:
        ocp = None
    leaves_like, treedef = jax.tree.flatten(like)
    if (
        ocp is not None
        and path.exists()
        and all(getattr(l, "size", 1) > 0 for l in leaves_like)
    ):
        # An orbax directory checkpoint exists: restore it, surfacing real
        # orbax errors instead of masking them behind a .npz miss.
        ckptr = ocp.StandardCheckpointer()
        return ckptr.restore(path.resolve(), target=like)
    data = np.load(path.with_suffix(".npz"))
    leaves = [data[f"leaf_{i}"] for i in range(len(leaves_like))]
    return jax.tree.unflatten(treedef, leaves)
