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

        ckptr = ocp.StandardCheckpointer()
        ckptr.save(path.resolve(), state, force=True)
        ckptr.wait_until_finished()
        return
    except Exception:
        pass
    leaves, treedef = jax.tree.flatten(state)
    np.savez(
        path.with_suffix(".npz"),
        __treedef__=np.frombuffer(repr(treedef).encode(), dtype=np.uint8),
        **{f"leaf_{i}": np.asarray(l) for i, l in enumerate(leaves)},
    )


def load_state(path, like):
    """Restore a solver-state pytree with the structure of ``like``."""
    path = Path(path)
    try:
        import orbax.checkpoint as ocp

        ckptr = ocp.StandardCheckpointer()
        return ckptr.restore(path.resolve(), target=like)
    except Exception:
        pass
    data = np.load(path.with_suffix(".npz"))
    leaves_like, treedef = jax.tree.flatten(like)
    leaves = [data[f"leaf_{i}"] for i in range(len(leaves_like))]
    return jax.tree.unflatten(treedef, leaves)
