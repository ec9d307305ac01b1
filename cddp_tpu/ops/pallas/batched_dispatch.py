"""Composable batch-aware op builder shared by the Pallas dispatch sites.

Every fused op in this package follows the same pattern: a plain
``lax.scan`` reference path for unbatched calls, and a Pallas kernel for
large TPU float32 batches. The engine choice used to live inside a single
``custom_vmap`` rule, which only ever saw the *innermost* vmap axis — so a
fleet solve with ``enable_parallel=True`` (alpha-ladder vmap inside, fleet
vmap outside) measured the ~11-entry ladder, fell back to the vmapped scan,
and the outer fleet batching never reached the kernel.

:func:`make_batched_op` fixes that by making nested vmaps *compose*: each
vmap level folds its axis into one leading batch dimension and re-binds a
stacked op, so the kernel/scan decision runs once, after the last vmap,
against the product of all mapped axes (fleet x ladder), not the innermost
one. It also centralizes the ensure-broadcast / gate / dispatch-log
plumbing that was previously re-implemented per op (rollout.py,
ip_rollout.py x2, riccati.py).

No reference counterpart: the reference's line search is a std::async
thread fan-out (cddp_solver_base.cpp:264-314); batching across problem
instances does not exist there.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from cddp_tpu.ops.pallas.dispatch_log import log_dispatch


def _ensure(x, b, axis_size):
    return x if b else jnp.broadcast_to(x[None], (axis_size,) + x.shape)


def make_batched_op(scan_single, fused_impl, log_name, *, min_batch=1,
                    gate=None, log_detail=None):
    """Build a batch-aware op around ``scan_single`` / ``fused_impl``.

    Args:
      scan_single: reference implementation for ONE instance (no batch dim).
      fused_impl: Pallas implementation taking the same args with a leading
        batch dimension on every one, returning outputs with the same
        leading batch dimension.
      log_name: label for the ``cddp_tpu.dispatch`` logger line.
      min_batch: smallest total (flattened across nested vmaps) batch for
        which the kernel engages; below it the vmapped scan runs (the
        kernels pad to tile_b lanes, so tiny batches do redundant work).
      gate: optional ``gate(*batched_args) -> bool`` static predicate
        (shape/structure checks) that must also hold for the kernel.
      log_detail: optional ``log_detail(*batched_args) -> dict`` of extras
        for the dispatch log line.

    Returns the unbatched-signature op. Calling it unbatched runs
    ``scan_single``; under any nesting of vmaps the batch axes are folded
    and the kernel/scan choice is made once on the total batch.
    """

    @jax.custom_batching.custom_vmap
    def op_stacked(*args):
        # Runs only when no enclosing vmap remains: args carry the fully
        # folded batch as their leading dimension.
        total = args[0].shape[0]
        use_kernel = (
            args[0].dtype == jnp.float32
            and total >= min_batch
            and jax.default_backend() in ("tpu", "axon")
            and (gate is None or gate(*args))
        )
        detail = dict(dtype=args[0].dtype)
        if log_detail is not None:
            detail.update(log_detail(*args))
        log_dispatch(log_name, use_kernel, total, **detail)
        if use_kernel:
            return fused_impl(*args)
        return jax.vmap(scan_single)(*args)

    @op_stacked.def_vmap
    def _stacked_rule(axis_size, in_batched, *args):
        args = [_ensure(x, b, axis_size) for x, b in zip(args, in_batched)]
        inner = args[0].shape[1]
        merged = [x.reshape((axis_size * inner,) + x.shape[2:]) for x in args]
        outs = op_stacked(*merged)
        outs = jax.tree_util.tree_map(
            lambda o: o.reshape((axis_size, inner) + o.shape[1:]), outs
        )
        return outs, jax.tree_util.tree_map(lambda _: True, outs)

    @jax.custom_batching.custom_vmap
    def op(*args):
        # Unbatched primal: the reference scan (any dtype/backend). A
        # batch-of-one kernel was measured a net LOSS for single solves —
        # no lane parallelism to amortize the grid — so kernels engage only
        # under vmap.
        return scan_single(*args)

    @op.def_vmap
    def _rule(axis_size, in_batched, *args):
        args = [_ensure(x, b, axis_size) for x, b in zip(args, in_batched)]
        outs = op_stacked(*args)
        return outs, jax.tree_util.tree_map(lambda _: True, outs)

    return op
