"""Norm-constraint stall fix (slack SOC + constraint Hessians).

STATUS.md round-1 diagnosis: on norm-type constraints with long inactive
arcs (HCW rendezvous, ||u|| <= u_max) the reference algorithm enters an
alpha-pinned limit cycle — the curved constraint re-injects an O(alpha^2)
slack residual every iteration (fixed point inf_pr ~ 0.6-1.6) and the
ADAPTIVE barrier can never decrease mu. The reference stalls the same way
(port verified line-identical).

ipddp.use_constraint_hessians (exact Lagrangian curvature in the condensed
backward) + ipddp.slack_soc (trial-point slack re-closure, the IPOPT-SOC
analogue) break the cycle: primal feasibility is restored EXACTLY and the
barrier decays. This beats the reference, which on this config returns a
thrust-limit-violating trajectory (max||u|| ~ 2.5 > 1)."""

import jax.numpy as jnp
import pytest

import cddp_tpu as ct
from cddp_tpu.models import HCW
from cddp_tpu.solvers import ipddp


def _rendezvous(N=100):
    model = HCW(mean_motion=0.00113, mass=100.0, integration_type="rk4")
    goal = jnp.zeros(6)
    Q = jnp.diag(jnp.asarray([1e-4, 1e-4, 1e-4, 1e-2, 1e-2, 1e-2]))
    Qf = jnp.diag(jnp.asarray([1e3, 1e3, 1e3, 1e5, 1e5, 1e5]))
    obj = ct.quadratic_objective(Q, jnp.eye(3), Qf, goal, 10.0)
    prob = ct.problem(
        model, obj, jnp.asarray([0.0, 500.0, 50.0, 0.0, 0.0, 0.0]), N, 10.0
    )
    return prob.add_constraint(
        "MaxThrustMagnitudeConstraint", ct.max_thrust_magnitude_constraint(1.0)
    )


def _opts(fix: bool, iters=150):
    return ct.CDDPOptions(
        max_iterations=iters, tolerance=1e-5, acceptable_tolerance=1e-6,
        ipddp=ct.IPDDPOptions(
            barrier=ct.BarrierOptions(mu_initial=10.0),
            use_constraint_hessians=fix, slack_soc=fix,
        ),
    )


def test_soc_restores_exact_primal_feasibility():
    """Full certificate (VERDICT r3 #1): converged terminal status with BOTH
    primal and dual residuals under tolerance on the N=100 rendezvous at
    f64. The round-2 residual gap (inf_du stuck at ~1-5, status
    RegularizationLimitReached) was the f32-grade barrier-ratio cap 1e6
    (clipPositiveBarrierRatio) binding in the f64 endgame and distorting
    the condensed Newton system; with the dtype-aware cap (1e12 in f64) the
    dual re-centering steps go through and the solve certifies."""
    prob = _rendezvous()
    sol = ipddp.solve(prob, _opts(fix=True))
    # Converged terminal status — the full KKT certificate, not just primal.
    assert sol.status_message in (
        "OptimalSolutionFound", "AcceptableSolutionFound",
    ), (sol.status_message, float(sol.inf_du))
    assert float(sol.inf_pr) < 1e-5, float(sol.inf_pr)
    assert float(sol.inf_du) < 1e-4, float(sol.inf_du)
    # Goal reached and the thrust limit actually respected.
    assert float(jnp.linalg.norm(sol.state_trajectory[-1][:3])) < 1e-2
    umax = float(jnp.max(jnp.linalg.norm(sol.control_trajectory, axis=1)))
    assert umax <= 1.0 + 1e-8, umax
    # The barrier fully decayed (the old deadlock kept it at mu_initial).
    assert float(sol.barrier_mu) < 1e-4


def test_default_options_converge_via_stall_latch():
    """VERDICT r4 (round-3 item 3): the rendezvous family certifies with
    DEFAULT options. slack_soc/use_constraint_hessians default to "auto" —
    bit-parity iterates until the stall detector sees the alpha-pinned
    limit cycle (mu stuck + inf_pr far from tolerance for
    soc_stall_iterations consecutive iterations), then the SOC + exact
    Lagrangian curvature arm and break it."""
    prob = _rendezvous()
    sol = ipddp.solve(prob, ct.CDDPOptions(
        max_iterations=150, tolerance=1e-5, acceptable_tolerance=1e-6,
        ipddp=ct.IPDDPOptions(barrier=ct.BarrierOptions(mu_initial=10.0)),
    ))
    assert sol.status_message == "OptimalSolutionFound", (
        sol.status_message, float(sol.inf_pr))
    assert float(sol.inf_pr) < 1e-5
    umax = float(jnp.max(jnp.linalg.norm(sol.control_trajectory, axis=1)))
    assert umax <= 1.0 + 1e-8, umax
    assert float(sol.barrier_mu) < 1e-4


def test_reference_semantics_stall_documented():
    """The explicitly-disabled (reference-parity) configuration exhibits
    the limit cycle: mu pinned at mu_initial and a constraint-violating
    trajectory. This is the deadlock the default "auto" latch exists to
    beat (ipddp_solver.cpp:2548-2660 barrier logic); explicit False keeps
    it reachable for parity studies."""
    prob = _rendezvous()
    sol = ipddp.solve(prob, _opts(fix=False))
    assert float(sol.inf_pr) > 0.1
    assert float(sol.barrier_mu) >= 10.0 - 1e-9
