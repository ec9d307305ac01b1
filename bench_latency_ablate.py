"""One-off ablation for the quadrotor single-solve latency (round-2 item 2).
Times IPDDP variants on the real TPU. Not part of the bench contract."""

import time

import jax
import jax.numpy as jnp


def build(dtype=jnp.float32):
    import cddp_tpu as ct
    from cddp_tpu.models import quadrotor

    dt, N = 0.02, 100
    model = quadrotor(mass=1.0, inertia=jnp.diag(jnp.asarray([0.01, 0.01, 0.02], dtype)),
                      arm_length=0.2, integration_type="rk4")
    nx, nu = 13, 4
    goal = jnp.zeros(nx, dtype).at[0].set(3.0).at[2].set(2.0).at[3].set(1.0)
    Q = jnp.zeros((nx, nx), dtype).at[4, 4].set(0.1).at[5, 5].set(0.1).at[6, 6].set(0.1)
    Qf = jnp.zeros((nx, nx), dtype)
    for i, v in ((0, 500.0), (1, 500.0), (2, 500.0), (3, 1.0), (4, 1.0),
                 (5, 1.0), (6, 1.0), (7, 10.0), (8, 10.0), (9, 10.0)):
        Qf = Qf.at[i, i].set(v)
    obj = ct.quadratic_objective(Q, 0.1 * jnp.eye(nu, dtype=dtype), Qf, goal, dt)
    x0 = jnp.zeros(nx, dtype).at[3].set(1.0)
    prob = ct.problem(model, obj, x0, N, dt)
    prob = prob.add_constraint(
        "ControlConstraint",
        ct.control_constraint(jnp.zeros(nu, dtype), jnp.full((nu,), 5.0, dtype)),
    )
    U0 = jnp.full((N, nu), 1.0 * 9.81 / 4.0, dtype)
    return prob, goal, U0


def run(name, prob, goal, U0, **kw):
    import cddp_tpu as ct
    from cddp_tpu.solvers import ipddp

    reps = kw.pop("reps", 3)
    opts = ct.CDDPOptions(
        max_iterations=kw.pop("max_iterations", 120),
        tolerance=1e-4,
        acceptable_tolerance=kw.pop("acceptable_tolerance", 1e-4),
        line_search=kw.pop("line_search",
                           ct.LineSearchOptions(max_iterations=15)),
        regularization=ct.RegularizationOptions(initial_value=1e-4),
        **kw,
    )
    f = jax.jit(lambda u0: ipddp.solve(prob, opts, U0=u0))
    t0 = time.perf_counter()
    sol = jax.block_until_ready(f(U0))
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(reps):
        sol = f(U0)
    jax.block_until_ready(sol)
    ms = (time.perf_counter() - t0) / reps * 1e3
    err = float(jnp.linalg.norm(sol.state_trajectory[-1][:3] - goal[:3]))
    print(f"{name:34s} {ms:9.1f} ms  iters={int(sol.iterations_completed):3d} "
          f"err={err:.4f} cost={float(sol.final_objective):.5f} "
          f"status={sol.status_message:28s} "
          f"compile={compile_s:.0f}s", flush=True)
    return ms


def main():
    prob, goal, U0 = build()
    run("baseline", prob, goal, U0)
    run("parallel_ls", prob, goal, U0, enable_parallel=True)
    run("fused_bp", prob, goal, U0, backward_engine="fused")
    run("parallel_ls+fused_bp", prob, goal, U0, enable_parallel=True,
        backward_engine="fused")
    run("iters=12 (per-iter probe)", prob, goal, U0, max_iterations=12)


def main_r4():
    """Round-4 sweep: close the 6% gap to the 118.6 ms native CPU proxy
    (VERDICT r3 item 4). Current bench config = parallel ls + parallel
    Riccati at ls_max=15 → 125.6 ms / 60 iters."""
    import cddp_tpu as ct

    prob, goal, U0 = build()
    kw_lqr = dict(ipddp=ct.IPDDPOptions(lqr_backend="parallel"))
    run("par_ls+par_lqr (bench cfg)", prob, goal, U0,
        enable_parallel=True, **kw_lqr)
    run("seq_ls+par_lqr", prob, goal, U0, **kw_lqr)
    run("par_ls11+par_lqr", prob, goal, U0, enable_parallel=True,
        line_search=ct.LineSearchOptions(max_iterations=11), **kw_lqr)
    run("par_ls8+par_lqr", prob, goal, U0, enable_parallel=True,
        line_search=ct.LineSearchOptions(max_iterations=8), **kw_lqr)


def main_r5():
    """Round-5 phase anatomy: where do the ~2 ms/iteration go at the bench
    config (par_ls + par_lqr, ls15, f32, matmul=highest)? Times the
    backward pass and the derivative sweep as standalone jits, derives the
    per-iteration slope from two solve budgets, and sweeps the scan-unroll
    knob (CDDP_TPU_SCAN_UNROLL)."""
    import cddp_tpu as ct
    from cddp_tpu.constraints.stack import PathStacker, TerminalStacker
    from cddp_tpu.solvers import base, ipddp

    prob, goal, U0 = build()
    kw_lqr = dict(ipddp=ct.IPDDPOptions(lqr_backend="parallel"))
    opts = ct.CDDPOptions(
        max_iterations=120, tolerance=1e-4, acceptable_tolerance=1e-4,
        line_search=ct.LineSearchOptions(max_iterations=15),
        regularization=ct.RegularizationOptions(initial_value=1e-4),
        enable_parallel=True, **kw_lqr,
    )
    dtype = jnp.float32
    stk = PathStacker(prob)
    tstk = TerminalStacker(prob)
    (X, U, Y, S, G, G_T, S_T, Y_T, Lam, Lam_te, mu0, reset) = (
        ipddp._initialize(prob, opts, stk, tstk, U0, None, False, dtype)
    )
    mu = jnp.asarray(mu0, dtype)
    reg = jnp.asarray(1e-4, dtype)

    def timeit(name, f, *args, reps=20):
        with jax.default_matmul_precision("highest"):
            out = jax.block_until_ready(f(*args))
            t0 = time.perf_counter()
            for _ in range(reps):
                out = f(*args)
            jax.block_until_ready(out)
        ms = (time.perf_counter() - t0) / reps * 1e3
        print(f"{name:34s} {ms:9.3f} ms", flush=True)
        return ms

    bw = jax.jit(lambda X, U, Y, S, G, mu, reg: ipddp._backward_condensed(
        prob, opts, stk, tstk, X, U, Y, S, G, Y_T, S_T, mu, reg))
    timeit("backward (parallel lqr)", bw, X, U, Y, S, G, mu, reg)

    opts_seq = opts.replace(ipddp=ct.IPDDPOptions(lqr_backend="sequential"))
    bw_s = jax.jit(lambda X, U, Y, S, G, mu, reg: ipddp._backward_condensed(
        prob, opts_seq, stk, tstk, X, U, Y, S, G, Y_T, S_T, mu, reg))
    timeit("backward (sequential lqr)", bw_s, X, U, Y, S, G, mu, reg)

    dv = jax.jit(lambda X, U: (
        base.discrete_jacobians(prob, X, U),
        base.running_cost_derivatives(prob, X, U),
    ))
    timeit("derivative sweep (A,B + cost)", dv, X, U)

    # Per-iteration slope from two budgets of the full solve.
    t10 = run("solve @10 iters", prob, goal, U0, max_iterations=10,
              enable_parallel=True, **kw_lqr)
    t60 = run("solve @60 iters", prob, goal, U0, max_iterations=60,
              enable_parallel=True, **kw_lqr)
    print(f"slope ~ {(t60 - t10) / 50.0:.3f} ms/iter", flush=True)
    run("full (bench cfg)", prob, goal, U0, enable_parallel=True, **kw_lqr)


def main_r5b():
    """Round-5 latency sweep (VERDICT r4 item 1): beat the 118.6 ms native
    CPU proxy on-chip. Axis 1 — iteration count via the barrier schedule
    (all candidates must still print OptimalSolutionFound at tol=1e-4);
    axis 2 — per-iteration cost via engine combos."""
    import cddp_tpu as ct
    from cddp_tpu.options import BarrierOptions, BarrierStrategy

    prob, goal, U0 = build()
    par = dict(enable_parallel=True,
               ipddp=ct.IPDDPOptions(lqr_backend="parallel"))
    run("bench cfg (reference point)", prob, goal, U0, **par)
    for name, bar in (
        ("mu_factor=0.2", BarrierOptions(mu_update_factor=0.2)),
        ("mu_factor=0.1", BarrierOptions(mu_update_factor=0.1)),
        ("mu0=0.1", BarrierOptions(mu_initial=0.1)),
        ("mu0=0.1,factor=0.2", BarrierOptions(mu_initial=0.1,
                                              mu_update_factor=0.2)),
        ("monotonic", BarrierOptions(strategy=BarrierStrategy.MONOTONIC)),
        ("ipopt", BarrierOptions(strategy=BarrierStrategy.IPOPT)),
    ):
        run(name, prob, goal, U0, enable_parallel=True,
            ipddp=ct.IPDDPOptions(lqr_backend="parallel", barrier=bar))
    run("seq_lqr (scan backward)", prob, goal, U0, enable_parallel=True)
    run("fused_bp", prob, goal, U0, enable_parallel=True,
        backward_engine="fused")


def main_r5c():
    """Phase 2: the MONOTONIC/IPOPT kappa rule certifies in ~half the
    iterations, but at acceptable_tolerance=1e-4 the run exits through the
    (weaker, sqrt-tol) acceptable path. Chase the full
    OptimalSolutionFound certificate at tol=1e-4 with the acceptable exit
    disabled."""
    import cddp_tpu as ct
    from cddp_tpu.options import BarrierOptions, BarrierStrategy

    prob, goal, U0 = build()

    def bar(**kw):
        return dict(enable_parallel=True, acceptable_tolerance=0.0,
                    ipddp=ct.IPDDPOptions(
                        lqr_backend="parallel",
                        barrier=BarrierOptions(**kw)))

    run("monotonic,atol=0", prob, goal, U0,
        **bar(strategy=BarrierStrategy.MONOTONIC))
    run("ipopt,atol=0", prob, goal, U0,
        **bar(strategy=BarrierStrategy.IPOPT))
    run("monotonic,atol=0,mu0=0.1", prob, goal, U0,
        **bar(strategy=BarrierStrategy.MONOTONIC, mu_initial=0.1))
    run("ipopt,atol=0,f=0.2", prob, goal, U0,
        **bar(strategy=BarrierStrategy.IPOPT, mu_update_factor=0.2))
    run("ipopt,atol=0,ls8", prob, goal, U0,
        line_search=ct.LineSearchOptions(max_iterations=8),
        **bar(strategy=BarrierStrategy.IPOPT))


def main_r5d():
    """Phase 3: squeeze the IPOPT kappa rule (best so far: f=0.2 ->
    104.5 ms / 47 iters, OptimalSolutionFound at tol=1e-4)."""
    import cddp_tpu as ct
    from cddp_tpu.options import BarrierOptions, BarrierStrategy

    prob, goal, U0 = build()

    def bar(kappa=None, **kw):
        ip = dict(lqr_backend="parallel",
                  barrier=BarrierOptions(
                      strategy=BarrierStrategy.IPOPT, **kw))
        if kappa is not None:
            ip["mu_kappa_epsilon"] = kappa
        return dict(enable_parallel=True, acceptable_tolerance=0.0,
                    ipddp=ct.IPDDPOptions(**ip))

    run("ipopt,f=0.1", prob, goal, U0, **bar(mu_update_factor=0.1))
    run("ipopt,f=0.2,mu0=0.5", prob, goal, U0,
        **bar(mu_update_factor=0.2, mu_initial=0.5))
    run("ipopt,f=0.2,pow=1.5", prob, goal, U0,
        **bar(mu_update_factor=0.2, mu_update_power=1.5))
    run("ipopt,f=0.2,kappa=100", prob, goal, U0,
        **bar(mu_update_factor=0.2, kappa=100.0))
    run("ipopt,f=0.2,kappa=100,pow=1.5", prob, goal, U0,
        **bar(mu_update_factor=0.2, mu_update_power=1.5, kappa=100.0))


def main_r5e():
    """Phase 4: matmul-precision ablation on the winning config
    (ipopt f=0.2). "high" = bf16_3x passes — if the on-chip tol=1e-4
    certificate survives (r3 pinned "highest" because plain bf16 broke
    it; 3-pass may be enough), the matmul cost halves. The winner must
    keep OptimalSolutionFound AND the 5.39274 cost; verify the true KKT
    via an f64 CPU re-check before adopting."""
    import cddp_tpu as ct
    from cddp_tpu.options import BarrierOptions, BarrierStrategy

    prob, goal, U0 = build()

    def cfgkw(prec):
        return dict(enable_parallel=True, acceptable_tolerance=0.0,
                    matmul_precision=prec,
                    ipddp=ct.IPDDPOptions(
                        lqr_backend="parallel",
                        barrier=BarrierOptions(
                            strategy=BarrierStrategy.IPOPT,
                            mu_update_factor=0.2)))

    run("ipopt,f=0.2,prec=highest", prob, goal, U0, **cfgkw("highest"))
    run("ipopt,f=0.2,prec=high", prob, goal, U0, **cfgkw("high"))
    run("ipopt,f=0.2,prec=default", prob, goal, U0, **cfgkw("default"))


def main_r5f():
    """Phase 5: per-iteration decomposition of the winning config (ipopt
    f=0.2, atol=0, par_ls + par_lqr = 98.4 ms / 47 iters). Slope from two
    budgets, then component swaps: sequential-scan backward (backward
    share), line-search ladder width (forward share)."""
    import cddp_tpu as ct
    from cddp_tpu.options import BarrierOptions, BarrierStrategy

    prob, goal, U0 = build()

    def cfgkw(lqr="parallel", ls=15):
        return dict(enable_parallel=True, acceptable_tolerance=0.0,
                    line_search=ct.LineSearchOptions(max_iterations=ls),
                    ipddp=ct.IPDDPOptions(
                        lqr_backend=lqr,
                        barrier=BarrierOptions(
                            strategy=BarrierStrategy.IPOPT,
                            mu_update_factor=0.2)))

    t10 = run("win @10 iters", prob, goal, U0, max_iterations=10,
              **cfgkw())
    t40 = run("win @40 iters", prob, goal, U0, max_iterations=40,
              **cfgkw())
    print(f"slope ~ {(t40 - t10) / 30.0:.3f} ms/iter, "
          f"intercept ~ {t10 - 10.0 * (t40 - t10) / 30.0:.1f} ms",
          flush=True)
    t10s = run("seq_lqr @10 iters", prob, goal, U0, max_iterations=10,
               **cfgkw(lqr="sequential"))
    t40s = run("seq_lqr @40 iters", prob, goal, U0, max_iterations=40,
               **cfgkw(lqr="sequential"))
    print(f"seq slope ~ {(t40s - t10s) / 30.0:.3f} ms/iter", flush=True)
    t10l = run("ls4 @10 iters", prob, goal, U0, max_iterations=10,
               **cfgkw(ls=4))
    t40l = run("ls4 @40 iters", prob, goal, U0, max_iterations=40,
               **cfgkw(ls=4))
    print(f"ls4 slope ~ {(t40l - t10l) / 30.0:.3f} ms/iter", flush=True)


def main_r5g():
    """Phase 6: IN-TRACE per-component slopes — each solver phase looped
    K times inside one jit (with an iteration-dependent perturbation so
    XLA cannot hoist it), timed at two K values. Isolates the real
    in-program cost of the derivative sweep, the parallel condensed
    backward, and the vmapped forward ladder at the winning config."""
    import cddp_tpu as ct
    from cddp_tpu.constraints.stack import PathStacker, TerminalStacker
    from cddp_tpu.solvers import base, ipddp

    prob, goal, U0 = build()
    dtype = jnp.float32
    opts = ct.CDDPOptions(
        max_iterations=120, tolerance=1e-4, acceptable_tolerance=0.0,
        line_search=ct.LineSearchOptions(max_iterations=15),
        regularization=ct.RegularizationOptions(initial_value=1e-4),
        enable_parallel=True,
        ipddp=ct.IPDDPOptions(lqr_backend="parallel"),
    )
    stk = PathStacker(prob)
    tstk = TerminalStacker(prob)
    (X, U, Y, S, G, G_T, S_T, Y_T, Lam, Lam_te, mu0, reset) = (
        ipddp._initialize(prob, opts, stk, tstk, U0, None, False, dtype)
    )
    mu = jnp.asarray(mu0, dtype)
    reg = jnp.asarray(1e-4, dtype)

    def timed_loop(name, body, x0):
        def loop(k, x):
            def it(i, x):
                return body(x + 1e-12 * i)
            return jax.lax.fori_loop(0, k, it, x)

        f = jax.jit(loop, static_argnums=0)
        with jax.default_matmul_precision("highest"):
            for k in (8, 40):
                jax.block_until_ready(f(k, x0))
            import time as _t
            ts = {}
            for k in (8, 40):
                t0 = _t.perf_counter()
                out = f(k, x0)
                jax.block_until_ready(out)
                ts[k] = _t.perf_counter() - t0
        ms = (ts[40] - ts[8]) / 32.0 * 1e3
        print(f"{name:34s} {ms:9.3f} ms/iter (in-trace)", flush=True)

    def derivs(Xp):
        A, B = base.discrete_jacobians(prob, Xp, U)
        lx, lu, lxx, luu, lux = base.running_cost_derivatives(prob, Xp, U)
        return Xp + 1e-30 * (A.sum() + lx.sum() + B.sum() + luu.sum())

    timed_loop("derivative sweep", derivs, X)

    def bwd(Xp):
        bp = ipddp._backward_condensed(
            prob, opts, stk, tstk, Xp, U, Y, S, G, Y_T, S_T, mu, reg
        )
        return Xp + 1e-30 * (bp.k_u.sum() + bp.inf_du)

    timed_loop("parallel condensed backward", bwd, X)

    def fwd(Xp):
        # the vmapped 15-rung closed-loop rollout + cost (the dominant
        # forward work; acceptance glue excluded)
        alphas = base.alphas_array(opts, dtype)
        ku = jnp.zeros_like(U)
        Ku = jnp.zeros((U.shape[0], U.shape[1], Xp.shape[1]), dtype)

        def roll(a):
            def step(x, inp):
                Xb, Ub, k_t, K_t, t = inp
                u = Ub + a * k_t + K_t @ (x - Xb)
                xn = prob.model.discrete_dynamics(x, u, t, prob.timestep)
                return xn, u

            ts_ = jnp.arange(U.shape[0], dtype=dtype) * prob.timestep
            xN, Us = jax.lax.scan(
                step, Xp[0], (Xp[:-1], U, ku, Ku, ts_)
            )
            return xN.sum() + Us.sum()

        v = jax.vmap(roll)(alphas)
        return Xp + 1e-30 * v.sum()

    timed_loop("15-rung vmapped rollout", fwd, X)


def main_r5h():
    """Phase 7: the fused streamed backward at B=1 (condensed_backward_op
    now routes unbatched TPU f32 through the Pallas kernel as a 128-lane
    singleton under backward_engine='fused') vs the 98.4 ms
    associative-scan record."""
    import cddp_tpu as ct
    from cddp_tpu.options import BarrierOptions, BarrierStrategy

    prob, goal, U0 = build()

    def cfgkw(be="auto", lqr="parallel"):
        return dict(enable_parallel=True, acceptable_tolerance=0.0,
                    backward_engine=be,
                    ipddp=ct.IPDDPOptions(
                        lqr_backend=lqr,
                        barrier=BarrierOptions(
                            strategy=BarrierStrategy.IPOPT,
                            mu_update_factor=0.2)))

    run("record (par lqr)", prob, goal, U0, **cfgkw())
    run("fused streamed backward", prob, goal, U0,
        **cfgkw(be="fused", lqr="sequential"))
    run("fused bwd @10 iters", prob, goal, U0, max_iterations=10,
        **cfgkw(be="fused", lqr="sequential"))
    run("fused bwd @40 iters", prob, goal, U0, max_iterations=40,
        **cfgkw(be="fused", lqr="sequential"))


def main_r5i():
    """Phase 8: intercept anatomy (rep amortization) + barrier tweaks on
    the fused-backward engine (65.6 ms / 49 iters record)."""
    import cddp_tpu as ct
    from cddp_tpu.options import BarrierOptions, BarrierStrategy

    prob, goal, U0 = build()

    def cfgkw(f=0.2, kappa=None, **bkw):
        ip = dict(lqr_backend="sequential",
                  barrier=BarrierOptions(strategy=BarrierStrategy.IPOPT,
                                         mu_update_factor=f, **bkw))
        if kappa is not None:
            ip["mu_kappa_epsilon"] = kappa
        return dict(enable_parallel=True, acceptable_tolerance=0.0,
                    backward_engine="fused",
                    ipddp=ct.IPDDPOptions(**ip))

    run("fused reps=3", prob, goal, U0, **cfgkw())
    run("fused reps=20", prob, goal, U0, reps=20, **cfgkw())
    run("fused f=0.15", prob, goal, U0, **cfgkw(f=0.15))
    run("fused f=0.25", prob, goal, U0, **cfgkw(f=0.25))
    run("fused f=0.3", prob, goal, U0, **cfgkw(f=0.3))
    run("fused f=0.2 kappa=100", prob, goal, U0, **cfgkw(kappa=100.0))
    run("fused f=0.2 mu0=0.5", prob, goal, U0, **cfgkw(mu_initial=0.5))


if __name__ == "__main__":
    import os

    if os.environ.get("ABLATE_R5I"):
        main_r5i()
    elif os.environ.get("ABLATE_R5H"):
        main_r5h()
    elif os.environ.get("ABLATE_R5G"):
        main_r5g()
    elif os.environ.get("ABLATE_R5F"):
        main_r5f()
    elif os.environ.get("ABLATE_R5E"):
        main_r5e()
    elif os.environ.get("ABLATE_R5D"):
        main_r5d()
    elif os.environ.get("ABLATE_R5C"):
        main_r5c()
    elif os.environ.get("ABLATE_R5B"):
        main_r5b()
    elif os.environ.get("ABLATE_R5"):
        main_r5()
    elif os.environ.get("ABLATE_R4"):
        main_r4()
    else:
        main()
