"""Barrier-schedule sweep for the quadrotor latency bench (proxy chase)."""
import bench_latency_ablate as bla
import cddp_tpu as ct


def main():
    prob, goal, U0 = bla.build()
    base = dict(enable_parallel=True)

    def ip(**kw):
        return ct.IPDDPOptions(lqr_backend="parallel", **kw)

    bla.run("bench cfg (mu=1 ADAPTIVE)", prob, goal, U0,
            ipddp=ip(), **base)
    bla.run("mu0=0.1 ADAPTIVE", prob, goal, U0,
            ipddp=ip(barrier=ct.BarrierOptions(mu_initial=0.1)), **base)
    bla.run("mu0=0.01 ADAPTIVE", prob, goal, U0,
            ipddp=ip(barrier=ct.BarrierOptions(mu_initial=0.01)), **base)
    bla.run("mu0=1 MONOTONIC", prob, goal, U0,
            ipddp=ip(barrier=ct.BarrierOptions(
                strategy=ct.BarrierStrategy.MONOTONIC)), **base)
    bla.run("mu0=1 IPOPT", prob, goal, U0,
            ipddp=ip(barrier=ct.BarrierOptions(
                strategy=ct.BarrierStrategy.IPOPT)), **base)
    bla.run("mu0=0.1 fac=0.2", prob, goal, U0,
            ipddp=ip(barrier=ct.BarrierOptions(
                mu_initial=0.1, mu_update_factor=0.2)), **base)


if __name__ == "__main__":
    main()
