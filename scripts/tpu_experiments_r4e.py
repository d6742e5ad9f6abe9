"""Round-4e chip measurements (VERDICT round-3 items 1 and 5).

Part A — resident engine on matvec objectives (now lowerable via the
selective dot rewrite): trajectory agreement vs the fused XLA engine
(statuses + iteration counts; floats to f32 tolerance — the mulsum
rewrite reassociates reductions) and a same-process wall A/B at the
same fleet shape.

Part B — adapt_mass='lowrank' vs the static LowRankMass MAP handoff vs
diag adaptation on the round-3b n=512 fixture (200x variance along 8
correlated directions, 1024 chains), same ChEES draw budget and the
same MAP-jittered starts. Metric: min device-side ESS and wall ->
ESS/s. VERDICT bar: beat the static handoff's ESS/wall.
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
import quasinewtonmethods_jl_tpu as qnm


def log(m):
    print(m, file=sys.stderr, flush=True)


def part_a():
    rng = np.random.default_rng(1)
    batch, n, m = 1024, 60, 256
    A = jnp.asarray(rng.standard_normal((m, n)) / np.sqrt(n), jnp.float32)
    yv = jnp.asarray((rng.random(m) < 0.5).astype(np.float32))

    def logistic(w):
        z = A @ w
        return jnp.sum(yv * z - jnp.logaddexp(0.0, z)) - 0.5 * jnp.sum(w * w)

    Qm = rng.standard_normal((n, n))
    Qm = jnp.asarray(Qm @ Qm.T / n + np.eye(n), jnp.float32)

    def quad(x):
        return -0.5 * x @ (Qm @ x)

    for name, obj in [("logistic m=256", logistic), ("quad", quad)]:
        X0 = jnp.asarray(rng.standard_normal((batch, n)) * 0.1, jnp.float32)
        kw = dict(tol=1e-3, max_iterations=500)
        rf = qnm.optimize_batched_fused(obj, X0, **kw)
        rr = qnm.optimize_batched_resident(obj, X0, **kw)
        jax.block_until_ready((rf.x, rr.x))
        same_status = int(jnp.sum(rf.status == rr.status))
        same_iters = int(jnp.sum(rf.iterations == rr.iterations))
        both_conv = (rf.status == qnm.Status.CONVERGED) & (
            rr.status == qnm.Status.CONVERGED
        )
        dx = jnp.where(
            both_conv[:, None], jnp.abs(rf.x - rr.x), 0.0
        )
        log(
            f"A {name}: conv fused "
            f"{int(jnp.sum(rf.status == qnm.Status.CONVERGED))} resident "
            f"{int(jnp.sum(rr.status == qnm.Status.CONVERGED))} /{batch}; "
            f"status match {same_status}, iter match {same_iters}, "
            f"max|dx| conv lanes {float(jnp.max(dx)):.2e}"
        )
        # same-process wall A/B (one combined readback per timed call)
        for ename, fn in [
            ("fused", lambda: qnm.optimize_batched_fused(obj, X0, **kw)),
            ("resident", lambda: qnm.optimize_batched_resident(
                obj, X0, **kw)),
        ]:
            fn()  # warm
            walls = []
            for _ in range(3):
                t0 = time.time()
                r = fn()
                float(jnp.sum(r.x) + jnp.sum(r.iterations))
                walls.append(time.time() - t0)
            w = min(walls)
            log(f"A {name} {ename}: {w*1e3:.1f} ms "
                f"({batch/w:.0f} solves/s)")


def part_b():
    n, k = 512, 8
    chains = 1024
    rng = np.random.default_rng(0)
    V, _ = np.linalg.qr(rng.standard_normal((n, k)))
    Vj = jnp.asarray(V, jnp.float32)
    sj = jnp.asarray(np.full(k, 0.995), jnp.float32)
    b = jnp.asarray(rng.standard_normal(n) * 0.1, jnp.float32)

    def logd(x):
        vx = Vj.T @ x
        return -0.5 * (x @ x - jnp.sum(sj * vx * vx)) + b @ x

    X0 = jnp.asarray(rng.standard_normal((chains, n)), jnp.float32)
    fleet = qnm.optimize_lbfgs_batched(
        logd, X0, history=2 * k + 4, tol=1e-3, max_iterations=2000
    )
    conv = int(jnp.sum(fleet.status == qnm.Status.CONVERGED))
    float(jnp.sum(fleet.x))
    log(f"B fleet: conv {conv}/{chains}")

    chs, mass_lr = qnm.chain_init_from_map(
        fleet, jitter=0.05, key=jax.random.PRNGKey(1), mass_form="lowrank"
    )
    draws, warm = 512, 512
    runs = [
        ("static-lowrank-handoff", dict(mass=mass_lr)),
        ("adapt-lowrank r=16", dict(adapt_mass="lowrank", mass_rank=16)),
        ("adapt-lowrank r=32", dict(adapt_mass="lowrank", mass_rank=32)),
        ("adapt-diag", dict(adapt_mass="diag")),
    ]
    for name, kw in runs:
        def run():
            r = qnm.chees_sample(
                logd, jax.random.PRNGKey(2), chs,
                n_samples=draws, n_warmup=warm, **kw,
            )
            d = qnm.diagnose_chains_device(r.samples)
            return r, d

        r, d = run()  # warm + correctness numbers
        ess_min = float(jnp.min(d.ess))
        rhat = float(jnp.max(d.rhat))
        t0 = time.time()
        r, d = run()
        ess_min = float(jnp.min(d.ess))
        wall = time.time() - t0
        log(
            f"B chees {name}: min ESS {ess_min:.0f} / {draws*chains} "
            f"draws, max rhat {rhat:.3f}, acc "
            f"{float(r.accept_rate.mean()):.2f}, wall {wall:.1f}s -> "
            f"{ess_min/wall:.0f} ESS/s"
        )


def main():
    log(f"device {jax.devices()[0]}")
    part_a()
    part_b()
    print("DONE")


if __name__ == "__main__":
    main()
