"""Round-3b chip measurement: the LARGE-n dense-free pipeline.

n=512 correlated Gaussian (low-rank-structured precision, so the
objective is O(nk) — no n x n matvec anywhere): L-BFGS fleet MAP ->
`chain_init_from_map` handoff -> HMC, comparing the round-3 `LowRankMass`
(ring correlation structure kept) against the diagonal handoff on the
SAME draws budget. Metric: min effective sample size across dimensions
(device-side ESS) and draws/s.
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


def main():
    log(f"device {jax.devices()[0]}")
    n, k = 512, 8
    chains = 1024
    rng = np.random.default_rng(0)
    V, _ = np.linalg.qr(rng.standard_normal((n, k)))
    s = np.full(k, 0.995)  # strong correlation along 8 directions
    Vj = jnp.asarray(V, jnp.float32)
    sj = jnp.asarray(s, jnp.float32)
    b = jnp.asarray(rng.standard_normal(n) * 0.1, jnp.float32)

    def logd(x):
        # precision I - V diag(s) V^T  (PD; cov has 1/(1-s) = 200x variance
        # along V) plus a linear term to put the mode off the origin
        vx = Vj.T @ x
        return -0.5 * (x @ x - jnp.sum(sj * vx * vx)) + b @ x

    X0 = jnp.asarray(rng.standard_normal((chains, n)), jnp.float32)
    t0 = time.time()
    fleet = qnm.optimize_lbfgs_batched(
        logd, X0, history=2 * k + 4, tol=1e-3, max_iterations=2000
    )
    conv = int(jnp.sum(fleet.status == qnm.Status.CONVERGED))
    float(jnp.sum(fleet.x))
    log(f"L-BFGS fleet {chains}x{n}: conv {conv}/{chains} "
        f"itmax {int(fleet.iterations.max())} ({time.time()-t0:.1f}s warm)")

    draws, warm = 512, 512
    for name, mass_form in [("diag", "auto"), ("lowrank", "lowrank")]:
        chs, mass = qnm.chain_init_from_map(
            fleet, jitter=0.05, key=jax.random.PRNGKey(1),
            mass_form=mass_form,
        )
        r = qnm.hmc_sample(
            logd, jax.random.PRNGKey(2), chs, mass=mass,
            n_samples=draws, n_warmup=warm, n_leapfrog=16,
        )
        d = qnm.diagnose_chains_device(r.samples)
        ess_min = float(jnp.min(d.ess))
        float(jnp.sum(r.samples[-1]))
        t0 = time.time()
        r = qnm.hmc_sample(
            logd, jax.random.PRNGKey(2), chs, mass=mass,
            n_samples=draws, n_warmup=warm, n_leapfrog=16,
        )
        d = qnm.diagnose_chains_device(r.samples)
        ess_min = float(jnp.min(d.ess))
        rhat = float(jnp.max(d.rhat))
        wall = time.time() - t0
        total = draws * chains
        log(f"hmc {name}-mass: min ESS {ess_min:.0f} / {total} draws, "
            f"max rhat {rhat:.3f}, acc {float(r.accept_rate.mean()):.2f}, "
            f"{total/wall/1e6:.2f}M draws/s")
    print("DONE")


if __name__ == "__main__":
    main()
