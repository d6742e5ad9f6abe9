"""Round-3 chip measurements (one v5e via axon):

  1. map_then_sample DEFAULT pipeline (device diagnostics) at 4096 chains
     x 1M draws — the round-2 default took 39 s (host FFT fetch); the
     acceptance bar is < 1 s end to end.
  2. Dense fleet-covariance mass adaptation vs oracle dense-B on the
     correlated Gaussian, fleet scale (ChEES draws/s + NUTS depth).
  3. polish_newton before/after gradient-norm distribution on the
     benchmark Rosenbrock fleet.

Run: `timeout 2400 python scripts/tpu_experiments_r3a.py` (background;
first axon init takes minutes).
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
import quasinewtonmethods_jl_tpu as qnm
from quasinewtonmethods_jl_tpu.models import rosenbrock_logdensity


def log(m):
    print(m, file=sys.stderr, flush=True)


def sync(x):
    return float(jnp.sum(x))


def main():
    log(f"device {jax.devices()[0]}")
    n = 60
    chains = 4096
    rng = np.random.default_rng(0)

    # correlated Gaussian target (the dense-mass benchmark)
    rho = 0.9
    C = np.full((n, n), rho) + (1 - rho) * np.eye(n)
    scales = np.geomspace(0.5, 5.0, n)
    C = C * np.outer(scales, scales)
    Ci = jnp.asarray(np.linalg.inv(C), jnp.float32)
    Cj = jnp.asarray(C, jnp.float32)

    def logd(x):
        return -0.5 * x @ Ci @ x

    # ---------------- 1. default pipeline end to end ----------------
    draws = 256  # x 4096 chains = 1,048,576 draws (the round-2 shape)
    key = jax.random.PRNGKey(0)

    def pipeline():
        out = qnm.map_then_sample(
            logd, key, jnp.zeros((n,), jnp.float32), n_chains=chains,
            n_samples=draws, n_warmup=200, sampler="chees",
        )
        # force: diagnostics summaries + one sample scalar
        return (
            sync(out.diagnostics.rhat) + sync(out.diagnostics.ess)
            + sync(out.samples[-1])
        )

    t0 = time.time()
    pipeline()
    log(f"pipeline warmup (incl axon init + compile): {time.time()-t0:.1f}s")
    ts = []
    for _ in range(3):
        t0 = time.time()
        pipeline()
        ts.append(time.time() - t0)
    log(
        f"[1] map_then_sample DEFAULT (4096x{draws}=1.05M draws, device "
        f"diagnostics): best {min(ts)*1e3:.0f} ms (round-2 default: 39 s)"
    )

    # ---------------- 2. dense fleet mass vs oracle ----------------
    x0 = jnp.zeros((chains, n), jnp.float32)
    kw = dict(n_samples=256, n_warmup=300)

    def run_chees(mass, adapt):
        r = qnm.chees_sample(
            logd, jax.random.PRNGKey(1), x0, mass=mass, adapt_mass=adapt,
            **kw,
        )
        sync(r.samples[-1])
        return r

    for name, mass, adapt in [
        ("oracle-denseC", Cj, False),
        ("adapt-diag", None, "diag"),
        ("adapt-dense", None, "dense"),
    ]:
        t0 = time.time()
        r = run_chees(mass, adapt)
        warm = time.time() - t0
        t0 = time.time()
        r = run_chees(mass, adapt)
        wall = time.time() - t0
        total = kw["n_samples"] * chains
        log(
            f"[2] chees {name}: {total/wall/1e6:.1f}M draws/s "
            f"(T {float(r.traj_length):.2f}, eps {float(r.step_size):.3f}, "
            f"acc {float(r.accept_rate.mean()):.2f}; warm {warm:.1f}s)"
        )

    nk = dict(n_samples=64, n_warmup=150, max_depth=9)
    for name, mass, adapt in [
        ("oracle-denseC", Cj, False),
        ("adapt-diag", None, "diag"),
        ("adapt-dense", None, "dense"),
    ]:
        r = qnm.nuts_sample(
            logd, jax.random.PRNGKey(2), x0[:1024], mass=mass,
            adapt_mass=adapt, **nk,
        )
        sync(r.samples[-1])
        d = float(r.mean_tree_depth.mean())
        log(
            f"[2] nuts {name}: mean depth {d:.2f} (~{2**d:.1f} grads/draw) "
            f"acc {float(r.accept_prob.mean()):.2f}"
        )

    # ---------------- 3. polish on the benchmark fleet ----------------
    X = jnp.asarray(rng.standard_normal((4096, 60)), jnp.float32)
    res = qnm.optimize_batched_fused(
        rosenbrock_logdensity, X, tol=1e-3, max_iterations=3000,
        kernel="pallas",
    )
    sync(res.x)
    t0 = time.time()
    pol = qnm.polish_newton(rosenbrock_logdensity, res, steps=3)
    sync(pol.x)
    warm = time.time() - t0
    t0 = time.time()
    pol = qnm.polish_newton(rosenbrock_logdensity, res, steps=3)
    sync(pol.x)
    wall = time.time() - t0
    nb = np.asarray(pol.grad_norm_before)
    na = np.asarray(pol.grad_norm_after)
    log(
        f"[3] polish 4096x60 f32: {wall*1e3:.1f} ms (warm {warm:.1f}s); "
        f"max|grad| before med {np.median(nb):.2e} p99 "
        f"{np.quantile(nb, 0.99):.2e} max {nb.max():.2e} -> after med "
        f"{np.median(na):.2e} p99 {np.quantile(na, 0.99):.2e} max "
        f"{na.max():.2e}; improved {int(np.asarray(pol.improved).sum())}"
        f"/4096"
    )
    print("DONE")


if __name__ == "__main__":
    main()
