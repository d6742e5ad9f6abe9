"""Round-2 part N: batched sampler throughput on the chip (HMC + ChEES).

The MAP->HMC workflow's sampling half, measured at fleet scale: 4096
chains on the n=60 workload (dense-mass HMC, the chain_init_from_map
handoff shape) and ChEES with fleet adaptation. Metric: gradient
evaluations/s (the sampler cost unit) and draws/s.
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
import quasinewtonmethods_jl_tpu as qnm

RNG = np.random.default_rng(20260816)
def log(m): print(m, flush=True)
log(f"device: {jax.devices()[0]}")

n, chains = 60, 4096
prec = jnp.asarray(RNG.standard_normal((n, n)) * 0.1, jnp.float32)
prec = prec @ prec.T + jnp.eye(n, dtype=jnp.float32)

def logdensity(x):
    return -0.5 * x @ (prec @ x)

x0s = jnp.zeros((chains, n), jnp.float32)
cov = jnp.linalg.inv(prec)

n_samples, n_warmup, n_leap = 256, 128, 16

def run_hmc():
    r = qnm.hmc_sample(logdensity, jax.random.PRNGKey(0), x0s, mass=cov,
                       n_samples=n_samples, n_warmup=n_warmup,
                       n_leapfrog=n_leap)
    float(jnp.sum(r.final_x) + jnp.sum(r.accept_rate))
    return r

r = run_hmc(); best = np.inf
for _ in range(3):
    t0 = time.perf_counter(); r = run_hmc()
    best = min(best, time.perf_counter() - t0)
gev = (n_samples + n_warmup) * chains * (n_leap + 1)
log(f"hmc 4096x60 dense-mass: {best*1e3:.0f} ms, "
    f"{gev/best/1e6:.1f}M grad-evals/s, "
    f"{n_samples*chains/best/1e3:.0f}k draws/s, "
    f"acc {float(jnp.mean(r.accept_rate)):.2f}")

def run_chees():
    r = qnm.chees_sample(logdensity, jax.random.PRNGKey(1), x0s,
                         n_samples=n_samples, n_warmup=n_warmup,
                         max_leapfrog=64)
    float(jnp.sum(r.final_x) + jnp.sum(r.accept_rate))
    return r

r = run_chees(); best = np.inf
for _ in range(3):
    t0 = time.perf_counter(); r = run_chees()
    best = min(best, time.perf_counter() - t0)
log(f"chees 4096x60: {best*1e3:.0f} ms, {n_samples*chains/best/1e3:.0f}k draws/s, "
    f"acc {float(jnp.mean(r.accept_rate)):.2f}, T {float(r.traj_length):.2f}, "
    f"eps {float(r.step_size):.3f}")
log("done")

# ---- appended: NUTS fleet throughput (the lockstep-tree cost, measured) ----
def run_nuts():
    r = qnm.nuts_sample(logdensity, jax.random.PRNGKey(2), x0s,
                        n_samples=n_samples, n_warmup=n_warmup, max_depth=8)
    float(jnp.sum(r.final_x) + jnp.sum(r.accept_prob))
    return r

r = run_nuts(); best = np.inf
for _ in range(3):
    t0 = time.perf_counter(); r = run_nuts()
    best = min(best, time.perf_counter() - t0)
log(f"nuts 4096x60: {best*1e3:.0f} ms, {n_samples*chains/best/1e3:.0f}k draws/s, "
    f"acc {float(jnp.mean(r.accept_prob)):.2f}, "
    f"mean depth {float(jnp.mean(r.mean_tree_depth)):.2f}")
log("nuts done")
