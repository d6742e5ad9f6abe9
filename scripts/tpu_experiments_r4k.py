"""Round-4 chip measurements: replica exchange + AIS evidence at fleet
scale on the real v5e (f32 throughput contract).

 1. PT fleet on the bimodal mixture (n=8, modes ±3, weights 0.75/0.25,
    all 4096 chains started in the heavy basin): mode-mass recovery +
    draws/s, with a plain-HMC control (stuck by construction) and an
    unimodal-PT control (the K× gradient premium accounting).
 2. AIS evidence on the same mixture from a covering base: logZ vs the
    analytic truth vs Laplace's one-basin bias, wall for
    8192 particles × 128 rungs.

One combined readback per timed call; warmup absorbs the axon init.

Run: python scripts/tpu_experiments_r4k.py   (first jit ~3-10 min)
"""

import math
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

import quasinewtonmethods_jl_tpu as qnm
from quasinewtonmethods_jl_tpu.models import GaussianMixture

print("devices:", jax.devices(), flush=True)

N = 8
CHAINS = 4096
K = 8
N_S, N_W = 256, 256

mu = np.zeros((2, N), np.float32)
mu[0, :] = 3.0
mu[1, :] = -3.0
mix = GaussianMixture(means=jnp.asarray(mu), weights=[0.75, 0.25],
                      sigmas=1.0)
x0s = jnp.asarray(mu[0])[None, :] + 0.1 * jax.random.normal(
    jax.random.PRNGKey(1), (CHAINS, N), jnp.float32
)


def readback(x):
    return float(jnp.sum(jnp.where(jnp.isfinite(x), x, 0.0)))


# --- 1. PT vs stuck-HMC at fleet scale -----------------------------------
def run_pt():
    res = qnm.pt_sample(mix.logdensity, jax.random.PRNGKey(2), x0s,
                        n_temps=K, beta_min=0.05, n_samples=N_S,
                        n_warmup=N_W, n_leapfrog=8)
    readback(res.samples)
    return res


def run_hmc():
    res = qnm.hmc_sample(mix.logdensity, jax.random.PRNGKey(2), x0s,
                         n_samples=N_S, n_warmup=N_W, n_leapfrog=8)
    readback(res.samples)
    return res


run_pt(); run_hmc()  # warmup (compile + axon init)
t0 = time.time(); pt = run_pt(); t_pt = time.time() - t0
t0 = time.time(); hm = run_hmc(); t_hmc = time.time() - t0
w_pt = np.asarray(mix.mode_weights(pt.samples))
w_hmc = np.asarray(mix.mode_weights(hm.samples))
draws = N_S * CHAINS
print(f"[1] PT {K}x{CHAINS}x{N}: wall {t_pt:.2f}s "
      f"({draws / t_pt / 1e6:.2f}M draws/s), mode w {w_pt.round(3)} "
      f"(true [0.75 0.25]), swap {np.asarray(pt.swap_rate).round(2)}, "
      f"round trips/chain {float(np.mean(np.asarray(pt.round_trips))):.1f}",
      flush=True)
print(f"[1] HMC control: wall {t_hmc:.2f}s ({draws / t_hmc / 1e6:.2f}M "
      f"draws/s), mode w {w_hmc.round(3)} (stuck expected), "
      f"PT premium {t_pt / t_hmc:.1f}x (ladder K={K})", flush=True)

# unimodal control: the same ladder on a standard Gaussian — pure cost
sn = lambda x: -0.5 * jnp.sum(x * x)


def run_pt_uni():
    res = qnm.pt_sample(sn, jax.random.PRNGKey(3),
                        jnp.zeros((CHAINS, N), jnp.float32), n_temps=K,
                        beta_min=0.05, n_samples=N_S, n_warmup=N_W,
                        n_leapfrog=8)
    readback(res.samples)
    return res


run_pt_uni()
t0 = time.time(); run_pt_uni(); t_uni = time.time() - t0
print(f"[1b] PT unimodal control: {draws / t_uni / 1e6:.2f}M draws/s",
      flush=True)

# --- 2. AIS evidence ------------------------------------------------------
logz_true = 0.5 * N * math.log(2 * math.pi)
sol = qnm.optimize(mix.logdensity, jnp.asarray(mu[0]) + 0.3, tol=1e-3)
lz_lap = float(qnm.laplace_evidence(sol, obj=mix.logdensity))

base = (jnp.zeros(N, jnp.float32), jnp.full((N,), 16.0, jnp.float32))


def run_ais():
    res = qnm.ais_evidence(mix.logdensity, jax.random.PRNGKey(4), base,
                           n_particles=8192, n_steps=128, n_leapfrog=8,
                           schedule=2.0)
    readback(res.logw)
    return res


run_ais()
t0 = time.time(); ais = run_ais(); t_ais = time.time() - t0
print(f"[2] AIS 8192x{N} 128 rungs: wall {t_ais:.2f}s, "
      f"logZ {float(ais.logZ):.3f} (true {logz_true:.3f}, "
      f"laplace {lz_lap:.3f} -> bias {logz_true - lz_lap:+.3f}), "
      f"weight ESS {float(ais.ess):.0f}/8192, "
      f"acc last rung {float(ais.accept_rate[-1]):.2f}", flush=True)

print("DONE", flush=True)
