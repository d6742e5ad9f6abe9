"""Round-4 chip measurements: Pathfinder at f32 on the real TPU.

 1. Logistic-regression MAP posterior n=100 (the BASELINE config-3 class,
    near-Gaussian): pathfinder wall + khat, then an interleaved A/B of
    the two pipeline inits at the same draw budget —
      A: map_then_sample(init='map')        (fleet MAP + jittered starts)
      B: map_then_sample(init='pathfinder') (resampled draws + lowrank mass)
    reporting wall and min-ESS/s for each (same-process, one readback per
    timed call).
 2. Neal's funnel n=60: khat is EXPECTED to blow past 0.7 (no Gaussian
    fits a funnel) — recorded as the honest negative + the documented
    "fall back to warmup" signal.

Run: python scripts/tpu_experiments_r4j.py   (axon TPU; first jit ~3-10 min)
"""

import sys, time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

import quasinewtonmethods_jl_tpu as qnm
from quasinewtonmethods_jl_tpu.models import LogisticRegressionMAP, funnel_logdensity

print("devices:", jax.devices(), flush=True)


def readback(x):
    return float(jnp.sum(jnp.where(jnp.isfinite(x), x, 0.0)))


# ---------------------------------------------------------------------------
# 1. logistic n=100 f32
m = LogisticRegressionMAP(dimension=100, n_obs=500, seed=0, dtype=jnp.float32)
n = 100
key = jax.random.key(0)

def run_pf():
    pf = qnm.pathfinder(m, jax.random.key(1), jnp.zeros(n, jnp.float32),
                        n_paths=8, n_draws=1024, max_iters=48,
                        elbo_draws=16, tol=1e-3)
    readback(pf.draws)
    return pf

pf = run_pf()  # warmup (compile + axon init)
t0 = time.time(); pf = run_pf(); t1 = time.time()
print(f"[1] pathfinder 8 paths n=100: wall {t1-t0:.2f}s, khat {float(pf.khat):.3f}, "
      f"elbo {np.asarray(pf.elbo).round(1)}, iters {np.asarray(pf.iterations)}",
      flush=True)

N_CH, N_S, N_W = 256, 256, 256

def run_map_init():
    out = qnm.map_then_sample(m, jax.random.key(2), jnp.zeros(n, jnp.float32),
                              n_chains=N_CH, n_samples=N_S, n_warmup=N_W)
    readback(out.samples)
    return out

def run_pf_init():
    out = qnm.map_then_sample(m, jax.random.key(2), jnp.zeros(n, jnp.float32),
                              n_chains=N_CH, n_samples=N_S, n_warmup=N_W,
                              init="pathfinder",
                              pathfinder_kwargs=dict(n_paths=8, max_iters=48,
                                                     tol=1e-3))
    readback(out.samples)
    return out

run_map_init(); run_pf_init()  # warm both programs
for label, fn in (("map-init", run_map_init), ("pf-init", run_pf_init)):
    walls, ess = [], []
    for _ in range(3):
        s = time.time(); out = fn(); walls.append(time.time() - s)
        ess.append(float(np.nanmin(np.asarray(out.diagnostics.ess))))
    w = float(np.median(walls)); e = float(np.median(ess))
    print(f"[1b] {label}: wall {w:.2f}s, min-ESS {e:.0f}, min-ESS/s {e/w:.0f}, "
          f"max rhat {float(np.nanmax(np.asarray(out.diagnostics.rhat))):.3f}",
          flush=True)

# ---------------------------------------------------------------------------
# 2. funnel: the honest negative (khat must flag the failure)
fn60 = lambda x: funnel_logdensity(x)
pffun = qnm.pathfinder(fn60, jax.random.key(3), jnp.zeros(60, jnp.float32),
                       n_paths=8, n_draws=512, max_iters=48, tol=1e-3)
readback(pffun.draws)
print(f"[2] funnel n=60: khat {float(pffun.khat):.3f} "
      f"(> 0.7 expected: no Gaussian fits a funnel — the documented "
      f"fall-back-to-warmup signal)", flush=True)

print("DONE", flush=True)
