"""Round-5 session e: per-lane-data constrained fleet + scan-resident
timing on chip.

1. constraint_data fleet: 4096 lanes, each with ITS OWN disk radius
   (r^2 uniform in [20, 50] — mixed active/inactive at the optimum
   ||x*||^2 = 60) — convergence + solves/s for the chip record;
2. AR1DriftMAP fleet (the scan-shaped objective): resident engine
   (one-hot fori rewrite) vs the fused per-iteration engine, 128 lanes
   — correctness parity on chip plus the wall comparison the O(T)/step
   one-hot cost note predicts.

Run: python scripts/tpu_experiments_r5e.py
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

import quasinewtonmethods_jl_tpu as qnm
from quasinewtonmethods_jl_tpu.models import AR1DriftMAP, rosenbrock_logdensity

print("devices:", jax.devices(), flush=True)


def readback(*xs):
    return float(sum(jnp.sum(jnp.where(jnp.isfinite(x), x, 0.0)) for x in xs))


t0 = time.perf_counter()
print("warmup sum:", float(jnp.sum(jnp.ones(8))),
      f"({time.perf_counter()-t0:.0f}s)", flush=True)

# --- (1) per-lane-radius constrained fleet ---
B, N = 4096, 60
rng = np.random.default_rng(20260820)
X0 = jnp.asarray(rng.standard_normal((B, N)), jnp.float32) * 0.5
r2s = jnp.asarray(rng.uniform(20.0, 50.0, B), jnp.float32)


def disk(z, r2):
    return r2 - jnp.sum(z * z)


def fn(X):
    return qnm.optimize_auglag(
        rosenbrock_logdensity, X, ineq=disk, constraint_data=r2s,
        engine="cg", tol=1e-3, ctol=1e-3, max_iterations=2000,
    )


r = fn(X0)
readback(r.x)
t0 = time.perf_counter()
r = fn(X0)
readback(r.x)
dt = time.perf_counter() - t0
conv = int(jnp.sum(r.status == qnm.Status.CONVERGED))
# active lanes (mu > 0) sit on their own sphere; inactive reach ||x||^2=60
norms2 = jnp.sum(r.x**2, -1)
active = r.mu[:, 0] > 1e-3
on_own = jnp.max(jnp.abs(jnp.where(active, norms2 - r2s, 0.0)))
print(f"per-lane-radius fleet: conv {conv}/{B}  {B/dt:.0f} solves/s"
      f"  active lanes {int(jnp.sum(active))}  max|(x^2-r_i^2)| on active"
      f" {float(on_own):.2e}  max_viol {float(jnp.max(r.viol)):.2e}",
      flush=True)

# --- (2) AR1 scan objective: resident vs fused, 128 lanes ---
from quasinewtonmethods_jl_tpu.batched_solve import optimize_batched_fused
from quasinewtonmethods_jl_tpu.resident_solve import optimize_batched_resident

m = AR1DriftMAP(dimension=8, n_steps=16, dtype=jnp.float32)
X0a = jnp.asarray(rng.standard_normal((128, 8)), jnp.float32)

res_r = optimize_batched_resident(m, X0a, tol=1e-3, block_batch=128)
readback(res_r.x)
t0 = time.perf_counter()
res_r = optimize_batched_resident(m, X0a, tol=1e-3, block_batch=128)
readback(res_r.x)
dt_r = time.perf_counter() - t0

res_f = optimize_batched_fused(m, X0a, tol=1e-3)
readback(res_f.x)
t0 = time.perf_counter()
res_f = optimize_batched_fused(m, X0a, tol=1e-3)
readback(res_f.x)
dt_f = time.perf_counter() - t0

conv_r = int(jnp.sum(res_r.status == qnm.Status.CONVERGED))
conv_f = int(jnp.sum(res_f.status == qnm.Status.CONVERGED))
dx = float(jnp.max(jnp.abs(res_r.x - res_f.x)))
print(f"AR1 scan fleet 128x8 (T=16): resident {dt_r*1e3:.1f} ms"
      f" (conv {conv_r}/128), fused {dt_f*1e3:.1f} ms (conv {conv_f}/128),"
      f" max|dx| {dx:.2e}", flush=True)
print("done", flush=True)
