"""Chip A/B for the nonlinear-CG fleet engine (round 4, session q).

Where does the O(n)-state engine pay on a real v5e? Same-process
interleaved A/Bs (CLAUDE.md timing protocol: ONE combined readback per
timed call, min-of-3, idle host):

  A. 4096x60 Rosenbrock f32 tol 1e-3 — CG vs the tuned fused BFGS
     (official bench config; expectation: CG loses, the fleet is
     iteration-bound and BFGS curvature halves iterations)
  B. 1024x512 Rosenbrock — CG vs fused L-BFGS(10) (ring ~20 MB)
  C. 256x4096 Rosenbrock — CG vs fused L-BFGS(10, unroll=2) (ring 160 MB,
     the ring-bandwidth-bound regime the CG HBM argument targets)
  D. 1024x512 random ill-conditioned quadratic (cond 1e2) — CG vs L-BFGS
     (the curvature-memory-friendly case, as a control)

Run: python scripts/tpu_experiments_r4q.py
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

import quasinewtonmethods_jl_tpu as qnm
from quasinewtonmethods_jl_tpu.models import (
    rosenbrock_logdensity,
    rosenbrock_value_and_grad,
)

print("devices:", jax.devices(), flush=True)

TOL = 1e-3
rng = np.random.default_rng(20260819)


def fetch(r):
    # ONE combined scalar readback (the r4l lesson: a second sync
    # deflates every rate ~35% and can flip verdicts)
    return float(jnp.sum(r.x) + jnp.sum(r.status).astype(jnp.float32))


def timed(solve, X, reps=3):
    best = np.inf
    for _ in range(reps):
        t0 = time.perf_counter()
        fetch(solve(X))
        best = min(best, time.perf_counter() - t0)
    return best


def report(label, solve, X):
    r = solve(X)
    conv = int(jnp.sum(r.status == qnm.Status.CONVERGED))
    it = np.asarray(r.iterations)
    t = timed(solve, X)
    print(
        f"{label}: {X.shape[0] / t:,.0f} solves/s  wall={t * 1e3:.1f} ms  "
        f"converged={conv}/{X.shape[0]}  iters med/max={int(np.median(it))}/"
        f"{int(it.max())}",
        flush=True,
    )
    return X.shape[0] / t


# ---- A: 4096x60 Rosenbrock, CG vs fused BFGS --------------------------
X_a = jnp.asarray(rng.standard_normal((4096, 60)), jnp.float32)

def bfgs_a(X):
    return qnm.optimize_batched_fused(
        rosenbrock_logdensity, X, tol=TOL, max_iterations=3000,
        kernel="pallas", value_and_grad_fn=rosenbrock_value_and_grad,
    )

def cg_a(X):
    return qnm.optimize_cg(
        rosenbrock_logdensity, X, tol=TOL, max_iterations=3000,
        value_and_grad_fn=rosenbrock_value_and_grad,
    )

print("\n-- A: 4096x60 Rosenbrock (warmup absorbs axon init) --", flush=True)
fetch(bfgs_a(X_a)); fetch(cg_a(X_a))
ra_bfgs = report("A bfgs", bfgs_a, X_a)
ra_cg = report("A cg  ", cg_a, X_a)
ra_bfgs2 = report("A bfgs (repeat)", bfgs_a, X_a)
print(f"A ratio cg/bfgs: {ra_cg / max(ra_bfgs, ra_bfgs2):.2f}", flush=True)

# ---- B/C: large-n Rosenbrock fleets, CG vs fused L-BFGS ---------------
for batch, n, unroll, label in ((1024, 512, 1, "B"), (256, 4096, 2, "C")):
    X = jnp.asarray(rng.standard_normal((batch, n)), jnp.float32)

    def lbfgs_s(X, unroll=unroll):
        return qnm.optimize_lbfgs_batched(
            rosenbrock_logdensity, X, history=10, tol=TOL,
            max_iterations=3000, unroll=unroll,
            value_and_grad_fn=rosenbrock_value_and_grad,
        )

    def cg_s(X):
        return qnm.optimize_cg(
            rosenbrock_logdensity, X, tol=TOL, max_iterations=6000,
            value_and_grad_fn=rosenbrock_value_and_grad,
        )

    print(f"\n-- {label}: {batch}x{n} Rosenbrock --", flush=True)
    fetch(lbfgs_s(X)); fetch(cg_s(X))
    r1 = report(f"{label} lbfgs", lbfgs_s, X)
    r2 = report(f"{label} cg   ", cg_s, X)
    r3 = report(f"{label} lbfgs (repeat)", lbfgs_s, X)
    print(f"{label} ratio cg/lbfgs: {r2 / max(r1, r3):.2f}", flush=True)

# ---- D: 1024x512 quadratic cond 1e2 -----------------------------------
n_d = 512
r_d = np.random.default_rng(7)
diag = jnp.asarray(np.geomspace(1.0, 100.0, n_d), jnp.float32)
shift = jnp.asarray(r_d.standard_normal(n_d), jnp.float32)

def quad_obj(x):
    z = x - shift
    return -0.5 * jnp.sum(diag * z * z)

X_d = jnp.asarray(rng.standard_normal((1024, n_d)), jnp.float32)

def lbfgs_d(X):
    return qnm.optimize_lbfgs_batched(
        quad_obj, X, history=10, tol=TOL, max_iterations=3000,
    )

def cg_d(X):
    return qnm.optimize_cg(quad_obj, X, tol=TOL, max_iterations=6000)

print("\n-- D: 1024x512 quadratic cond 1e2 --", flush=True)
fetch(lbfgs_d(X_d)); fetch(cg_d(X_d))
r1 = report("D lbfgs", lbfgs_d, X_d)
r2 = report("D cg   ", cg_d, X_d)
r3 = report("D lbfgs (repeat)", lbfgs_d, X_d)
print(f"D ratio cg/lbfgs: {r2 / max(r1, r3):.2f}", flush=True)
