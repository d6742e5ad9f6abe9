"""Can the CG engine take the official bench headline? (round 4, session r)

EXACT bench.py protocol (seed 20260816, analytic rosenbrock vag, f32,
tol 1e-3, 4096x60, one combined readback) — fused-Pallas BFGS vs
nonlinear CG, single-call AND sustained (8 pipelined fleets, one
readback), interleaved in one process. Follow-up to r4q where CG won
1.18x on a different seed/protocol.

Run: python scripts/tpu_experiments_r4r.py
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

BATCH, N, TOL, K = 4096, 60, 1e-3, 8
rng = np.random.default_rng(20260816)


def solve_bfgs(X):
    return qnm.optimize_batched_fused(
        rosenbrock_logdensity, X, tol=TOL, max_iterations=3000,
        kernel="pallas", value_and_grad_fn=rosenbrock_value_and_grad,
    )


def solve_cg(X):
    return qnm.optimize_cg(
        rosenbrock_logdensity, X, tol=TOL, max_iterations=3000,
        value_and_grad_fn=rosenbrock_value_and_grad,
    )


def fetch(r):
    return float(jnp.sum(r.x) + jnp.sum(r.status).astype(jnp.float32))


X0 = jnp.asarray(rng.standard_normal((BATCH, N)), jnp.float32)
for s in (solve_bfgs, solve_cg):
    fetch(s(X0))  # warmup/compile (first absorbs axon init)

Xs = [jnp.asarray(rng.standard_normal((BATCH, N)), jnp.float32)
      for _ in range(K)]
for Xi in Xs:
    float(jnp.sum(Xi))


def single(solve, reps=3):
    best = np.inf
    for _ in range(reps):
        t0 = time.perf_counter()
        fetch(solve(X0))
        best = min(best, time.perf_counter() - t0)
    return BATCH / best


def sustained(solve, reps=3):
    best = np.inf
    for _ in range(reps):
        t0 = time.perf_counter()
        rs = [solve(Xi) for Xi in Xs]
        total = sum(jnp.sum(r.x) for r in rs) + sum(
            jnp.sum(r.status).astype(jnp.float32) for r in rs
        )
        float(total)  # ONE readback for the whole chain
        best = min(best, time.perf_counter() - t0)
    return K * BATCH / best


def conv(solve):
    r = solve(X0)
    return int(jnp.sum(r.status == qnm.Status.CONVERGED))


print(f"bfgs converged {conv(solve_bfgs)}/{BATCH}; "
      f"cg converged {conv(solve_cg)}/{BATCH}", flush=True)

# interleave A/B/A to bound session drift
for name, fn in (("single", single), ("sustained", sustained)):
    b1 = fn(solve_bfgs)
    c1 = fn(solve_cg)
    b2 = fn(solve_bfgs)
    c2 = fn(solve_cg)
    print(
        f"{name}: bfgs {b1:,.0f} / {b2:,.0f}  cg {c1:,.0f} / {c2:,.0f}  "
        f"ratio {max(c1, c2) / max(b1, b2):.3f}",
        flush=True,
    )
