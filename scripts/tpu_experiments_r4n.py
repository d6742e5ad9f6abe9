"""Round-4: can the TR engine take the official bench headline?

EXACT bench.py protocol (seed 20260816, analytic rosenbrock vag, f32,
tol 1e-3, 4096x60, one combined readback) — BFGS-fused vs TR, in both
the single-call and sustained (8 pipelined fleets, one readback) shapes,
interleaved in one process.

Run: python scripts/tpu_experiments_r4n.py
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


def solve_tr(X):
    return qnm.optimize_tr(
        rosenbrock_logdensity, X, tol=TOL,
        value_and_grad_fn=rosenbrock_value_and_grad,
    )


def fetch(r):
    return float(jnp.sum(r.x) + jnp.sum(r.status).astype(jnp.float32))


X0 = jnp.asarray(rng.standard_normal((BATCH, N)), jnp.float32)
for s in (solve_bfgs, solve_tr):
    fetch(s(X0))  # warmup/compile

Xs = [jnp.asarray(rng.standard_normal((BATCH, N)), jnp.float32)
      for _ in range(K)]
for Xi in Xs:
    float(jnp.sum(Xi))


def single(solve):
    walls = []
    conv = 0
    for Xi in Xs[:4]:
        t0 = time.perf_counter()
        r = solve(Xi)
        fetch(r)
        walls.append(time.perf_counter() - t0)
        conv = int(jnp.sum(r.status == qnm.Status.CONVERGED))
    return min(walls), conv


def sustained(solve):
    def chain():
        acc = jnp.zeros((), jnp.float32)
        convs = jnp.zeros((), jnp.int32)
        for Xi in Xs:
            r = solve(Xi)
            acc = acc + jnp.sum(r.x)
            convs = convs + jnp.sum(
                (r.status == qnm.Status.CONVERGED).astype(jnp.int32))
        return float(acc), int(convs)

    chain()
    walls = []
    convs = 0
    for _ in range(3):
        t0 = time.perf_counter()
        _a, convs = chain()
        walls.append(time.perf_counter() - t0)
    return min(walls) / K, convs


# interleave: bfgs single, tr single, bfgs sustained, tr sustained
wb, cb = single(solve_bfgs)
wt, ct = single(solve_tr)
print(f"single  BFGS {wb*1e3:.1f} ms = {BATCH/wb:,.0f}/s (conv {cb}/{BATCH})",
      flush=True)
print(f"single  TR   {wt*1e3:.1f} ms = {BATCH/wt:,.0f}/s (conv {ct}/{BATCH})"
      f"  -> TR/BFGS {wb/wt:.3f}x", flush=True)
sb, scb = sustained(solve_bfgs)
st, sct = sustained(solve_tr)
print(f"sustain BFGS {sb*1e3:.1f} ms/fleet = {BATCH/sb:,.0f}/s "
      f"(conv {scb}/{K*BATCH})", flush=True)
print(f"sustain TR   {st*1e3:.1f} ms/fleet = {BATCH/st:,.0f}/s "
      f"(conv {sct}/{K*BATCH})  -> TR/BFGS {sb/st:.3f}x", flush=True)
# second interleaved pass to confirm within-session stability
wb2, _ = single(solve_bfgs)
wt2, _ = single(solve_tr)
print(f"repeat single: BFGS {BATCH/wb2:,.0f}/s  TR {BATCH/wt2:,.0f}/s",
      flush=True)
print("DONE", flush=True)
