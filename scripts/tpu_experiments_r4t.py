"""CG fold_eval A/B on a matvec objective (round 4, session t).

fold_eval skips the top-of-iteration evaluation (~40% fewer evals/iter);
on the cheap elementwise Rosenbrock it measured wall-neutral (r4r:
196.7k vs 208k sustained across sessions, within axon drift — the
objective fuses into the search). The case it was built for is the
matvec objective, where value_and_grad dominates the iteration:
4096-lane logistic MAP fleet (n=100, 500 obs) — fold on vs off,
same-process interleaved, one combined readback.

Run: python scripts/tpu_experiments_r4t.py
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

import quasinewtonmethods_jl_tpu as qnm
from quasinewtonmethods_jl_tpu.models import LogisticRegressionMAP

print("devices:", jax.devices(), flush=True)

B, TOL = 4096, 1e-3
model = LogisticRegressionMAP(dimension=100, n_obs=500, dtype=jnp.float32)
rng = np.random.default_rng(20260819)
X0 = jnp.asarray(rng.standard_normal((B, 100)), jnp.float32) * 0.1


def solve(fold):
    def fn(X):
        return qnm.optimize_cg(
            model, X, tol=TOL, max_iterations=3000, fold_eval=fold
        )

    return fn


def fetch(r):
    return float(jnp.sum(r.x) + jnp.sum(r.status).astype(jnp.float32))


def timed(fn, reps=3):
    best = np.inf
    for _ in range(reps):
        t0 = time.perf_counter()
        fetch(fn(X0))
        best = min(best, time.perf_counter() - t0)
    return best


on, off = solve(True), solve(False)
fetch(on(X0)); fetch(off(X0))  # compile (first absorbs axon init)
r = on(X0)
print(
    f"conv {int(jnp.sum(r.status == qnm.Status.CONVERGED))}/{B}  "
    f"iters med {int(np.median(np.asarray(r.iterations)))}  "
    f"nfev med (fold) {int(np.median(np.asarray(r.n_fev)))}",
    flush=True,
)
r2 = off(X0)
print(f"nfev med (nofold) {int(np.median(np.asarray(r2.n_fev)))}", flush=True)

t_on1 = timed(on)
t_off1 = timed(off)
t_on2 = timed(on)
t_off2 = timed(off)
print(
    f"fold on:  {B / min(t_on1, t_on2):,.0f} solves/s "
    f"({min(t_on1, t_on2) * 1e3:.1f} ms)",
    flush=True,
)
print(
    f"fold off: {B / min(t_off1, t_off2):,.0f} solves/s "
    f"({min(t_off1, t_off2) * 1e3:.1f} ms)",
    flush=True,
)
print(f"ratio on/off: {min(t_off1, t_off2) / min(t_on1, t_on2):.3f}", flush=True)
