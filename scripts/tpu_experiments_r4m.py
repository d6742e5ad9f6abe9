"""Round-4 chip measurements: the trust-region Newton-Krylov fleet on the
real v5e (f32 throughput contract).

 1. Rosenbrock 4096x60: TR fleet vs the fused BFGS engine (the flagship
    benchmark shape — honest accounting of what exact curvature costs on
    the easy geometry BFGS is tuned for).
 2. Ill-conditioned quadratic n=256, cond 1e4, 1024 lanes (BASELINE
    config-2 class): the stiff geometry TR is FOR — A/B vs fused BFGS
    and the L-BFGS fleet at the same tol.
 3. Logistic-regression MAP n=100 (BASELINE config-3 class), 1024 lanes,
    shared dataset: the realistic workload A/B.

One combined readback per timed call; warmup absorbs the axon init;
same-process interleaved A/Bs only (CLAUDE.md session-noise caveat).

Run: python scripts/tpu_experiments_r4m.py   (first jit ~3-10 min)
"""

import os
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

import quasinewtonmethods_jl_tpu as qnm
from quasinewtonmethods_jl_tpu.models import rosenbrock_logdensity

print("devices:", jax.devices(), flush=True)

TOL = 1e-3  # f32 chip contract


def readback(*xs):
    # ONE combined device->host scalar per timed call (each separate
    # readback costs ~30 ms through axon regardless of payload)
    tot = sum(jnp.sum(jnp.where(jnp.isfinite(x), x, 0.0)) for x in xs)
    return float(tot)


def timed(fn, reps=3):
    fn()
    walls = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        walls.append(time.perf_counter() - t0)
    return min(walls)


def report(tag, w, res, B):
    conv = int(jnp.sum(res.status == qnm.Status.CONVERGED))
    it = np.asarray(res.iterations)
    extra = ""
    if hasattr(res, "n_hev"):
        extra = f"  hev med {np.median(np.asarray(res.n_hev)):.0f}"
    print(f"{tag}: {w*1e3:.1f} ms = {B/w:,.0f} solves/s  conv {conv}/{B}  "
          f"iters med {np.median(it):.0f} max {it.max()}{extra}", flush=True)


rng = np.random.default_rng(0)

# --- 1. Rosenbrock 4096x60 -------------------------------------------------
B1, N1 = 4096, 60
X1 = jnp.asarray(rng.standard_normal((B1, N1)).astype(np.float32))


def run_tr_rb():
    r = qnm.optimize_tr(rosenbrock_logdensity, X1, tol=TOL)
    readback(r.x, r.last_value)
    return r


def run_bfgs_rb():
    r = qnm.optimize_batched(rosenbrock_logdensity, X1, tol=TOL)
    readback(r.x, r.last_value)
    return r


w_tr1 = timed(run_tr_rb)
w_bf1 = timed(run_bfgs_rb)
report("[1] TR   rosenbrock 4096x60", w_tr1, run_tr_rb(), B1)
report("[1] BFGS rosenbrock 4096x60", w_bf1, run_bfgs_rb(), B1)

# --- 2. stiff quadratic n=256, cond 1e4 -------------------------------------
B2, N2 = 1024, 256
Q, _ = np.linalg.qr(rng.standard_normal((N2, N2)))
eigs = np.geomspace(1.0, 1e4, N2)
A2 = jnp.asarray(((Q * eigs) @ Q.T).astype(np.float32))
b2 = jnp.asarray(rng.standard_normal(N2).astype(np.float32))
X2 = jnp.asarray(rng.standard_normal((B2, N2)).astype(np.float32))


def quad_obj(x):
    return -0.5 * x @ (A2 @ x) + b2 @ x


def run_tr_q():
    r = qnm.optimize_tr(quad_obj, X2, tol=TOL, max_cg=256)
    readback(r.x, r.last_value)
    return r


def run_bfgs_q():
    r = qnm.optimize_batched(quad_obj, X2, tol=TOL, max_iterations=2000)
    readback(r.x, r.last_value)
    return r


def run_lbfgs_q():
    r = qnm.parallel.optimize_lbfgs_batched(quad_obj, X2, tol=TOL,
                                            max_iterations=2000)
    readback(r.x, r.last_value)
    return r


w_tr2 = timed(run_tr_q)
w_bf2 = timed(run_bfgs_q)
w_lb2 = timed(run_lbfgs_q)
report("[2] TR    stiff quad 1024x256", w_tr2, run_tr_q(), B2)
report("[2] BFGS  stiff quad 1024x256", w_bf2, run_bfgs_q(), B2)
report("[2] LBFGS stiff quad 1024x256", w_lb2, run_lbfgs_q(), B2)

# --- 3. logistic MAP n=100, shared dataset ----------------------------------
B3, N3, M3 = 1024, 100, 512
W_true = rng.standard_normal(N3).astype(np.float32)
Xd = rng.standard_normal((M3, N3)).astype(np.float32) / np.sqrt(N3)
yv = (Xd @ W_true + 0.5 * rng.standard_normal(M3) > 0).astype(np.float32)
Xd_j, y_j = jnp.asarray(Xd), jnp.asarray(yv)
X3 = jnp.asarray(0.1 * rng.standard_normal((B3, N3)).astype(np.float32))


def logistic_obj(w):
    z = Xd_j @ w
    # log p(y|w) - 0.5*||w||^2/10  (weak Gaussian prior keeps it proper)
    ll = jnp.sum(y_j * z - jnp.logaddexp(0.0, z))
    return ll - 0.05 * jnp.sum(w * w)


def run_tr_l():
    r = qnm.optimize_tr(logistic_obj, X3, tol=TOL)
    readback(r.x, r.last_value)
    return r


def run_bfgs_l():
    r = qnm.optimize_batched(logistic_obj, X3, tol=TOL)
    readback(r.x, r.last_value)
    return r


w_tr3 = timed(run_tr_l)
w_bf3 = timed(run_bfgs_l)
report("[3] TR   logistic 1024x100", w_tr3, run_tr_l(), B3)
report("[3] BFGS logistic 1024x100", w_bf3, run_bfgs_l(), B3)
print("DONE", flush=True)
