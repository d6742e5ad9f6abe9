"""CG iteration floor decomposition (round 5, session c; verdict 7a).

The bench headline now leads with the CG engine; the BFGS engine got a
floor audit in rounds 2-3 (launch tax vs HBM passes vs compute). Same
accounting for CG at the three canonical shapes:

  4096x60 (bench), 1024x512 (mid), 256x4096 (large-n fleet)

Decomposition per shape (all same-process, one combined readback each,
fixed trip count via tol=0 so no lane converges and us/iter is exact):

  A. full CG engine us/iter (Wolfe approx, the bench configuration);
  B. gradient-floor us/iter: a while loop whose body is ONE fleet
     value_and_grad + an elementwise X update — the irreducible
     objective cost at the same trip count. CG's real per-iteration
     eval count is n_fev/iters (Wolfe trials), so the objective floor
     is B * (mean evals/iter);
  C. HBM model: the CG body touches ~9 (n, batch) arrays per iteration
     (read X,G,G_old,D + write X,G,G_old,D + the trial point) plus the
     Wolfe trials' evals; bytes/iter / 819 GB/s is the bandwidth floor
     (v5e HBM ~819 GB/s).

Verdict question: is 186k sustained at the environment floor, or is
there headroom? Answer = A vs max(B*evals, C, ~110 us while-step floor).

Run: python scripts/tpu_experiments_r5c.py
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

import quasinewtonmethods_jl_tpu as qnm
from quasinewtonmethods_jl_tpu.api import as_value_and_grad
from quasinewtonmethods_jl_tpu.models import rosenbrock_logdensity

print("devices:", jax.devices(), flush=True)

HBM_GBS = 819e9


def readback(*xs):
    return float(sum(jnp.sum(jnp.where(jnp.isfinite(x), x, 0.0)) for x in xs))


t0 = time.perf_counter()
print("warmup sum:", float(jnp.sum(jnp.ones(8))),
      f"({time.perf_counter()-t0:.0f}s)", flush=True)

K = 200  # fixed trip count

vag = as_value_and_grad(rosenbrock_logdensity, None)
vag_b = jax.vmap(vag, in_axes=1, out_axes=(0, 1))


@jax.jit
def grad_floor(X):
    def body(c):
        Xc, k = c
        f, g = vag_b(Xc)
        return (Xc + 1e-9 * g, k + 1)

    def cond(c):
        return c[1] < K

    Xf, _ = jax.lax.while_loop(cond, body, (X, jnp.zeros((), jnp.int32)))
    return Xf


def run_shape(batch, n):
    rng = np.random.default_rng(batch * 7 + n)
    X0 = jnp.asarray(rng.standard_normal((batch, n)), jnp.float32) * 0.5

    # A: full engine, tol=0 (nothing converges; exactly K iterations)
    def eng(X):
        return qnm.optimize_cg(rosenbrock_logdensity, X, tol=0.0,
                               max_iterations=K)

    r = eng(X0)
    readback(r.x)  # warmup
    t0 = time.perf_counter()
    r = eng(X0)
    readback(r.x)
    a_full = (time.perf_counter() - t0) / K * 1e6
    evals_per_iter = float(jnp.mean(r.n_fev)) / K

    # B: gradient floor at the same trip count
    Xg = grad_floor(X0.T)
    readback(Xg)
    t0 = time.perf_counter()
    Xg = grad_floor(X0.T)
    readback(Xg)
    b_grad = (time.perf_counter() - t0) / K * 1e6

    # C: HBM model — 9 full (n, batch) passes for the body + 2 passes
    # per Wolfe eval (read trial X', write G')
    bytes_body = 9 * n * batch * 4
    bytes_evals = 2 * n * batch * 4 * evals_per_iter
    c_hbm = (bytes_body + bytes_evals) / HBM_GBS * 1e6

    print(
        f"{batch}x{n}: full {a_full:.0f} us/iter | grad-floor {b_grad:.0f}"
        f" us/iter x {evals_per_iter:.2f} evals/iter ="
        f" {b_grad*evals_per_iter:.0f} us | HBM model {c_hbm:.0f} us"
        f" | headroom {a_full / max(b_grad*evals_per_iter, c_hbm, 110):.2f}x",
        flush=True,
    )


for batch, n in ((4096, 60), (1024, 512), (256, 4096)):
    run_shape(batch, n)

# --- constrained-fleet Pallas padding path (B=100 pads to 128 under
# kernel='pallas'; r5a only ran divisible batches) ---
print("\n--- auglag fleet pallas-padding probe (B=100) ---", flush=True)
from quasinewtonmethods_jl_tpu.models import rosenbrock_logdensity as _ros

Xp = jnp.asarray(np.random.default_rng(3).standard_normal((100, 60)),
                 jnp.float32) * 0.5
rp = qnm.optimize_auglag(
    _ros, Xp, ineq=lambda z: 30.0 - jnp.sum(z * z), engine="bfgs",
    tol=1e-3, ctol=1e-3, max_iterations=2000,
)
readback(rp.x)
print("pad-path: conv", int(jnp.sum(rp.status == qnm.Status.CONVERGED)),
      "/100  shapes", rp.x.shape, rp.viol.shape, flush=True)

# --- scan-rewrite resident lowering probe (r5b failed with an EMPTY
# NotImplementedError; capture the real traceback) ---
print("\n--- scan-bodied resident lowering probe ---", flush=True)
import traceback

T, n_ar = 8, 6
A = jnp.asarray(np.random.default_rng(0).standard_normal((n_ar, n_ar))
                * (0.5 / n_ar), jnp.float32)
ys = jnp.asarray(np.random.default_rng(1).standard_normal((T, n_ar)),
                 jnp.float32)


def ar1(w):
    def step(carry, y):
        pred = A @ carry + w
        return pred, -0.5 * jnp.sum((y - pred) ** 2)

    _, lls = jax.lax.scan(step, jnp.zeros(n_ar, w.dtype), ys)
    return jnp.sum(lls) - 0.5 * jnp.sum(w * w)


from quasinewtonmethods_jl_tpu.resident_solve import optimize_batched_resident

X0a = jnp.asarray(
    np.random.default_rng(2).standard_normal((128, n_ar)), jnp.float32
)
try:
    res = optimize_batched_resident(ar1, X0a, tol=1e-3, block_batch=128)
    readback(res.x)
    print("scan-resident LOWERED:",
          int(jnp.sum(res.status == qnm.Status.CONVERGED)), "/128",
          flush=True)
except Exception:
    traceback.print_exc()
print("done", flush=True)
