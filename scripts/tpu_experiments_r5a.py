"""Constrained auglag chip validation + f32 contract (round 5, session a).

Verdict item 2: every other engine family got same-session chip numbers
before its round closed; auglag landed CPU-f64-only in round 4. This
session measures, on the real v5e at f32:

1. the 4096-lane disk-constrained Rosenbrock fleet (n=60, the bench
   workload's constrained sibling: ineq = r^2 - ||x||^2 with r^2 = 30 <
   60, so the unconstrained optimum x = 1 is INFEASIBLE and the whole
   fleet must land on the sphere) — convergence counts and solves/s for
   the bfgs and cg inner engines at (tol, ctol) in {1e-2, 1e-3};
2. the f32 rho envelope: the augmented objective's conditioning scales
   with rho, and rho * h^2 eats the f32 mantissa — sweep rho_max in
   {1e4, 1e6, 1e8} at ctol=1e-3 and record where the certificate
   survives;
3. a small mixed eq+ineq fleet as a shape-coverage probe.

Timing protocol (CLAUDE.md): ONE combined scalar readback per timed
call; never benchmark while anything else runs; absolutes are
session-local (quote ratios / convergence counts, not absolutes,
against other sessions).

Run: python scripts/tpu_experiments_r5a.py
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

import quasinewtonmethods_jl_tpu as qnm
from quasinewtonmethods_jl_tpu.models import rosenbrock_logdensity

print("devices:", jax.devices(), flush=True)

N = 60
B = 4096
R2 = 30.0  # ||x*||^2 = 60 unconstrained -> the disk r^2=30 is ACTIVE


def disk(z):
    return R2 - jnp.sum(z * z)


rng = np.random.default_rng(20260820)
X0 = jnp.asarray(rng.standard_normal((B, N)), jnp.float32) * 0.5


def readback(*xs):
    """ONE combined device->host sync (the separate-readback trap)."""
    return float(sum(jnp.sum(jnp.where(jnp.isfinite(x), x, 0.0)) for x in xs))


def run(engine, tol, ctol, rho_max, label, max_outer=20, max_it=2000):
    def fn(X):
        # no outer jit needed: the fleet core is jitted internally
        return qnm.optimize_auglag(
            rosenbrock_logdensity, X, ineq=disk, engine=engine,
            tol=tol, ctol=ctol, rho_max=rho_max, max_outer=max_outer,
            max_iterations=max_it,
        )
    r = fn(X0)
    readback(r.x, r.status.astype(jnp.float32))  # warmup + compile
    t0 = time.perf_counter()
    r = fn(X0)
    readback(r.x, r.status.astype(jnp.float32))
    dt = time.perf_counter() - t0
    conv = int(jnp.sum(r.status == qnm.Status.CONVERGED))
    viol = float(jnp.max(r.viol))
    n_outer = np.asarray(r.n_outer)
    it = np.asarray(r.iterations)
    # boundary check: converged lanes must sit on the sphere
    on_disk = float(
        jnp.max(jnp.abs(jnp.sum(r.x**2, -1) - R2) * (r.status == 1))
    )
    print(
        f"{label}: conv {conv}/{B}  {B/dt:.0f} solves/s ({dt*1e3:.0f} ms)"
        f"  max_viol {viol:.2e}  |x^2-r^2| {on_disk:.2e}"
        f"  outer med/max {int(np.median(n_outer))}/{int(n_outer.max())}"
        f"  inner_it med/max {int(np.median(it))}/{int(it.max())}",
        flush=True,
    )
    return conv, dt


print("\n--- warmup probe ---", flush=True)
t0 = time.perf_counter()
print("sum:", float(jnp.sum(jnp.ones(8))), f"({time.perf_counter()-t0:.1f}s)",
      flush=True)

print("\n--- (1) 4096-lane disk-constrained Rosenbrock n=60, f32 ---",
      flush=True)
for engine in ("bfgs", "cg"):
    for tol in (1e-2, 1e-3):
        run(engine, tol, tol, 1e6, f"{engine} tol=ctol={tol:g} rho_max=1e6")

print("\n--- (2) f32 rho_max envelope (cg, tol=ctol=1e-3) ---", flush=True)
for rho_max in (1e4, 1e6, 1e8):
    run("cg", 1e-3, 1e-3, rho_max, f"cg rho_max={rho_max:g}")

print("\n--- (3) mixed eq+ineq fleet probe (n=8, 4096 lanes) ---", flush=True)


def fsm(z):
    return -jnp.sum((z - 1.0) ** 2)


def eq_sum(z):
    return jnp.sum(z) - 4.0


def ineq_first(z):
    return z[0] - 0.2


X0s = jnp.asarray(rng.standard_normal((B, 8)), jnp.float32) * 0.3
def fn3(X):
    return qnm.optimize_auglag(
        fsm, X, eq=eq_sum, ineq=ineq_first, engine="bfgs",
        tol=1e-3, ctol=1e-3,
    )
r3 = fn3(X0s)
readback(r3.x)
t0 = time.perf_counter()
r3 = fn3(X0s)
readback(r3.x)
dt3 = time.perf_counter() - t0
conv3 = int(jnp.sum(r3.status == qnm.Status.CONVERGED))
print(
    f"mixed eq+ineq: conv {conv3}/{B}  {B/dt3:.0f} solves/s"
    f"  max_viol {float(jnp.max(r3.viol)):.2e}",
    flush=True,
)
print("done", flush=True)
