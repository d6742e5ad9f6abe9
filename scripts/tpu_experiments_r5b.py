"""f32 constrained-certificate envelope + scan-rewrite on chip (r5, b).

Session r5a showed the disk-constrained n=60 fleet certifies 4096/4096
at tol=ctol in {1e-2, 1e-3} in 2 outer rounds (rho never laddered).
This session finds the EDGE:

1. ctol sweep 1e-3 -> 1e-4 -> 1e-5 (cg engine, f32): where does the
   f32 certificate die — and does it die by inner stall (rho*h^2
   mantissa erosion) or by outer exhaustion?
2. an equality-coupled problem (sum(x) = c with a curved objective)
   under the same sweep — equality penalties stress rho harder than the
   one-sided disk;
3. the round-5 scan-bodied objective (AR(1) likelihood) through the
   RESIDENT engine on the real chip — interpret-mode parity is already
   pinned in tests; this is the Mosaic-lowering proof.

Run: python scripts/tpu_experiments_r5b.py
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

N, B, R2 = 60, 4096, 30.0
rng = np.random.default_rng(20260820)
X0 = jnp.asarray(rng.standard_normal((B, N)), jnp.float32) * 0.5


def disk(z):
    return R2 - jnp.sum(z * z)


def readback(*xs):
    return float(sum(jnp.sum(jnp.where(jnp.isfinite(x), x, 0.0)) for x in xs))


def report(label, r):
    conv = int(jnp.sum(r.status == qnm.Status.CONVERGED))
    st = np.asarray(r.status)
    inner = np.asarray(r.inner_status)
    n_outer = np.asarray(r.n_outer)
    print(
        f"{label}: conv {conv}/{r.status.shape[0]}"
        f"  max_viol {float(jnp.max(r.viol)):.2e}"
        f"  outer med/max {int(np.median(n_outer))}/{int(n_outer.max())}"
        f"  rho max {float(jnp.max(r.rho)):.1e}"
        f"  status counts {np.bincount(st, minlength=5).tolist()}"
        f"  inner-status counts {np.bincount(inner, minlength=5).tolist()}",
        flush=True,
    )


t0 = time.perf_counter()
print("warmup sum:", float(jnp.sum(jnp.ones(8))),
      f"({time.perf_counter()-t0:.0f}s)", flush=True)

print("\n--- (1) ctol envelope, disk ineq, cg f32 ---", flush=True)
for ct in (1e-3, 1e-4, 1e-5):
    r = qnm.optimize_auglag(
        rosenbrock_logdensity, X0, ineq=disk, engine="cg",
        tol=ct, ctol=ct, max_outer=20, max_iterations=4000,
    )
    readback(r.x)
    report(f"disk tol=ctol={ct:g}", r)

print("\n--- (2) ctol envelope, equality coupling, cg f32 ---", flush=True)


def eqsum(z):
    return jnp.sum(z) - 10.0


X0e = jnp.asarray(rng.standard_normal((B, N)), jnp.float32) * 0.5
for ct in (1e-3, 1e-4, 1e-5):
    r = qnm.optimize_auglag(
        rosenbrock_logdensity, X0e, eq=eqsum, engine="cg",
        tol=ct, ctol=ct, max_outer=20, max_iterations=4000,
    )
    readback(r.x)
    report(f"eqsum tol=ctol={ct:g}", r)

print("\n--- (3) scan-bodied AR(1) objective, RESIDENT engine on chip ---",
      flush=True)
T, n_ar, b_ar = 10, 6, 256
A = jnp.asarray(rng.standard_normal((n_ar, n_ar)) * (0.5 / n_ar), jnp.float32)
ys = jnp.asarray(rng.standard_normal((T, n_ar)), jnp.float32)


def ar1(w):
    def step(carry, y):
        pred = A @ carry + w
        return pred, -0.5 * jnp.sum((y - pred) ** 2)

    _, lls = jax.lax.scan(step, jnp.zeros(n_ar, w.dtype), ys)
    return jnp.sum(lls) - 0.5 * jnp.sum(w * w)


X0a = jnp.asarray(rng.standard_normal((b_ar, n_ar)), jnp.float32)
from quasinewtonmethods_jl_tpu.batched_solve import optimize_batched_fused
from quasinewtonmethods_jl_tpu.resident_solve import optimize_batched_resident

try:
    res = optimize_batched_resident(
        ar1, X0a, tol=1e-3, block_batch=128, interpret=False,
    )
    readback(res.x)
    conv = int(jnp.sum(res.status == qnm.Status.CONVERGED))
    fused = optimize_batched_fused(ar1, X0a, tol=1e-3)
    readback(fused.x)
    same_status = int(jnp.sum(res.status == fused.status))
    dx = float(jnp.max(jnp.abs(res.x - fused.x)))
    print(f"resident scan-objective ON CHIP: conv {conv}/{b_ar}; "
          f"status match vs fused {same_status}/{b_ar}; max|dx| {dx:.2e}",
          flush=True)
except Exception as e:  # noqa: BLE001 - record the Mosaic verdict either way
    print(f"resident scan-objective FAILED to lower on chip: "
          f"{type(e).__name__}: {str(e)[:300]}", flush=True)
print("done", flush=True)
