"""Chip drive + A/B for the preconditioned TR engine (round 4, session p).

Correctness drive (f32, tol 1e-3) of optimize_tr(precondition=...) on the
stiff quadratic + Rosenbrock, then a same-process timed A/B on the stiff
fixture. Timing protocol per CLAUDE.md: ONE combined readback per timed
call, min-of-3, idle host required for the timed section.
"""
import sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
import numpy as np
import quasinewtonmethods_jl_tpu as qnm

TIMED = "--timed" in sys.argv

print("device:", jax.devices()[0], flush=True)

B, n = 1024, 256
d = jnp.asarray(np.geomspace(1.0, 1e4, n), jnp.float32)
obj = lambda x: -0.5 * jnp.sum(d * x * x)
X0 = jax.random.normal(jax.random.PRNGKey(0), (B, n), jnp.float32)

def readback(*xs):
    acc = 0.0
    for x in xs:
        acc = acc + jnp.sum(jnp.asarray(x, jnp.float32))
    return float(acc)  # ONE combined device->host sync

t0 = time.time()
r_plain = qnm.optimize_tr(obj, X0, tol=1e-3, max_iterations=300)
_ = readback(r_plain.x, r_plain.status)
print(f"warmup+plain: {time.time()-t0:.1f}s", flush=True)
r_jac = qnm.optimize_tr(obj, X0, tol=1e-3, max_iterations=300,
                        precondition="jacobi")
_ = readback(r_jac.x, r_jac.status)
r_fix = qnm.optimize_tr(obj, X0, tol=1e-3, max_iterations=300,
                        precondition=d)
_ = readback(r_fix.x, r_fix.status)

for name, r in [("plain", r_plain), ("jacobi", r_jac), ("fixed", r_fix)]:
    conv = int(jnp.sum(r.status == qnm.Status.CONVERGED))
    print(f"stiff-quad {name}: conv {conv}/{B} "
          f"hev_med {int(jnp.median(r.n_hev))} "
          f"hev_max {int(jnp.max(r.n_hev))} "
          f"max|x| {float(jnp.max(jnp.abs(r.x))):.2e}", flush=True)

# Rosenbrock fleet sanity under jacobi on chip
from quasinewtonmethods_jl_tpu.models import rosenbrock_logdensity
Xr = jax.random.normal(jax.random.PRNGKey(1), (512, 60), jnp.float32)
rr = qnm.optimize_tr(rosenbrock_logdensity, Xr, tol=1e-3)
rj = qnm.optimize_tr(rosenbrock_logdensity, Xr, tol=1e-3,
                     precondition="jacobi")
print(f"rosen plain: conv {int(jnp.sum(rr.converged))}/512 "
      f"hev_med {int(jnp.median(rr.n_hev))}", flush=True)
print(f"rosen jacobi: conv {int(jnp.sum(rj.converged))}/512 "
      f"hev_med {int(jnp.median(rj.n_hev))}", flush=True)

if TIMED:
    def timed(fn, reps=3):
        best = 1e9
        for _ in range(reps):
            t0 = time.time()
            r = fn()
            _ = readback(r.x, r.status)
            best = min(best, time.time() - t0)
        return best

    # interleaved A/B on the stiff fixture
    wall_p = timed(lambda: qnm.optimize_tr(obj, X0, tol=1e-3,
                                           max_iterations=300))
    wall_j = timed(lambda: qnm.optimize_tr(obj, X0, tol=1e-3,
                                           max_iterations=300,
                                           precondition="jacobi"))
    wall_p2 = timed(lambda: qnm.optimize_tr(obj, X0, tol=1e-3,
                                            max_iterations=300))
    wall_j2 = timed(lambda: qnm.optimize_tr(obj, X0, tol=1e-3,
                                            max_iterations=300,
                                            precondition="jacobi"))
    print(f"TIMED stiff: plain {min(wall_p, wall_p2)*1e3:.1f} ms, "
          f"jacobi {min(wall_j, wall_j2)*1e3:.1f} ms "
          f"({min(wall_p,wall_p2)/min(wall_j,wall_j2):.2f}x)", flush=True)
print("DONE", flush=True)
