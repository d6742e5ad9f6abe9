"""Round-4 on-chip validation: matvec objectives through the resident
engine via the dot-rewrite pass (VERDICT round-3 item 1).

Measures, on the real chip (f32, tol 1e-3, batch 4096 x n=60):
  1. quadratic-form fleet (BASELINE config-2 class) — resident vs fused
     same-process A/B;
  2. logistic-MAP fleet (config-3 class, data in VMEM) — same A/B;
  3. Rosenbrock control — confirms the round-3 tie still holds.

Success bar: the resident engine LOWERS AND RUNS these objectives on
device (round 3: Mosaic compile error), statuses agree with the fused
engine, plus an honest wall A/B either way.

Run on an idle machine (host load poisons walls); one readback per timed
call.
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

import quasinewtonmethods_jl_tpu as qnm
from quasinewtonmethods_jl_tpu.models import (
    rosenbrock_logdensity,
    rosenbrock_value_and_grad,
)

BATCH, N, TOL, MAXIT = 4096, 60, 1e-3, 3000


def log(m):
    print(m, file=sys.stderr, flush=True)


def fetch(r):
    return float(jnp.sum(r.x) + jnp.sum(r.status).astype(jnp.float32))


def ab(name, obj, X, vag=None):
    res = {}
    for eng in ("fused", "resident"):
        def call(Xi):
            if eng == "fused":
                return qnm.optimize_batched_fused(
                    obj, Xi, tol=TOL, max_iterations=MAXIT, kernel="pallas",
                    value_and_grad_fn=vag,
                )
            return qnm.optimize_batched_resident(
                obj, Xi, tol=TOL, max_iterations=MAXIT, value_and_grad_fn=vag,
            )

        t0 = time.perf_counter()
        try:
            out = call(X)
            fetch(out)
        except Exception as e:  # noqa: BLE001 - record the lowering failure
            log(f"{name}/{eng}: FAILED {type(e).__name__}: {str(e)[:300]}")
            res[eng] = None
            continue
        log(f"{name}/{eng}: warmup+compile {time.perf_counter() - t0:.1f}s")
        walls = []
        for _ in range(3):
            t0 = time.perf_counter()
            out = call(X)
            fetch(out)
            walls.append(time.perf_counter() - t0)
        conv = int(jnp.sum(out.status == qnm.Status.CONVERGED))
        itmax = int(out.iterations.max())
        best = min(walls)
        log(
            f"{name}/{eng}: best {best * 1e3:.1f} ms -> "
            f"{BATCH / best:.0f} solves/s  conv {conv}/{BATCH}  itmax {itmax}"
        )
        res[eng] = (out, best, conv)
    if res.get("fused") and res.get("resident"):
        sf, sr = res["fused"][0].status, res["resident"][0].status
        agree = int(jnp.sum(sf == sr))
        log(f"{name}: status agreement {agree}/{BATCH}; "
            f"resident/fused wall ratio "
            f"{res['resident'][1] / res['fused'][1]:.2f}x")
    return res


def main():
    rng = np.random.default_rng(20260817)
    log(f"device: {jax.devices()[0]}")

    X = jnp.asarray(rng.standard_normal((BATCH, N)), jnp.float32)

    # 3. control first: it warms the axon tunnel with the known-good case
    ab("rosenbrock", rosenbrock_logdensity, X, vag=rosenbrock_value_and_grad)

    # 1. quadratic form, condition number ~1e3 (config-2 class, n=60 to
    # fit the resident VMEM bound)
    evals = np.logspace(0, 3, N)
    Qh = np.linalg.qr(rng.standard_normal((N, N)))[0]
    Q = jnp.asarray((Qh * evals) @ Qh.T, jnp.float32)

    def quad(x):
        return -0.5 * x @ (Q @ x)

    ab("quadratic", quad, X * 0.1)

    # 2. logistic MAP, 128 data rows (VMEM-sized), ridge prior
    A = jnp.asarray(rng.standard_normal((128, N)) / np.sqrt(N), jnp.float32)
    w_true = rng.standard_normal(N)
    p = 1.0 / (1.0 + np.exp(-(np.asarray(A) @ w_true)))
    yv = jnp.asarray((rng.random(128) < p).astype(np.float32))

    def logistic(w):
        z = A @ w
        return jnp.sum(yv * z - jnp.logaddexp(0.0, z)) - 0.5 * jnp.sum(w * w)

    ab("logistic", logistic, X * 0.1)


if __name__ == "__main__":
    main()
