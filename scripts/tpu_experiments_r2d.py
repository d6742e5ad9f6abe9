"""Round-2 part D: per-kernel trace of the fused BFGS engine at 4096x60.

Where does the ~0.38 ms/iter go when the donated Pallas update's
1-read-1-write floor is ~0.15 ms? Run with the host idle.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

import quasinewtonmethods_jl_tpu as qnm
from quasinewtonmethods_jl_tpu.batched_solve import optimize_batched_fused
from quasinewtonmethods_jl_tpu.models import rosenbrock_logdensity
from quasinewtonmethods_jl_tpu.utils.profiling import summarize_trace, trace

RNG = np.random.default_rng(20260816)


def log(m):
    print(m, flush=True)


def main():
    log(f"device: {jax.devices()[0]}")
    X = jnp.asarray(RNG.standard_normal((4096, 60)), jnp.float32)
    float(jnp.sum(X))

    for label, kw in (
        ("plain", {}),
        ("fold", {"fold_eval": True}),
    ):
        def run():
            out = optimize_batched_fused(
                rosenbrock_logdensity, X, kernel="pallas", tol=1e-3,
                max_iterations=3000, **kw,
            )
            float(jnp.sum(out.x))
            return out

        t0 = time.perf_counter()
        out = run()
        warm = time.perf_counter() - t0
        best = np.inf
        for _ in range(3):
            t0 = time.perf_counter()
            out = run()
            best = min(best, time.perf_counter() - t0)
        itmax = int(out.iterations.max())
        log(f"bfgs {label}: warm {warm:.1f}s best {best*1e3:.1f} ms -> "
            f"{4096/best:.0f} solves/s (itmax {itmax}, "
            f"{best/itmax*1e6:.0f} us/iter)")
        tdir = f"/tmp/bfgs_trace_{label}"
        with trace(tdir):
            run()
        log(f"--- {label} trace (per-iter = total/{itmax}) ---")
        for name, secs, count in summarize_trace(tdir, top=24):
            log(f"  {secs*1e3:9.2f} ms  x{count:<6d} {name[:90]}")

    # mid-n XLA update path with the stacked matvec (prior same-day
    # baselines: 1024x128 8626 solves/s, 512x256 1986 solves/s)
    for batch, n in ((1024, 128), (512, 256)):
        Xm = jnp.asarray(RNG.standard_normal((batch, n)), jnp.float32)
        float(jnp.sum(Xm))

        def runm():
            out = optimize_batched_fused(
                rosenbrock_logdensity, Xm, kernel="xla", tol=1e-3,
                max_iterations=3000,
            )
            float(jnp.sum(out.x))
            return out

        out = runm()
        best = np.inf
        for _ in range(3):
            t0 = time.perf_counter()
            out = runm()
            best = min(best, time.perf_counter() - t0)
        conv = int(jnp.sum(out.status == qnm.Status.CONVERGED))
        log(f"bfgs-xla stacked {batch}x{n}: best {best*1e3:.1f} ms -> "
            f"{batch/best:.0f} solves/s (conv {conv}/{batch}, "
            f"itmax {int(out.iterations.max())})")
    log("done")


if __name__ == "__main__":
    main()
