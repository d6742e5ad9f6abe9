"""Round-2 TPU measurements, part B.

1. De-noised fold vs non-fold (interleaved reps).
2. Compaction with the jitted gather/scatter (was eager: ~280 ms/leg).
3. L-BFGS large-n per-kernel trace (the VERDICT-3 pass accounting).

Run on the real chip with the host otherwise idle.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

import quasinewtonmethods_jl_tpu as qnm
from quasinewtonmethods_jl_tpu.batched_solve import (
    optimize_batched_compacted,
    optimize_batched_fused,
)
from quasinewtonmethods_jl_tpu.lbfgs_batched_solve import (
    optimize_lbfgs_batched_fused,
)
from quasinewtonmethods_jl_tpu.models import rosenbrock_logdensity
from quasinewtonmethods_jl_tpu.utils.profiling import summarize_trace, trace

RNG = np.random.default_rng(20260816)
B, N = 4096, 60


def log(msg):
    print(msg, flush=True)


def main():
    log(f"device: {jax.devices()[0]}")
    starts = [
        jnp.asarray(RNG.standard_normal((B, N)), jnp.float32) for _ in range(4)
    ]
    for X in starts:
        float(jnp.sum(X))

    base = dict(tol=1e-3, max_iterations=3000)
    variants = {
        "plain": lambda X: optimize_batched_fused(
            rosenbrock_logdensity, X, kernel="pallas", **base
        ),
        "fold": lambda X: optimize_batched_fused(
            rosenbrock_logdensity, X, kernel="pallas", fold_eval=True, **base
        ),
        "compact96": lambda X: optimize_batched_compacted(
            rosenbrock_logdensity, X, kernel="pallas", chunk=96, **base
        ),
        "compact128+fold": lambda X: optimize_batched_compacted(
            rosenbrock_logdensity, X, kernel="pallas", chunk=128,
            fold_eval=True, **base,
        ),
    }
    # warmup/compile every variant
    for name, fn in variants.items():
        t0 = time.perf_counter()
        out = fn(starts[0])
        float(jnp.sum(out.x))
        log(f"warmup {name}: {time.perf_counter() - t0:.1f}s")
    # interleaved timed reps (de-noises slow host drift)
    best = {k: np.inf for k in variants}
    for rep in range(1, 4):
        for name, fn in variants.items():
            t0 = time.perf_counter()
            out = fn(starts[rep])
            float(jnp.sum(out.x)) + int(jnp.sum(out.status))
            dt = time.perf_counter() - t0
            best[name] = min(best[name], dt)
            conv = int(jnp.sum(out.status == qnm.Status.CONVERGED))
            log(f"rep{rep} {name}: {dt*1e3:.1f} ms (conv {conv}, "
                f"itmax {int(out.iterations.max())})")
    for name, t in best.items():
        log(f"BEST {name}: {t*1e3:.1f} ms -> {B/t:.0f} solves/s")

    # ---- L-BFGS large-n trace (1024x512) ----
    for batch, n in ((1024, 512), (256, 4096)):
        X = jnp.asarray(RNG.standard_normal((batch, n)), jnp.float32)
        t0 = time.perf_counter()
        out = optimize_lbfgs_batched_fused(
            rosenbrock_logdensity, X, history=10, tol=1e-3,
            max_iterations=1000,
        )
        float(jnp.sum(out.x))
        warm = time.perf_counter() - t0
        t0 = time.perf_counter()
        out = optimize_lbfgs_batched_fused(
            rosenbrock_logdensity, X, history=10, tol=1e-3,
            max_iterations=1000,
        )
        float(jnp.sum(out.x))
        dt = time.perf_counter() - t0
        itmax = int(out.iterations.max())
        conv = int(jnp.sum(out.status == qnm.Status.CONVERGED))
        log(f"lbfgs {batch}x{n}: warm {warm:.1f}s run {dt*1e3:.0f} ms -> "
            f"{batch/dt:.0f} solves/s (conv {conv}/{batch}, itmax {itmax}, "
            f"{dt/max(itmax,1)*1e3:.2f} ms/iter)")
        tdir = f"/tmp/lbfgs_trace_{batch}x{n}"
        with trace(tdir):
            out = optimize_lbfgs_batched_fused(
                rosenbrock_logdensity, X, history=10, tol=1e-3,
                max_iterations=1000,
            )
            float(jnp.sum(out.x))
        log(f"--- trace {batch}x{n} top kernels ---")
        for name, secs, count in summarize_trace(tdir, top=18):
            log(f"  {secs*1e3:9.1f} ms  x{count:<6d} {name[:90]}")
    log("done")


if __name__ == "__main__":
    main()
