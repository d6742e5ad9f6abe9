"""Round-2 TPU measurements: fold_eval, compaction, adaptive Pallas blocks.

Run on the real chip (no JAX_PLATFORMS override). Prints one line per
experiment to stdout. Keep the machine otherwise idle (host load poisons
axon wall times ~10x).
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
    pallas_feasible_block,
)
from quasinewtonmethods_jl_tpu.models import rosenbrock_logdensity

RNG = np.random.default_rng(20260816)


def log(msg):
    print(msg, flush=True)


def run_timed(label, fn, batch, reps=3):
    # warmup (compiles); then timed reps on fresh inputs
    try:
        out = fn(0)
        conv = int(jnp.sum(out.status == qnm.Status.CONVERGED))
        itmax = int(out.iterations.max())
    except Exception as e:
        log(f"{label}: FAILED {type(e).__name__}: {str(e)[:200]}")
        return
    best = np.inf
    for rep in range(1, reps + 1):
        t0 = time.perf_counter()
        out = fn(rep)
        float(jnp.sum(out.x)) + int(jnp.sum(out.status))
        best = min(best, time.perf_counter() - t0)
    conv = int(jnp.sum(out.status == qnm.Status.CONVERGED))
    itmax = int(out.iterations.max())
    log(f"{label}: best {best*1e3:.1f} ms -> {batch/best:.0f} solves/s "
        f"(conv {conv}/{batch}, itmax {itmax})")


def main():
    log(f"device: {jax.devices()[0]}")
    B, N = 4096, 60
    starts = {}

    def x0s(rep, batch=B, n=N):
        key = (rep, batch, n)
        if key not in starts:
            starts[key] = jnp.asarray(
                RNG.standard_normal((batch, n)), jnp.float32
            )
            float(jnp.sum(starts[key]))
        return starts[key]

    base = dict(tol=1e-3, max_iterations=3000)

    # 1) baseline pallas 4096x60
    run_timed(
        "fused pallas 4096x60",
        lambda r: optimize_batched_fused(
            rosenbrock_logdensity, x0s(r), kernel="pallas", **base
        ),
        B,
    )
    # 2) + fold_eval
    run_timed(
        "fused pallas 4096x60 fold",
        lambda r: optimize_batched_fused(
            rosenbrock_logdensity, x0s(r), kernel="pallas", fold_eval=True,
            **base,
        ),
        B,
    )
    # 3) compaction sweeps
    for chunk in (32, 48, 64, 96):
        run_timed(
            f"compacted pallas 4096x60 chunk={chunk}",
            lambda r, c=chunk: optimize_batched_compacted(
                rosenbrock_logdensity, x0s(r), kernel="pallas", chunk=c,
                **base,
            ),
            B,
        )
    run_timed(
        "compacted pallas 4096x60 chunk=48 fold",
        lambda r: optimize_batched_compacted(
            rosenbrock_logdensity, x0s(r), kernel="pallas", chunk=48,
            fold_eval=True, **base,
        ),
        B,
    )

    # 4) mid-size n: adaptive pallas block vs xla fallback
    for n, batch in ((128, 1024), (256, 512)):
        blk = pallas_feasible_block(n, 4, 128)
        log(f"n={n}: feasible block = {blk}")
        run_timed(
            f"fused xla {batch}x{n}",
            lambda r, b=batch, nn=n: optimize_batched_fused(
                rosenbrock_logdensity, x0s(r, b, nn), kernel="xla", **base
            ),
            batch,
        )
        run_timed(
            f"fused pallas(adaptive) {batch}x{n}",
            lambda r, b=batch, nn=n: optimize_batched_fused(
                rosenbrock_logdensity, x0s(r, b, nn), kernel="pallas", **base
            ),
            batch,
        )
    log("done")


if __name__ == "__main__":
    main()
