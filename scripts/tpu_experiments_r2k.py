"""Round-2 part K: incremental-Gram circular L-BFGS vs the round-2 numbers.

Measures the large-n batched L-BFGS fleets (the configs with recorded
round-2 baselines: 1024x512 = 11.3k solves/s, 256x4096 = 1,176 solves/s)
on the engine after the incremental SY/YY carry change, plus the 4096x60
shift-ring config as a no-regression guard.
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
import quasinewtonmethods_jl_tpu as qnm
from quasinewtonmethods_jl_tpu.lbfgs_batched_solve import (
    optimize_lbfgs_batched_fused,
)
from quasinewtonmethods_jl_tpu.models import rosenbrock_logdensity

RNG = np.random.default_rng(20260816)
def log(m): print(m, flush=True)
log(f"device: {jax.devices()[0]}")

for batch, n, m in ((1024, 512, 10), (256, 4096, 10), (4096, 60, 10)):
    X = jnp.asarray(RNG.standard_normal((batch, n)) * 0.5 + 1.0, jnp.float32)
    float(jnp.sum(X))
    def run():
        out = optimize_lbfgs_batched_fused(
            rosenbrock_logdensity, X, history=m, tol=1e-3,
            max_iterations=3000,
        )
        float(jnp.sum(out.x) + jnp.sum(out.status))
        return out
    t0 = time.perf_counter(); out = run(); warm = time.perf_counter() - t0
    best = np.inf
    for _ in range(4):
        t0 = time.perf_counter(); out = run()
        best = min(best, time.perf_counter() - t0)
    conv = int(jnp.sum(out.status == qnm.Status.CONVERGED))
    itmax = int(out.iterations.max())
    log(f"lbfgs {batch}x{n} m={m}: warm {warm:.1f}s best {best*1e3:.1f} ms"
        f" -> {batch/best:.0f} solves/s (conv {conv}/{batch}, itmax {itmax},"
        f" {best/itmax*1e6:.0f} us/iter)")
log("done")
