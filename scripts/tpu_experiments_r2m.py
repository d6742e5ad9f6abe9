"""Round-2 part M: L-BFGS fleet unroll sweep (launch-tax amortization)."""
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

for batch, n in ((1024, 512), (256, 4096), (4096, 60)):
    X = jnp.asarray(RNG.standard_normal((batch, n)) * 0.5 + 1.0, jnp.float32)
    float(jnp.sum(X))
    for unroll in (1, 2, 4):
        def run():
            out = optimize_lbfgs_batched_fused(
                rosenbrock_logdensity, X, history=10, tol=1e-3,
                max_iterations=3000, unroll=unroll)
            float(jnp.sum(out.x) + jnp.sum(out.status))
            return out
        out = run()
        best = np.inf
        for _ in range(4):
            t0 = time.perf_counter(); out = run()
            best = min(best, time.perf_counter() - t0)
        conv = int(jnp.sum(out.status == qnm.Status.CONVERGED))
        itmax = int(out.iterations.max())
        log(f"{batch}x{n} unroll={unroll}: best {best*1e3:.1f} ms ->"
            f" {batch/best:.0f} solves/s (conv {conv}/{batch}, itmax {itmax},"
            f" {best/itmax*1e6:.0f} us/iter)")
log("done")
