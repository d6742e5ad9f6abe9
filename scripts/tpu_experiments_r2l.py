"""Round-2 part L: controlled A/B of incremental-Gram vs recompute circular
L-BFGS — same process, same start points, us/iter comparison."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
import quasinewtonmethods_jl_tpu as qnm
import quasinewtonmethods_jl_tpu.lbfgs_batched_solve as lbs

RNG = np.random.default_rng(20260816)
def log(m): print(m, flush=True)
log(f"device: {jax.devices()[0]}")

from quasinewtonmethods_jl_tpu.models import rosenbrock_logdensity

for batch, n in ((1024, 512), (256, 4096)):
    X = jnp.asarray(RNG.standard_normal((batch, n)) * 0.5 + 1.0, jnp.float32)
    float(jnp.sum(X))
    for mode in ("incr", "recompute", "incr2"):
        inc = mode.startswith("incr")
        def run():
            out = lbs.optimize_lbfgs_batched_fused(
                rosenbrock_logdensity, X, history=10, tol=1e-3,
                max_iterations=3000, incremental_gram=inc)
            float(jnp.sum(out.x) + jnp.sum(out.status))
            return out
        out = run()
        best = np.inf
        for _ in range(4):
            t0 = time.perf_counter(); out = run()
            best = min(best, time.perf_counter() - t0)
        conv = int(jnp.sum(out.status == qnm.Status.CONVERGED))
        itmax = int(out.iterations.max())
        log(f"{mode} {batch}x{n}: best {best*1e3:.1f} ms -> {batch/best:.0f}"
            f" solves/s (conv {conv}/{batch}, itmax {itmax},"
            f" {best/itmax*1e6:.0f} us/iter)")
log("done")
