"""Round-2 part F: plane-blocked two-pass Pallas BFGS update on hardware.

Compares the XLA fused update (round-2 best for n > 95) against the new
blocked kernel at the mid-n configs, on the real chip.
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
import quasinewtonmethods_jl_tpu as qnm
from quasinewtonmethods_jl_tpu.batched_solve import (
    _auto_kernel, optimize_batched_fused,
)
from quasinewtonmethods_jl_tpu.models import rosenbrock_logdensity

RNG = np.random.default_rng(20260816)
def log(m): print(m, flush=True)
log(f"device: {jax.devices()[0]}")

for batch, n in ((1024, 128), (512, 256), (256, 512)):
    log(f"auto-dispatch for n={n}: {_auto_kernel('pallas', n, 4, 128)}")
    Xm = jnp.asarray(RNG.standard_normal((batch, n)), jnp.float32)
    float(jnp.sum(Xm))
    for kernel in ("xla", "pallas"):
        def run():
            out = optimize_batched_fused(
                rosenbrock_logdensity, Xm, kernel=kernel,
                tol=1e-3, max_iterations=3000,
            )
            float(jnp.sum(out.x) + jnp.sum(out.status).astype(jnp.float32))
            return out
        try:
            t0 = time.perf_counter(); out = run()
            warm = time.perf_counter() - t0
        except Exception as e:
            log(f"{kernel} {batch}x{n}: FAILED {type(e).__name__}: {e}")
            continue
        best = np.inf
        for _ in range(3):
            t0 = time.perf_counter(); out = run()
            best = min(best, time.perf_counter() - t0)
        conv = int(jnp.sum(out.status == qnm.Status.CONVERGED))
        itmax = int(out.iterations.max())
        log(f"{kernel} {batch}x{n}: warm {warm:.1f}s best {best*1e3:.1f} ms "
            f"-> {batch/best:.0f} solves/s (conv {conv}/{batch}, itmax {itmax}, "
            f"{best/itmax*1e6:.0f} us/iter)")
log("done")
