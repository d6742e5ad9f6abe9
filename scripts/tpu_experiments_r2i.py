"""Round-2 part I: hybrid update (XLA MXU matvec + Pallas donated pass-2)
vs pure XLA and pure blocked at mid/large n."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
import quasinewtonmethods_jl_tpu as qnm
from quasinewtonmethods_jl_tpu.batched_solve import optimize_batched_fused
from quasinewtonmethods_jl_tpu.models import rosenbrock_logdensity

RNG = np.random.default_rng(20260816)
def log(m): print(m, flush=True)
log(f"device: {jax.devices()[0]}")

for batch, n in ((1024, 128), (512, 256), (256, 512)):
    Xm = jnp.asarray(RNG.standard_normal((batch, n)), jnp.float32)
    float(jnp.sum(Xm))
    for kernel in ("xla", "pallas_blocked", "pallas_hybrid"):
        def run():
            out = optimize_batched_fused(
                rosenbrock_logdensity, Xm, kernel=kernel,
                tol=1e-3, max_iterations=3000)
            float(jnp.sum(out.x) + jnp.sum(out.status).astype(jnp.float32))
            return out
        try:
            out = run()
        except Exception as e:
            log(f"engine {kernel} {batch}x{n}: FAIL {type(e).__name__}: {str(e)[:160]}")
            continue
        best = np.inf
        for _ in range(3):
            t0 = time.perf_counter(); out = run()
            best = min(best, time.perf_counter() - t0)
        conv = int(jnp.sum(out.status == qnm.Status.CONVERGED))
        itmax = int(out.iterations.max())
        log(f"engine {kernel} {batch}x{n}: {best*1e3:.1f} ms -> "
            f"{batch/best:.0f}/s (conv {conv}, itmax {itmax}, "
            f"{best/itmax*1e6:.0f} us/iter)")
log("done")
