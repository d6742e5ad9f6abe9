"""Round-2 part E: while-step unroll sweep + precision-fixed stacked matvec."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
import quasinewtonmethods_jl_tpu as qnm
from quasinewtonmethods_jl_tpu.batched_solve import optimize_batched_fused
from quasinewtonmethods_jl_tpu.models import rosenbrock_logdensity

RNG = np.random.default_rng(20260816)
def log(m): print(m, flush=True)
log(f"device: {jax.devices()[0]}")

X = jnp.asarray(RNG.standard_normal((4096, 60)), jnp.float32); float(jnp.sum(X))
for unroll in (1, 2, 4, 8):
    def run():
        out = optimize_batched_fused(rosenbrock_logdensity, X, kernel="pallas",
                                     tol=1e-3, max_iterations=3000, unroll=unroll)
        float(jnp.sum(out.x)); return out
    t0=time.perf_counter(); out=run(); warm=time.perf_counter()-t0
    best=np.inf
    for _ in range(3):
        t0=time.perf_counter(); out=run(); best=min(best,time.perf_counter()-t0)
    conv=int(jnp.sum(out.status==qnm.Status.CONVERGED))
    log(f"unroll={unroll}: warm {warm:.1f}s best {best*1e3:.1f} ms -> {4096/best:.0f} solves/s (conv {conv}, itmax {int(out.iterations.max())}, {best/int(out.iterations.max())*1e6:.0f} us/iter)")

for batch, n in ((1024, 128), (512, 256)):
    Xm = jnp.asarray(RNG.standard_normal((batch, n)), jnp.float32); float(jnp.sum(Xm))
    for unroll in (1, 4):
        def runm():
            out = optimize_batched_fused(rosenbrock_logdensity, Xm, kernel="xla",
                                         tol=1e-3, max_iterations=3000, unroll=unroll)
            float(jnp.sum(out.x)); return out
        out=runm()
        best=np.inf
        for _ in range(3):
            t0=time.perf_counter(); out=runm(); best=min(best,time.perf_counter()-t0)
        conv=int(jnp.sum(out.status==qnm.Status.CONVERGED))
        log(f"xla-stacked-highest {batch}x{n} unroll={unroll}: best {best*1e3:.1f} ms -> {batch/best:.0f} solves/s (conv {conv}/{batch}, itmax {int(out.iterations.max())})")
log("done")
