"""Round-2 part C: circular-ring batched L-BFGS measurements + trace."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
import quasinewtonmethods_jl_tpu as qnm
from quasinewtonmethods_jl_tpu.lbfgs_batched_solve import optimize_lbfgs_batched_fused
from quasinewtonmethods_jl_tpu.models import rosenbrock_logdensity
from quasinewtonmethods_jl_tpu.utils.profiling import summarize_trace, trace

RNG = np.random.default_rng(20260816)

def log(m): print(m, flush=True)

log(f"device: {jax.devices()[0]}")
for batch, n in ((4096, 60), (1024, 512), (256, 4096)):
    X = jnp.asarray(RNG.standard_normal((batch, n)), jnp.float32)
    float(jnp.sum(X))
    def run():
        out = optimize_lbfgs_batched_fused(rosenbrock_logdensity, X, history=10, tol=1e-3, max_iterations=1000)
        float(jnp.sum(out.x))
        return out
    t0=time.perf_counter(); out=run(); warm=time.perf_counter()-t0
    best=np.inf
    for _ in range(3):
        t0=time.perf_counter(); out=run(); best=min(best, time.perf_counter()-t0)
    itmax=int(out.iterations.max()); conv=int(jnp.sum(out.status==qnm.Status.CONVERGED))
    log(f"lbfgs-circ {batch}x{n}: warm {warm:.1f}s best {best*1e3:.0f} ms -> {batch/best:.0f} solves/s (conv {conv}/{batch}, itmax {itmax}, {best/max(itmax,1)*1e3:.2f} ms/iter)")
    if n >= 512:
        tdir=f"/tmp/lbfgs_circ_trace_{batch}x{n}"
        with trace(tdir):
            run()
        log(f"--- circ trace {batch}x{n} ---")
        for name, secs, count in summarize_trace(tdir, top=16):
            log(f"  {secs*1e3:9.1f} ms  x{count:<6d} {name[:90]}")
log("done")
