"""Round-2 part J: per-kernel trace of the mid-n engines (512x256), XLA
update vs blocked kernel — accounting for the gap above the 3-pass floor."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
import quasinewtonmethods_jl_tpu as qnm
from quasinewtonmethods_jl_tpu.batched_solve import optimize_batched_fused
from quasinewtonmethods_jl_tpu.models import rosenbrock_logdensity
from quasinewtonmethods_jl_tpu.utils.profiling import trace, summarize_trace

RNG = np.random.default_rng(20260816)
def log(m): print(m, flush=True)
log(f"device: {jax.devices()[0]}")

X = jnp.asarray(RNG.standard_normal((512, 256)), jnp.float32)
float(jnp.sum(X))

for kernel in ("xla", "pallas_blocked"):
    def go():
        out = optimize_batched_fused(rosenbrock_logdensity, X, kernel=kernel,
                                     tol=1e-3, max_iterations=3000)
        float(jnp.sum(out.x) + jnp.sum(out.status).astype(jnp.float32))
        return out
    out = go()
    tdir = f"/tmp/trace_r2j_{kernel}"
    t0 = time.perf_counter()
    with trace(tdir):
        out = go()
    wall = time.perf_counter() - t0
    itmax = int(out.iterations.max())
    log(f"--- {kernel}: wall {wall*1e3:.1f} ms, itmax {itmax}, "
        f"{wall/itmax*1e6:.0f} us/iter ---")
    for name, tot, cnt in summarize_trace(tdir, top=16):
        log(f"  {tot*1e3:8.1f} ms  x{cnt:<6d} {tot/itmax*1e6:6.1f} us/iter  {name[:80]}")
log("done")
