"""Round-2 part G: blocked-kernel block_r / block_batch sweep + n=512 trace."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
import quasinewtonmethods_jl_tpu as qnm
from quasinewtonmethods_jl_tpu.batched_solve import optimize_batched_fused
from quasinewtonmethods_jl_tpu.ops.pallas import bfgs_blocked
from quasinewtonmethods_jl_tpu.models import rosenbrock_logdensity
from quasinewtonmethods_jl_tpu.utils.profiling import trace, summarize_trace

RNG = np.random.default_rng(20260816)
def log(m): print(m, flush=True)
log(f"device: {jax.devices()[0]}")


def run_cfg(batch, n, block_r, block_batch, reps=3):
    """Force a specific (block_r, block_batch) through the engine by
    monkeypatching the feasibility pick (experiment only)."""
    orig = bfgs_blocked.blocked_feasible_rows
    bfgs_blocked.blocked_feasible_rows = lambda *a, **k: block_r
    import quasinewtonmethods_jl_tpu.batched_solve as bs
    bs.blocked_feasible_rows = bfgs_blocked.blocked_feasible_rows
    try:
        X = jnp.asarray(RNG.standard_normal((batch, n)), jnp.float32)
        float(jnp.sum(X))
        def go():
            out = optimize_batched_fused(
                rosenbrock_logdensity, X, kernel="pallas_blocked",
                block_batch=block_batch, tol=1e-3, max_iterations=3000)
            float(jnp.sum(out.x) + jnp.sum(out.status).astype(jnp.float32))
            return out
        out = go()
        best = np.inf
        for _ in range(reps):
            t0 = time.perf_counter(); out = go()
            best = min(best, time.perf_counter() - t0)
        conv = int(jnp.sum(out.status == qnm.Status.CONVERGED))
        itmax = int(out.iterations.max())
        log(f"{batch}x{n} r={block_r} bb={block_batch}: {best*1e3:.1f} ms -> "
            f"{batch/best:.0f}/s (conv {conv}, itmax {itmax}, "
            f"{best/itmax*1e6:.0f} us/iter)")
        return out
    except Exception as e:
        log(f"{batch}x{n} r={block_r} bb={block_batch}: FAIL {type(e).__name__}: {str(e)[:200]}")
        return None
    finally:
        bfgs_blocked.blocked_feasible_rows = orig
        bs.blocked_feasible_rows = orig


for r in (8, 16, 32, 64):
    run_cfg(512, 256, r, 128)
for bb in (256, 512):
    run_cfg(512, 256, 16, bb)
for r in (4, 8, 16, 32):
    run_cfg(256, 512, r, 128)
run_cfg(256, 512, 8, 256)

# trace the n=512 default config
X = jnp.asarray(RNG.standard_normal((256, 512)), jnp.float32); float(jnp.sum(X))
def go512():
    out = optimize_batched_fused(rosenbrock_logdensity, X, kernel="pallas",
                                 tol=1e-3, max_iterations=3000)
    float(jnp.sum(out.x) + jnp.sum(out.status).astype(jnp.float32))
    return out
go512()
with trace("/tmp/trace_r2g"):
    out = go512()
itmax = int(out.iterations.max())
for name, tot, cnt in summarize_trace("/tmp/trace_r2g", top=14):
    log(f"  {tot*1e3:8.1f} ms  x{cnt:<6d} {name[:90]}")
log(f"itmax {itmax}")
log("done")
