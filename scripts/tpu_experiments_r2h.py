"""Round-2 part H: blocked-kernel microbench (block_r sweep at the kernel
level, where block_r is a true static arg — the engine-level sweep in part G
was invalidated by jit caching) + clean engine comparison on an idle host."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
from jax import lax
import quasinewtonmethods_jl_tpu as qnm
from quasinewtonmethods_jl_tpu.batched_solve import optimize_batched_fused
from quasinewtonmethods_jl_tpu.ops.pallas.bfgs_blocked import (
    fused_bfgs_update_blocked,
)
from quasinewtonmethods_jl_tpu.ops.pallas.bfgs_kernel import (
    fused_bfgs_update_reference,
)
from quasinewtonmethods_jl_tpu.models import rosenbrock_logdensity

RNG = np.random.default_rng(20260816)
def log(m): print(m, flush=True)
log(f"device: {jax.devices()[0]}")

ITERS = 50

def inputs(n, batch):
    B = jnp.broadcast_to(jnp.eye(n, dtype=jnp.float32)[:, :, None],
                         (n, n, batch)) * 1.0
    s = jnp.asarray(RNG.standard_normal((n, batch)) * 0.1, jnp.float32)
    g = jnp.asarray(RNG.standard_normal((n, batch)), jnp.float32)
    gold = g + s + jnp.asarray(RNG.standard_normal((n, batch)) * 0.01,
                               jnp.float32)
    active = jnp.ones((1, batch), jnp.float32)
    fresh = jnp.zeros((1, batch), jnp.float32)
    return B, s, g, gold, active, fresh


def bench(update, n, batch, label):
    B, s, g, gold, active, fresh = inputs(n, batch)

    @jax.jit
    def loop(B):
        def body(i, B):
            return update(B, s, g, gold, active, fresh)[0]
        return lax.fori_loop(0, ITERS, body, B)

    try:
        out = loop(B)
        float(jnp.sum(out))
    except Exception as e:
        log(f"{label} n={n} b={batch}: FAIL {type(e).__name__}: {str(e)[:160]}")
        return
    best = np.inf
    for _ in range(3):
        t0 = time.perf_counter()
        float(jnp.sum(loop(B)))
        best = min(best, time.perf_counter() - t0)
    per = best / ITERS
    gbs = 3 * (4 * n * n * batch) / per / 1e9
    log(f"{label} n={n} b={batch}: {per*1e6:.0f} us/call "
        f"({gbs:.0f} GB/s effective at 3 passes)")


from functools import partial
for n, batch in ((128, 1024), (256, 512), (512, 256)):
    bench(fused_bfgs_update_reference, n, batch, "xla       ")
    for block_r in (8, 16, 32, 64, 128):
        if n % block_r or block_r > n:
            continue
        bench(partial(fused_bfgs_update_blocked, block_r=block_r,
                      block_batch=128), n, batch, f"blocked r={block_r:<3d}")

# clean engine-level comparison (idle host, no concurrent pytest)
for batch, n in ((1024, 128), (512, 256), (256, 512)):
    Xm = jnp.asarray(RNG.standard_normal((batch, n)), jnp.float32)
    float(jnp.sum(Xm))
    for kernel in ("xla", "pallas"):
        def run():
            out = optimize_batched_fused(
                rosenbrock_logdensity, Xm, kernel=kernel,
                tol=1e-3, max_iterations=3000)
            float(jnp.sum(out.x) + jnp.sum(out.status).astype(jnp.float32))
            return out
        out = run()
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
