"""Round-2 part P: the one-call pipeline end-to-end on the chip.

map_then_sample at fleet scale: 4096-chain MAP solve + ChEES sampling +
host-side diagnostics, one wall-clock number for the whole workflow the
reference library served.
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
import quasinewtonmethods_jl_tpu as qnm

RNG = np.random.default_rng(20260816)
def log(m): print(m, flush=True)
log(f"device: {jax.devices()[0]}")

n, chains = 60, 4096
prec = jnp.asarray(RNG.standard_normal((n, n)) * 0.1, jnp.float32)
prec = prec @ prec.T + jnp.eye(n, dtype=jnp.float32)
def logdensity(x):
    return -0.5 * x @ (prec @ x)

def run():
    return qnm.map_then_sample(
        logdensity, jax.random.PRNGKey(0),
        jnp.zeros(n, jnp.float32), n_chains=chains,
        n_samples=256, n_warmup=128, init_scale=2.0,
    )

out = run()  # warmup (compiles both stages)
best = np.inf
for _ in range(3):
    t0 = time.perf_counter(); out = run()
    best = min(best, time.perf_counter() - t0)
conv = int((np.asarray(out.map_result.status) == qnm.Status.CONVERGED).sum())
log(f"map_then_sample {chains}x{n}: {best*1e3:.0f} ms end-to-end "
    f"(MAP {conv}/{chains} conv, {256*chains} draws, "
    f"max rhat {float(out.diagnostics.rhat.max()):.3f}, "
    f"min ess {float(out.diagnostics.ess.min()):.0f})")
log("done")

# device-only variant: what the pipeline costs WITHOUT the host fetch
def run_dev():
    out = qnm.map_then_sample(
        logdensity, jax.random.PRNGKey(0), jnp.zeros(n, jnp.float32),
        n_chains=chains, n_samples=256, n_warmup=128, init_scale=2.0,
        compute_diagnostics=False,
    )
    # one combined scalar readback (the bench protocol)
    float(jnp.sum(out.samples[-1]) + jnp.sum(out.map_result.fun))
    return out

out = run_dev(); best = np.inf
for _ in range(3):
    t0 = time.perf_counter(); out = run_dev()
    best = min(best, time.perf_counter() - t0)
log(f"map_then_sample {chains}x{n} (device-only): {best*1e3:.0f} ms "
    f"end-to-end ({256*chains} draws resident on device)")
log("device-only done")
