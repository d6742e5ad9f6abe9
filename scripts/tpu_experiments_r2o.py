"""Round-2 part O: sampler throughput vs fleet width (where does the chip
saturate?). ChEES on the n=60 correlated Gaussian across chain counts."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
import quasinewtonmethods_jl_tpu as qnm

RNG = np.random.default_rng(20260816)
def log(m): print(m, flush=True)
log(f"device: {jax.devices()[0]}")

n = 60
prec = jnp.asarray(RNG.standard_normal((n, n)) * 0.1, jnp.float32)
prec = prec @ prec.T + jnp.eye(n, dtype=jnp.float32)
def logdensity(x):
    return -0.5 * x @ (prec @ x)

n_samples, n_warmup = 256, 128
for chains in (256, 1024, 4096, 16384):
    x0s = jnp.zeros((chains, n), jnp.float32)
    def run():
        r = qnm.chees_sample(logdensity, jax.random.PRNGKey(1), x0s,
                             n_samples=n_samples, n_warmup=n_warmup,
                             max_leapfrog=64)
        float(jnp.sum(r.final_x) + jnp.sum(r.accept_rate))
        return r
    r = run(); best = np.inf
    for _ in range(3):
        t0 = time.perf_counter(); r = run()
        best = min(best, time.perf_counter() - t0)
    log(f"chees {chains}x{n}: {best*1e3:.0f} ms -> "
        f"{n_samples*chains/best/1e6:.2f}M draws/s "
        f"(acc {float(jnp.mean(r.accept_rate)):.2f})")
log("done")
