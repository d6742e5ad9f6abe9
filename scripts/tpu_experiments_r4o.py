"""Round-4: SVGD on the real v5e — is the kernel Stein transport really
MXU-bound throughput?

Fleet sweep on the correlated-Gaussian fixture (n=60): steps/s at
B = 256 / 1024 / 4096, plus moment quality at the end of each run.
f32, one combined readback per timed call, idle machine.

Run: python scripts/tpu_experiments_r4o.py
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

import quasinewtonmethods_jl_tpu as qnm

print("devices:", jax.devices(), flush=True)

N = 60
STEPS = 300
rng = np.random.default_rng(0)
A = rng.standard_normal((N, N)).astype(np.float32) * 0.3
cov = A @ A.T + np.eye(N, dtype=np.float32)
prec = jnp.asarray(np.linalg.inv(cov).astype(np.float32))


def logdensity(x):
    return -0.5 * x @ (prec @ x)


def readback(*xs):
    tot = sum(jnp.sum(jnp.where(jnp.isfinite(x), x, 0.0)) for x in xs)
    return float(tot)


for B in (256, 1024, 4096):
    x0 = jnp.asarray(
        (rng.standard_normal((B, N)) * 2.0).astype(np.float32))

    def run():
        r = qnm.svgd_sample(logdensity, x0, n_steps=STEPS)
        readback(r.particles, r.logp)
        return r

    run()  # warmup/compile
    walls = []
    for _ in range(3):
        t0 = time.perf_counter()
        r = run()
        walls.append(time.perf_counter() - t0)
    w = min(walls)
    P = np.asarray(r.particles, np.float64)
    cov_err = float(np.max(np.abs(np.cov(P.T) - cov)) / np.max(np.abs(cov)))
    mean_err = float(np.max(np.abs(P.mean(axis=0))))
    print(f"B={B:5d}: {w*1e3:7.1f} ms for {STEPS} steps = "
          f"{STEPS/w:7.0f} steps/s  ({B*STEPS/w:,.0f} particle-steps/s)  "
          f"max|mean| {mean_err:.3f}  rel cov err {cov_err:.3f}",
          flush=True)
print("DONE", flush=True)
