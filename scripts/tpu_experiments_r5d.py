"""Scan-rewrite (dus form) resident lowering probe (round 5, session d).

r5c pinned the Mosaic boundary: scans with extensive outputs cannot
lower (`_scan_lowering_rule` raises at num_extensive > 0). The rewrite
now converts extensive outputs to dynamic_update_slice carry
accumulation — this session is the chip verdict on the dus form, plus
interpret-vs-chip parity of the AR(1) fleet.

Run: python scripts/tpu_experiments_r5d.py
"""

import sys
import time
import traceback

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

import quasinewtonmethods_jl_tpu as qnm
from quasinewtonmethods_jl_tpu.batched_solve import optimize_batched_fused
from quasinewtonmethods_jl_tpu.resident_solve import optimize_batched_resident

print("devices:", jax.devices(), flush=True)
t0 = time.perf_counter()
print("warmup sum:", float(jnp.sum(jnp.ones(8))),
      f"({time.perf_counter()-t0:.0f}s)", flush=True)

T, n_ar = 8, 6
A = jnp.asarray(np.random.default_rng(0).standard_normal((n_ar, n_ar))
                * (0.5 / n_ar), jnp.float32)
ys = jnp.asarray(np.random.default_rng(1).standard_normal((T, n_ar)),
                 jnp.float32)


def ar1(w):
    def step(carry, y):
        pred = A @ carry + w
        return pred, -0.5 * jnp.sum((y - pred) ** 2)

    _, lls = jax.lax.scan(step, jnp.zeros(n_ar, w.dtype), ys)
    return jnp.sum(lls) - 0.5 * jnp.sum(w * w)


def readback(*xs):
    return float(sum(jnp.sum(jnp.where(jnp.isfinite(x), x, 0.0)) for x in xs))


X0a = jnp.asarray(
    np.random.default_rng(2).standard_normal((128, n_ar)), jnp.float32
)
try:
    res = optimize_batched_resident(ar1, X0a, tol=1e-3, block_batch=128)
    readback(res.x)
    conv = int(jnp.sum(res.status == qnm.Status.CONVERGED))
    fused = optimize_batched_fused(ar1, X0a, tol=1e-3)
    readback(fused.x)
    same = int(jnp.sum(res.status == fused.status))
    dx = float(jnp.max(jnp.abs(res.x - fused.x)))
    same_it = int(jnp.sum(res.iterations == fused.iterations))
    print(f"scan-resident ON CHIP (dus form): conv {conv}/128; status "
          f"match {same}/128; iter match {same_it}/128; max|dx| {dx:.2e}",
          flush=True)
except Exception:
    traceback.print_exc()
print("done", flush=True)
