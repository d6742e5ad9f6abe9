"""Chip drive + A/B for the ensemble sampler (round 4, session s).

4096 walkers x n=60 standard Gaussian (the sampler-bench shape):
partner='gather' (independent partners, one (W/2, n) row gather per
half-step) vs partner='shift' (shared offset, jnp.roll) — the CLAUDE.md
gather-poison question, answered by measurement. Also a Rosenbrock
(non-Gaussian) acceptance sanity check. ONE combined readback per timed
call, min-of-3, idle host.

Run: python scripts/tpu_experiments_r4s.py
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

import quasinewtonmethods_jl_tpu as qnm

print("devices:", jax.devices(), flush=True)

W, N, DRAWS, WARM = 4096, 60, 256, 64


def logd(x):
    return -0.5 * jnp.sum(x * x)


rng = np.random.default_rng(20260819)
x0s = jnp.asarray(rng.standard_normal((W, N)), jnp.float32)
key = jax.random.PRNGKey(0)


def run(partner):
    def call():
        r = qnm.ensemble_sample(
            logd, key, x0s, n_samples=DRAWS, n_warmup=WARM, partner=partner
        )
        return r

    r = call()
    # ONE readback
    float(jnp.sum(r.final_x) + jnp.sum(r.accept_rate))
    acc = float(r.accept_rate.mean())
    best = np.inf
    for _ in range(3):
        t0 = time.perf_counter()
        r = call()
        float(jnp.sum(r.final_x) + jnp.sum(r.accept_rate))
        best = min(best, time.perf_counter() - t0)
    total_draws = DRAWS * W
    print(
        f"{partner}: {total_draws / best / 1e6:.2f}M draws/s  "
        f"wall={best * 1e3:.1f} ms  accept={acc:.3f}",
        flush=True,
    )
    return total_draws / best


g1 = run("gather")
s1 = run("shift")
g2 = run("gather")
print(f"shift/gather ratio: {s1 / max(g1, g2):.2f}", flush=True)

# moment sanity on chip (f32): recover the standard Gaussian
r = qnm.ensemble_sample(logd, key, x0s, n_samples=DRAWS, n_warmup=WARM)
d = np.asarray(r.samples).reshape(-1, N)
print(
    f"moments: |mean| max {np.abs(d.mean(0)).max():.3f}, "
    f"var in [{d.var(0).min():.3f}, {d.var(0).max():.3f}]",
    flush=True,
)
