"""Round-4 chip measurement: MCLMC fleet throughput vs ChEES.

Protocol (CLAUDE.md benchmarking rules): idle machine, warmup call
absorbs the axon init, ONE combined scalar readback per timed call,
same-process interleaved A/B. 4096 chains x n=60 standard Gaussian,
f32 (the ChEES 20.2M draws/s fixture from round 2).

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/tpu_experiments_r4u.py
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

import quasinewtonmethods_jl_tpu as qnm  # noqa: E402

CHAINS, N = 4096, 60
WARM, DRAWS = 256, 512


def logd(x):
    return -0.5 * jnp.sum(x * x)


def readback(*xs):
    # ONE combined scalar per timed call (the separate-readback trap)
    s = jnp.zeros((), jnp.float32)
    for x in xs:
        s = s + jnp.sum(x).astype(jnp.float32)
    return float(s)


def time_mclmc(key):
    t0 = time.perf_counter()
    r = qnm.mclmc_sample(logd, key, x0, n_samples=DRAWS, n_warmup=WARM)
    rb = readback(r.samples, r.final_x)
    dt = time.perf_counter() - t0
    return dt, rb, r


def time_chees(key):
    t0 = time.perf_counter()
    r = qnm.chees_sample(logd, key, x0, n_samples=DRAWS, n_warmup=WARM)
    rb = readback(r.samples, r.final_x)
    dt = time.perf_counter() - t0
    return dt, rb, r


def main():
    global x0
    print("devices:", jax.devices(), flush=True)
    key = jax.random.PRNGKey(0)
    x0 = jax.random.normal(key, (CHAINS, N), jnp.float32)

    # warmup both programs (compile + axon init)
    print("compiling (first call pays axon init)...", flush=True)
    time_mclmc(jax.random.PRNGKey(100))
    time_chees(jax.random.PRNGKey(100))

    total = DRAWS * CHAINS
    for rep in range(3):
        dt_m, _, rm = time_mclmc(jax.random.PRNGKey(rep))
        dt_c, _, rc = time_chees(jax.random.PRNGKey(rep))
        print(
            f"rep {rep}: mclmc {dt_m:.3f}s = {total / dt_m / 1e6:.1f}M "
            f"draws/s (eps {float(rm.step_size):.2f}, L {float(rm.L):.2f}, "
            f"varE {float(rm.energy_var):.2e}, "
            f"div {int(rm.divergences.sum())}) | "
            f"chees {dt_c:.3f}s = {total / dt_c / 1e6:.1f}M draws/s "
            f"(eps {float(rc.step_size):.3f}, "
            f"T {float(rc.traj_length):.2f})",
            flush=True,
        )

    # draws-only rate (warmup excluded): time a from_state continuation
    warm = qnm.mclmc_sample(logd, key, x0, n_samples=0, n_warmup=WARM)
    jax.block_until_ready(warm.state.x)
    # compile the continuation
    r = qnm.mclmc_sample_from_state(logd, warm.state, n_samples=DRAWS)
    readback(r.samples)
    t0 = time.perf_counter()
    r = qnm.mclmc_sample_from_state(logd, warm.state, n_samples=DRAWS)
    readback(r.samples)
    dt = time.perf_counter() - t0
    print(
        f"mclmc sampling-only: {dt:.3f}s = {total / dt / 1e6:.1f}M draws/s",
        flush=True,
    )

    # moment sanity on chip at f32
    s = r.samples.reshape(-1, N)
    print(
        "chip f32 moments: |mean|max",
        float(jnp.max(jnp.abs(jnp.mean(s, 0)))),
        "var range",
        float(jnp.min(jnp.var(s, 0))),
        float(jnp.max(jnp.var(s, 0))),
        flush=True,
    )


if __name__ == "__main__":
    main()
