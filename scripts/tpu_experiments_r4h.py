"""Round-4h chip measurements.

Part A — `nuts_sample_depth_sorted` at a realistic draw budget
(4096 chains x 384 draws, funnel n=60): the API's win with the probe
cost INCLUDED (earlier: 1.22x probe-free, 1.00x at 96 draws where the
two 8-draw probe legs eat the margin).

Part B — adapt_mass='lowrank' under the round-4 STANDARDIZED metric
(diag-EMA outer scale x standardized core) on the r3b n=512 fixture:
re-measures the r4e A/B (the 40.4k ESS/s number was the scalar-γ
metric; the fixture is isotropic+amplified so expect parity or
better), same budgets, same protocol.
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
import quasinewtonmethods_jl_tpu as qnm
from quasinewtonmethods_jl_tpu.models import funnel_logdensity


def log(m):
    print(m, file=sys.stderr, flush=True)


def part_a():
    chains, n, warm, draws, md = 4096, 60, 256, 384, 9
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.standard_normal((chains, n)) * 0.5, jnp.float32)
    r0 = qnm.nuts_sample(funnel_logdensity, jax.random.PRNGKey(0), x0,
                         n_samples=0, n_warmup=warm, total_warmup=warm,
                         max_depth=md)
    st = r0.state
    plain = qnm.nuts_sample_from_state(funnel_logdensity, st,
                                       n_samples=draws, max_depth=md)
    t0 = time.time()
    plain = qnm.nuts_sample_from_state(funnel_logdensity, st,
                                       n_samples=draws, max_depth=md)
    float(jnp.sum(plain.samples[-1]))
    w_plain = time.time() - t0
    res, info = qnm.nuts_sample_depth_sorted(
        funnel_logdensity, st, n_samples=draws, max_depth=md,
        groups=4, probe_draws=8)
    t0 = time.time()
    res, info = qnm.nuts_sample_depth_sorted(
        funnel_logdensity, st, n_samples=draws, max_depth=md,
        groups=4, probe_draws=8)
    float(jnp.sum(res.samples[-1]))
    w_api = time.time() - t0
    log(f"A funnel {draws}x{chains}: plain {w_plain:.2f}s vs "
        f"depth-sorted api {w_api:.2f}s -> {w_plain/w_api:.2f}x "
        f"(sorted={info.sorted}, persistence={info.persistence:.2f})")


def part_b():
    n, chains, r_dirs = 512, 1024, 8
    rng = np.random.default_rng(42)
    V, _ = np.linalg.qr(rng.standard_normal((n, n)))
    V = V[:, :r_dirs]
    amps = np.geomspace(200.0, 20.0, r_dirs)
    C = np.eye(n) + V @ np.diag(amps - 1.0) @ V.T
    Ci = jnp.asarray(np.linalg.inv(C), jnp.float32)

    def logd(x):
        return -0.5 * x @ (Ci @ x)

    x0 = jnp.asarray(rng.standard_normal((chains, n)) * 0.3, jnp.float32)
    budget = dict(n_samples=512, n_warmup=512)

    for name, kw in [
        ("adapt-lowrank r=16", dict(adapt_mass="lowrank", mass_rank=16)),
        ("adapt-diag", dict(adapt_mass=True)),
    ]:
        r = qnm.chees_sample(logd, jax.random.PRNGKey(1), x0, **budget, **kw)
        jax.block_until_ready(r.samples)
        t0 = time.time()
        r = qnm.chees_sample(logd, jax.random.PRNGKey(1), x0, **budget, **kw)
        d = qnm.diagnose_chains_device(r.samples)
        mn = float(jnp.min(d.ess)); rh = float(jnp.max(d.rhat))
        wall = time.time() - t0
        total = budget["n_samples"] * chains
        log(f"B chees {name}: min ESS {mn:.0f} / {total} draws, "
            f"max rhat {rh:.3f}, acc {float(jnp.mean(r.accept_rate)):.2f}, "
            f"wall {wall:.1f}s -> {mn/wall:.0f} ESS/s")


def main():
    log(f"device {jax.devices()[0]}")
    part_a()
    part_b()
    print("DONE")


if __name__ == "__main__":
    main()
