"""Round-4g: the productized `nuts_sample_depth_sorted` API on chip.

Validates the library entry point (probe -> sort -> sub-fleets ->
scatter/merge) through axon at fleet scale on Neal's funnel, and
re-measures the win with the probe cost INCLUDED (the r4f experiment
timed the sorted legs alone; the API pays two probe legs up front).
Also drives the correlated-Gaussian control: the API must REFUSE to
sort there (persistence below threshold) and fall back.
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


def drive(name, logd, n, chains=4096, warm=256, draws=96, max_depth=9,
          **kw):
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.standard_normal((chains, n)) * 0.5, jnp.float32)
    r0 = qnm.nuts_sample(logd, jax.random.PRNGKey(0), x0, n_samples=0,
                         n_warmup=warm, total_warmup=warm,
                         max_depth=max_depth)
    st = r0.state

    # plain full-fleet baseline (warm then timed)
    plain = qnm.nuts_sample_from_state(logd, st, n_samples=draws,
                                       max_depth=max_depth)
    t0 = time.time()
    plain = qnm.nuts_sample_from_state(logd, st, n_samples=draws,
                                       max_depth=max_depth)
    float(jnp.sum(plain.samples[-1]))
    w_plain = time.time() - t0

    # API path (warm then timed; probe legs + sorted sub-fleets inside)
    res, info = qnm.nuts_sample_depth_sorted(
        logd, st, n_samples=draws, max_depth=max_depth, **kw)
    t0 = time.time()
    res, info = qnm.nuts_sample_depth_sorted(
        logd, st, n_samples=draws, max_depth=max_depth, **kw)
    float(jnp.sum(res.samples[-1]))
    w_api = time.time() - t0

    assert res.samples.shape == (draws, chains, n), res.samples.shape
    d = qnm.diagnose_chains_device(res.samples)
    log(f"{name}: sorted={info.sorted} persistence={info.persistence:.3f} "
        f"spread={info.depth_spread:.2f} groups={info.group_sizes} "
        f"gdepths={tuple(round(g, 2) for g in info.group_mean_depths)}")
    log(f"{name}: plain {w_plain:.2f}s vs api {w_api:.2f}s -> "
        f"{w_plain / w_api:.2f}x (probe cost included); "
        f"max rhat {float(jnp.max(d.rhat)):.3f}")


def main():
    log(f"device {jax.devices()[0]}")
    drive("funnel n=60", funnel_logdensity, 60,
          groups=4, probe_draws=8)

    n = 60
    rng = np.random.default_rng(7)
    A = rng.standard_normal((n, n))
    C = A @ A.T / n + np.eye(n)
    Ci = jnp.asarray(np.linalg.inv(C), jnp.float32)

    def gauss(x):
        return -0.5 * x @ Ci @ x

    drive("corr-gauss n=60 (control, must fall back)", gauss, n,
          groups=4, probe_draws=8)
    print("DONE")


if __name__ == "__main__":
    main()
