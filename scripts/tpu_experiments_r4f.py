"""Round-4f: NUTS fleet depth-compaction experiment (VERDICT r3 item 6).

Hypothesis: NUTS fleet draws cost the FLEET-MAX tree work per draw
(lockstep early-exit while loops). If per-chain tree depth is
*recurringly* predictable (chains in tighter regions keep needing deeper
trees), sorting chains by last-leg mean depth into depth-homogeneous
sub-fleets should cut sum(group_size x group_max_depth) below
fleet_size x fleet_max_depth, at the price of G dispatches.

Protocol (per target):
  1. warm up the full fleet once;
  2. two 16-draw probe legs -> per-chain mean depths d1, d2; their
     across-leg correlation is the PERSISTENCE number that decides
     whether sorting can work at all;
  3. A/B at the same total draw budget: one 64-draw full-fleet leg vs
     G=4 depth-sorted sub-fleet legs (sum of walls, one readback each).

Targets: Neal's funnel n=60 (depth-heterogeneous geometry) and the
correlated Gaussian (homogeneous control — sorting cannot help there,
any win would be batch-size artifact).
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


CHAIN_FIELDS = ("x", "f", "g", "log_eps", "log_eps_bar", "h_bar")


def take_chains(state, idx):
    return state._replace(
        **{k: getattr(state, k)[idx] for k in CHAIN_FIELDS}
    )


def run_target(name, logd, n, chains=4096, warm=256, probe=16, draws=64,
               groups=4, max_depth=9):
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.standard_normal((chains, n)) * 0.5, jnp.float32)
    r0 = qnm.nuts_sample(
        logd, jax.random.PRNGKey(0), x0, n_samples=0, n_warmup=warm,
        total_warmup=warm, max_depth=max_depth,
    )
    st = r0.state

    p1 = qnm.nuts_sample_from_state(logd, st, n_samples=probe,
                                    max_depth=max_depth)
    p2 = qnm.nuts_sample_from_state(logd, p1.state, n_samples=probe,
                                    max_depth=max_depth)
    d1 = np.asarray(p1.mean_tree_depth)
    d2 = np.asarray(p2.mean_tree_depth)
    pers = float(np.corrcoef(d1, d2)[0, 1])
    log(f"{name}: depth mean {d2.mean():.2f} spread "
        f"[{d2.min():.1f},{d2.max():.1f}], leg-to-leg persistence "
        f"r={pers:.3f}")

    st = p2.state

    # (a) full fleet, warm then timed
    full = qnm.nuts_sample_from_state(logd, st, n_samples=draws,
                                      max_depth=max_depth)
    t0 = time.time()
    full = qnm.nuts_sample_from_state(logd, st, n_samples=draws,
                                      max_depth=max_depth)
    float(jnp.sum(full.samples[-1]))
    w_full = time.time() - t0
    log(f"{name} full fleet: {w_full:.2f}s for {draws}x{chains} "
        f"(mean depth {float(full.mean_tree_depth.mean()):.2f})")

    # (b) depth-sorted sub-fleets (sorted by the probe's d2)
    order = np.argsort(d2)
    gsize = chains // groups
    idxs = [jnp.asarray(order[i * gsize:(i + 1) * gsize])
            for i in range(groups)]
    sub_states = [take_chains(st, ix) for ix in idxs]
    subs = [qnm.nuts_sample_from_state(logd, s, n_samples=draws,
                                       max_depth=max_depth)
            for s in sub_states]  # warm each group's executable
    for s in subs:
        float(jnp.sum(s.samples[-1]))
    t0 = time.time()
    subs = [qnm.nuts_sample_from_state(logd, s, n_samples=draws,
                                       max_depth=max_depth)
            for s in sub_states]
    for s in subs:
        float(jnp.sum(s.samples[-1]))
    w_sub = time.time() - t0
    depths = [float(s.mean_tree_depth.mean()) for s in subs]
    log(f"{name} {groups} sorted sub-fleets: {w_sub:.2f}s "
        f"(group mean depths {['%.2f' % d for d in depths]}) -> "
        f"{'WIN' if w_sub < w_full else 'LOSS'} {w_full/w_sub:.2f}x")

    # control: UNSORTED split (same dispatch count, no homogeneity) —
    # separates dispatch cost from the sorting benefit
    idxs_u = [jnp.asarray(np.arange(i * gsize, (i + 1) * gsize))
              for i in range(groups)]
    sub_states_u = [take_chains(st, ix) for ix in idxs_u]
    subs_u = [qnm.nuts_sample_from_state(logd, s, n_samples=draws,
                                         max_depth=max_depth)
              for s in sub_states_u]
    for s in subs_u:
        float(jnp.sum(s.samples[-1]))
    t0 = time.time()
    subs_u = [qnm.nuts_sample_from_state(logd, s, n_samples=draws,
                                         max_depth=max_depth)
              for s in sub_states_u]
    for s in subs_u:
        float(jnp.sum(s.samples[-1]))
    w_unsorted = time.time() - t0
    log(f"{name} {groups} UNSORTED sub-fleets: {w_unsorted:.2f}s "
        f"(dispatch-cost control)")


def main():
    log(f"device {jax.devices()[0]}")
    n = 60

    def funnel(t):
        return funnel_logdensity(t)

    run_target("funnel n=60", funnel, n)

    rng = np.random.default_rng(7)
    A = rng.standard_normal((n, n))
    C = A @ A.T / n + np.eye(n)
    Ci = jnp.asarray(np.linalg.inv(C), jnp.float32)

    def gauss(x):
        return -0.5 * x @ Ci @ x

    run_target("corr-gauss n=60", gauss, n)
    print("DONE")


if __name__ == "__main__":
    main()
