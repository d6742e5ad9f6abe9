"""Round-4 chip validation: constrained-parameter transforms at f32 on the
real TPU.

Checks (correctness, not wall — host load does not matter here):
 1. A transformed gamma-product fleet (Positive) through the fused batched
    engine converges at the f32 contract (tol 1e-3) and the constrained
    MAP matches the closed form a/b.
 2. The hierarchical correlated random-effects model (matvec in the
    objective — the round-3 matmul-precision trap class) reaches MAP on
    chip and map_then_sample(transform=) produces finite, constraint-
    respecting draws with sane diagnostics.
 3. Transform-overhead A/B: the same gamma fleet with/without the
    transform (z-space objective written by hand), same seeds — per-iter
    overhead of the bijection graph should be noise (elementwise ops fused
    into the update).

Run: python scripts/tpu_experiments_r4i.py   (axon TPU; first jit ~3-10 min)
"""

import sys, time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

import quasinewtonmethods_jl_tpu as qnm
from quasinewtonmethods_jl_tpu import transforms as tfm
from quasinewtonmethods_jl_tpu.models import HierarchicalRegression

print("devices:", jax.devices(), flush=True)


def readback(x):
    return float(jnp.sum(x))


# ---------------------------------------------------------------------------
# 1. transformed gamma fleet on chip
n, B = 60, 1024
rng = np.random.default_rng(0)
a = jnp.asarray(rng.uniform(2.0, 6.0, n), jnp.float32)
b = jnp.asarray(rng.uniform(0.5, 4.0, n), jnp.float32)


def gamma_logdensity(x):
    return jnp.sum((a - 1.0) * jnp.log(x) - b * x)


t = tfm.Positive(n)
m = tfm.transform_objective(gamma_logdensity, t)
z0 = jnp.asarray(0.3 * rng.standard_normal((B, n)), jnp.float32)

t0 = time.time()
res = qnm.optimize_batched(m, z0, tol=1e-3)
readback(res.x)
t1 = time.time()
conv = int(jnp.sum(res.status == qnm.Status.CONVERGED))
xmap = m.constrain(res.x)
err = float(jnp.max(jnp.abs(xmap - a / b)))
print(f"[1] gamma fleet {B}x{n}: conv {conv}/{B}, max|x-a/b|={err:.2e}, "
      f"wall(first,inc compile) {t1-t0:.1f}s", flush=True)
assert conv == B, conv
assert err < 5e-2, err

# ---------------------------------------------------------------------------
# 2. hierarchical model on chip (matvec objective => precision-trap class)
hm = HierarchicalRegression(n_groups=8, q=2, p=3, n_obs=512, seed=1,
                            dtype=jnp.float32)
thm = tfm.transform_objective(hm, hm.transform)
zh0 = thm.unconstrain(hm.initial_point())
t0 = time.time()
rh = qnm.optimize(thm, zh0, tol=1e-3)
readback(rh.x)
t1 = time.time()
xh = thm.constrain(rh.x)
beta, _, tau, sigma, L = hm.split(xh)
print(f"[2] hierarchical MAP: status={qnm.Status(int(rh.status)).name}, "
      f"fun={float(rh.fun):.3f}, |beta-true|={float(jnp.max(jnp.abs(beta-hm.beta_true))):.3f}, "
      f"sigma={float(sigma):.3f} (true {hm.sigma_true}), wall {t1-t0:.1f}s",
      flush=True)
assert int(rh.status) == int(qnm.Status.CONVERGED)
assert float(jnp.max(jnp.abs(beta - hm.beta_true))) < 0.3

t0 = time.time()
out = qnm.map_then_sample(
    hm, jax.random.key(2), hm.initial_point(),
    n_chains=256, n_samples=128, n_warmup=256,
    transform=hm.transform, init_scale=0.05,
)
readback(out.samples_constrained)
t1 = time.time()
sc = np.asarray(out.samples_constrained)
k = hm.p + hm.n_groups * hm.q
tau_draws = sc[..., k:k + hm.q]
rhat = np.asarray(out.diagnostics.rhat)
print(f"[2b] pipeline 256 chains x 128 draws: finite={np.isfinite(sc).all()}, "
      f"tau>0={bool((tau_draws > 0).all())}, max rhat={np.nanmax(rhat):.3f}, "
      f"wall {t1-t0:.1f}s", flush=True)
assert np.isfinite(sc).all()
assert (tau_draws > 0).all()

# ---------------------------------------------------------------------------
# 3. transform-overhead A/B (same process, interleaved)


def gamma_logdensity_z(zv):  # hand-written z-space equivalent
    x = jnp.exp(zv)
    return jnp.sum((a - 1.0) * jnp.log(x) - b * x) + jnp.sum(zv)


def run_t():
    r = qnm.optimize_batched(m, z0, tol=1e-3)
    readback(r.x)
    return r


def run_z():
    r = qnm.optimize_batched(gamma_logdensity_z, z0, tol=1e-3)
    readback(r.x)
    return r


run_t(); run_z()  # warm both
walls_t, walls_z = [], []
for _ in range(5):
    s = time.time(); run_t(); walls_t.append(time.time() - s)
    s = time.time(); run_z(); walls_z.append(time.time() - s)
wt, wz = np.median(walls_t), np.median(walls_z)
print(f"[3] transform overhead A/B {B}x{n}: wrapped {wt*1e3:.1f} ms vs "
      f"hand-z {wz*1e3:.1f} ms ({wt/wz:.3f}x)", flush=True)

print("ALL CHIP CHECKS PASSED", flush=True)
