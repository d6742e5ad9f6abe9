"""Round-4 chip measurements: the LM least-squares fleet on the real v5e
(f32 throughput contract).

 1. Exponential-fit fleet (n=2, m=40): 4096 per-lane curves, one launch.
    The "fit 4096 curves" headline shape — solves/s + convergence.
 2. Wider model (n=8 Gaussian-sum peaks fit, m=256): MXU-relevant
    jacobian/Cholesky shapes.
 3. Robust (cauchy) + bounded variants of (1): the feature paths cost.
 4. LM vs BFGS on the SAME objective (½‖r‖² of the exponential fit):
    the Gauss-Newton-vs-quasi-Newton accounting on chip.

One combined readback per timed call; warmup absorbs the axon init;
interleaved same-process A/Bs only (CLAUDE.md session-noise caveat).

Run: python scripts/tpu_experiments_r4l.py   (first jit ~3-10 min)
"""

import os
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

import quasinewtonmethods_jl_tpu as qnm

print("devices:", jax.devices(), flush=True)

B = int(os.environ.get("QNM_R4L_B", "4096"))
TOL = 1e-3  # f32 chip contract


def readback(*xs):
    # ONE combined device->host scalar per timed call (each separate
    # readback costs ~30 ms through axon regardless of payload — the
    # first committed run of this script paid two and underreported)
    tot = sum(jnp.sum(jnp.where(jnp.isfinite(x), x, 0.0)) for x in xs)
    return float(tot)


def timed(fn, reps=3):
    fn()  # warmup (absorbs axon init on the first call)
    walls = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        walls.append(time.perf_counter() - t0)
    return min(walls)


rng = np.random.default_rng(0)

# --- 1. exponential-fit fleet (n=2, m=40) ---------------------------------
M1 = 40
t1 = np.linspace(0.0, 1.0, M1, dtype=np.float32)
amp = rng.uniform(0.5, 3.0, B).astype(np.float32)
rate = rng.uniform(-2.5, -0.5, B).astype(np.float32)
y1 = amp[:, None] * np.exp(rate[:, None] * t1[None, :])
y1 += 0.01 * rng.standard_normal(y1.shape).astype(np.float32)
data1 = (jnp.asarray(np.tile(t1, (B, 1))), jnp.asarray(y1))
x01 = jnp.tile(jnp.asarray([1.0, 0.0], jnp.float32), (B, 1))


def resid_exp(p, data):
    t, y = data
    return p[..., 0:1] * jnp.exp(p[..., 1:2] * t) - y


def run_exp(loss="linear", bounds=None):
    r = qnm.least_squares(resid_exp, x01, data=data1, tol=TOL,
                          loss=loss, f_scale=0.05, bounds=bounds)
    readback(r.x, r.fun.astype(jnp.float32))
    return r


w = timed(run_exp)
r = run_exp()
conv = int(jnp.sum(r.status == qnm.Status.CONVERGED))
iters = np.asarray(r.iterations)
err = float(jnp.max(jnp.abs(r.x - jnp.stack([jnp.asarray(amp), jnp.asarray(rate)], -1))))
print(f"[1] exp-fit n=2 m=40 B={B}: {w*1e3:.1f} ms = {B/w:,.0f} solves/s  "
      f"converged {conv}/{B}  iters med {np.median(iters):.0f} max {iters.max()}  "
      f"max|x-truth| {err:.3g}", flush=True)

# --- 3a. robust (cauchy) on the same fixture ------------------------------
w_c = timed(lambda: run_exp(loss="cauchy"))
rc = run_exp(loss="cauchy")
conv_c = int(jnp.sum(rc.status == qnm.Status.CONVERGED))
print(f"[3a] cauchy: {w_c*1e3:.1f} ms = {B/w_c:,.0f} solves/s  "
      f"converged {conv_c}/{B}  ({w_c/w:.2f}x linear wall)", flush=True)

# --- 3b. bounded on the same fixture --------------------------------------
lo = jnp.asarray([0.0, -2.0], jnp.float32)
hi = jnp.asarray([5.0, 5.0], jnp.float32)
w_b = timed(lambda: run_exp(bounds=(lo, hi)))
rb = run_exp(bounds=(lo, hi))
conv_b = int(jnp.sum(rb.status == qnm.Status.CONVERGED))
print(f"[3b] bounded: {w_b*1e3:.1f} ms = {B/w_b:,.0f} solves/s  "
      f"converged {conv_b}/{B}  ({w_b/w:.2f}x plain wall)", flush=True)

# --- 2. wider model: 3-Gaussian peaks (n=9, m=256) -------------------------
M2, NP = 256, 3
t2 = np.linspace(-4.0, 4.0, M2, dtype=np.float32)
centers = np.stack([rng.uniform(-3, -1, B), rng.uniform(-0.5, 0.5, B),
                    rng.uniform(1, 3, B)], -1).astype(np.float32)
amps = rng.uniform(0.5, 2.0, (B, NP)).astype(np.float32)
wids = rng.uniform(0.3, 0.8, (B, NP)).astype(np.float32)


def peaks_model(p, t):
    a = p[..., 0:NP]
    c = p[..., NP:2 * NP]
    lw = p[..., 2 * NP:3 * NP]
    wdt = jnp.exp(lw)
    return jnp.sum(
        a[..., :, None]
        * jnp.exp(-0.5 * ((t[..., None, :] - c[..., :, None])
                          / wdt[..., :, None]) ** 2),
        axis=-2,
    )


p_true = np.concatenate([amps, centers, np.log(wids)], -1)
y2 = np.array(peaks_model(jnp.asarray(p_true), jnp.asarray(np.tile(t2, (B, 1)))))
y2 += 0.005 * rng.standard_normal(y2.shape).astype(np.float32)
data2 = (jnp.asarray(np.tile(t2, (B, 1))), jnp.asarray(y2))
# start near truth (global peak assignment is a multistart problem, not LM's)
x02 = jnp.asarray(p_true + 0.05 * rng.standard_normal(p_true.shape).astype(np.float32))


def resid_peaks(p, data):
    t, y = data
    return peaks_model(p, t) - y


def run_peaks():
    r = qnm.least_squares(resid_peaks, x02, data=data2, tol=TOL)
    readback(r.x, r.fun.astype(jnp.float32))
    return r


w2 = timed(run_peaks)
r2 = run_peaks()
conv2 = int(jnp.sum(r2.status == qnm.Status.CONVERGED))
it2 = np.asarray(r2.iterations)
print(f"[2] peaks n=9 m=256 B={B}: {w2*1e3:.1f} ms = {B/w2:,.0f} solves/s  "
      f"converged {conv2}/{B}  iters med {np.median(it2):.0f} max {it2.max()}",
      flush=True)

# --- 4. LM vs BFGS on the same objective (shared dataset, varied starts) ---
# optimize_batched shares one objective across lanes (the HMC-init
# pattern), so this section uses ONE curve and B jittered starts.
y_sh = 2.0 * np.exp(-1.3 * t1)
t_sh = jnp.asarray(t1)
y_shj = jnp.asarray(y_sh)
x0_sh = x01 + 0.2 * jnp.asarray(
    rng.standard_normal((B, 2)).astype(np.float32))
data_sh = (jnp.asarray(np.tile(t1, (B, 1))),
           jnp.asarray(np.tile(y_sh, (B, 1))))


def sq_obj(x):
    r = x[0] * jnp.exp(x[1] * t_sh) - y_shj
    return -0.5 * jnp.sum(r * r)  # maximization convention


def run_bfgs():
    res = qnm.optimize_batched(sq_obj, x0_sh, tol=TOL)
    readback(res.x, res.fun.astype(jnp.float32))
    return res


def run_lm_sh():
    r = qnm.least_squares(resid_exp, x0_sh, data=data_sh, tol=TOL)
    readback(r.x, r.fun.astype(jnp.float32))
    return r


w4 = timed(run_bfgs)
w4lm = timed(run_lm_sh)
r4 = run_bfgs()
r4lm = run_lm_sh()
conv4 = int(jnp.sum(r4.status == qnm.Status.CONVERGED))
conv4lm = int(jnp.sum(r4lm.status == qnm.Status.CONVERGED))
it4 = np.asarray(r4.iterations)
it4lm = np.asarray(r4lm.iterations)
print(f"[4] same objective, shared data, {B} jittered starts:\n"
      f"    BFGS  {w4*1e3:.1f} ms = {B/w4:,.0f}/s  conv {conv4}/{B}  "
      f"iters med {np.median(it4):.0f} max {it4.max()}\n"
      f"    LM    {w4lm*1e3:.1f} ms = {B/w4lm:,.0f}/s  conv {conv4lm}/{B}  "
      f"iters med {np.median(it4lm):.0f} max {it4lm.max()}  "
      f"-> LM is {w4/w4lm:.2f}x faster", flush=True)
print("DONE", flush=True)
