"""Round-4 scalar JAX-CPU latency attack — op census + lever measurements.

VERDICT round-3 item 3: the scalar single-solve JAX path runs ~1.6 ms
(~8.3 us/iter x ~190 iters) vs the reference's 330 us. The C++ host
runtime (1.8 us/iter) already beats the reference; this experiment
decomposes the JAX gap and measures the untried levers:

  A. baseline `qnm.optimize` (Rosenbrock n=60, f64, analytic vag)
  B. trivial while-loop floor (same trip count, near-empty body)
  C. update-only loop (bfgs_update per iteration, no line search)
  D. update-only loop, STACKED algebra (one B@[y,g] matmul + one
     (3,n)@(n,4) dot-stack + rank-2 via outer products, direction by
     algebra instead of a second matvec — the batched engine's form)
  E. line-search-only loop (one Armijo round per iteration)
  F. fused batched engine with batch=1 (masked, cond-free driver)
  G. baseline with AD instead of analytic vag

Run with JAX_PLATFORMS forced to cpu INSIDE the script (axon
sitecustomize ignores the env var).
"""

import sys
import time

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np
from jax import lax

import quasinewtonmethods_jl_tpu as qnm
from quasinewtonmethods_jl_tpu.models import (
    rosenbrock_logdensity,
    rosenbrock_value_and_grad,
)
from quasinewtonmethods_jl_tpu.ops.bfgs import bfgs_update, h0_gamma

N = 60
REPS = 30


def log(m):
    print(m, file=sys.stderr, flush=True)


def timeit(fn, *args):
    fn(*args)  # compile
    best = min(
        (time.perf_counter(), fn(*args), time.perf_counter())[2] - t0
        for t0 in [time.perf_counter()]
        for _ in [fn(*args)]
    )
    walls = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        fn(*args)
        walls.append(time.perf_counter() - t0)
    return min(walls)


def main():
    rng = np.random.default_rng(42)
    x0 = jnp.asarray(rng.standard_normal(N))

    # --- A. baseline ---
    def run_base():
        r = qnm.optimize(
            rosenbrock_logdensity, x0,
            value_and_grad_fn=rosenbrock_value_and_grad,
        )
        jax.block_until_ready(r.x)
        return r

    r = run_base()
    iters = int(r.iterations)
    nfev = int(r.n_fev)
    wall_a = timeit(run_base)
    log(f"A baseline: {wall_a * 1e6:.0f} us, {iters} iters, {nfev} fev -> "
        f"{wall_a / iters * 1e6:.2f} us/iter")

    # --- G. AD gradient ---
    def run_ad():
        r = qnm.optimize(rosenbrock_logdensity, x0)
        jax.block_until_ready(r.x)
        return r

    wall_g = timeit(run_ad)
    log(f"G AD vag:   {wall_g * 1e6:.0f} us "
        f"({int(run_ad().iterations)} iters)")

    # --- B. trivial while loop, same trip count ---
    @jax.jit
    def trivial(x):
        def body(c):
            k, v = c
            return k + 1, v * 0.999999 + 1e-9

        k, v = lax.while_loop(lambda c: c[0] < iters, body, (0, x[0]))
        return v

    wall_b = timeit(lambda: jax.block_until_ready(trivial(x0)))
    log(f"B trivial loop x{iters}: {wall_b * 1e6:.0f} us -> "
        f"{wall_b / iters * 1e6:.3f} us/iter")

    # --- C. update-only loop (current algebra) ---
    g0 = jnp.asarray(rng.standard_normal(N))
    s0 = jnp.asarray(rng.standard_normal(N)) * 0.01

    @jax.jit
    def upd_loop(g, s):
        B0 = jnp.eye(N)

        def body(c):
            k, B, s, gold = c
            g = gold * 0.9 + s  # synthetic fresh gradient, cheap
            B1, d, m = bfgs_update(B, s, g, gold, fresh=None)
            return k + 1, B1, d * 1e-3, g

        k, B, s_, g_ = lax.while_loop(
            lambda c: c[0] < iters, body, (0, B0, s, g)
        )
        return B[0, 0] + s_[0] + g_[0]

    wall_c = timeit(lambda: jax.block_until_ready(upd_loop(g0, s0)))
    log(f"C update loop: {wall_c * 1e6:.0f} us -> "
        f"{wall_c / iters * 1e6:.2f} us/iter")

    # --- D. stacked-algebra update loop ---
    def bfgs_update_stacked(B, s, g, gold):
        dtype = B.dtype
        y = gold - g
        BYG = B @ jnp.stack([y, g], axis=1)  # (n, 2): By, Bg
        By, Bg = BYG[:, 0], BYG[:, 1]
        L = jnp.stack([s, y, g], axis=0)  # (3, n)
        R = jnp.stack([y, By, Bg], axis=1)  # (n, 3)
        D = L @ R  # (3,3): rows s,y,g x cols y,By,Bg
        sty = D[0, 0]
        ytBy = D[1, 1]
        w = D[2, 0]  # g.y? careful: need s.g -> use D[0,?]
        # dots needed: sty=s.y D[0,0]; ytBy=y.By D[1,1]; w=s.g; v=By.g;
        # gBg=g.Bg. s.g is not in D; rebuild R to include g? use D from
        # L=[s,y,g], R=[y,By,Bg]: s.g missing. Add g to R instead of y:
        # R=[g,By,Bg] gives s.g=D[0,0]? then sty missing. Use R=(n,4).
        R = jnp.stack([y, g, By, Bg], axis=1)  # (n, 4)
        D = L @ R  # (3,4)
        sty = D[0, 0]
        w = D[0, 1]
        ytBy = D[1, 2]
        v0 = D[2, 2]  # g.By
        gBg = D[2, 3]
        rho = 1.0 / sty
        u = By * rho
        c1 = (1.0 + ytBy * rho) * rho
        v = v0 * rho
        m = gBg + c1 * w * w - 2.0 * w * v
        d = Bg + (c1 * w) * s - w * u - v * s
        B_new = (
            B + c1 * jnp.outer(s, s) - jnp.outer(u, s) - jnp.outer(s, u)
        )
        return B_new, d, m

    @jax.jit
    def upd_loop_stacked(g, s):
        B0 = jnp.eye(N)

        def body(c):
            k, B, s, gold = c
            g = gold * 0.9 + s
            B1, d, m = bfgs_update_stacked(B, s, g, gold)
            return k + 1, B1, d * 1e-3, g

        k, B, s_, g_ = lax.while_loop(
            lambda c: c[0] < iters, body, (0, B0, s, g)
        )
        return B[0, 0] + s_[0] + g_[0]

    wall_d = timeit(lambda: jax.block_until_ready(upd_loop_stacked(g0, s0)))
    log(f"D stacked update loop: {wall_d * 1e6:.0f} us -> "
        f"{wall_d / iters * 1e6:.2f} us/iter")

    # numerics cross-check
    B0 = jnp.eye(N)
    a1 = bfgs_update(B0, s0, g0 * 0.9, g0, fresh=None)
    a2 = bfgs_update_stacked(B0, s0, g0 * 0.9, g0)
    for x, z in zip(a1, a2):
        np.testing.assert_allclose(np.asarray(x), np.asarray(z), rtol=1e-12)
    log("  stacked update numerics match")

    # --- E. line-search-only loop ---
    from quasinewtonmethods_jl_tpu.ops.linesearch import (
        BackTracking, backtracking_linesearch,
    )

    @jax.jit
    def ls_loop(x):
        d = jnp.ones(N) * 0.01

        def phi(alpha):
            return rosenbrock_logdensity(x + alpha * d)

        f0 = rosenbrock_logdensity(x)
        m = jnp.asarray(1e-4)

        def body(c):
            k, acc = c
            r = backtracking_linesearch(phi, f0, m, BackTracking())
            return k + 1, acc + r.alpha

        k, acc = lax.while_loop(lambda c: c[0] < iters, body, (0, 0.0))
        return acc

    wall_e = timeit(lambda: jax.block_until_ready(ls_loop(x0)))
    log(f"E linesearch loop: {wall_e * 1e6:.0f} us -> "
        f"{wall_e / iters * 1e6:.2f} us/iter")

    # --- F. fused batched engine, batch=1 ---
    def run_f():
        r = qnm.optimize_batched_fused(
            rosenbrock_logdensity, x0[None, :], kernel="xla",
            value_and_grad_fn=rosenbrock_value_and_grad,
        )
        jax.block_until_ready(r.x)
        return r

    wall_f = timeit(run_f)
    log(f"F fused batch=1: {wall_f * 1e6:.0f} us "
        f"({int(run_f().iterations[0])} iters)")

    log("---- summary (us) ----")
    for k, v in [("A baseline", wall_a), ("B floor", wall_b),
                 ("C update", wall_c), ("D stacked", wall_d),
                 ("E linesearch", wall_e), ("F fused b=1", wall_f),
                 ("G AD", wall_g)]:
        log(f"{k}: {v * 1e6:.0f}")


if __name__ == "__main__":
    main()
