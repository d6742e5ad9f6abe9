"""Round-4: logistic m=128,n=60 resident VMEM hypothesis.

r4c left one failure: resident logistic at m=128 (data rows), n=60 —
every other (m, n) runs. Hypothesis: the hoisted A (m, n) + per-lane
z-intermediates push the whole-solve kernel over VMEM at
block_batch=128. Sweep block_batch DOWN (Mosaic needs the lane-minor
block to be a multiple of 128, so only block_batch=128 is legal for the
fused update — but the resident kernel's batch tiling may still admit
smaller grids via more blocks) and m UP at fixed block to separate
"A + intermediates scale with m" from "n=60 tile pressure".

CLAUDE.md tracing-cache hazard: clear_caches() between attempts so a
poisoned trace never masks a later success.
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np

import quasinewtonmethods_jl_tpu as qnm


def log(m):
    print(m, file=sys.stderr, flush=True)


def make_logistic(rng, m, n):
    A = jnp.asarray(rng.standard_normal((m, n)) / np.sqrt(n), jnp.float32)
    yv = jnp.asarray((rng.random(m) < 0.5).astype(np.float32))

    def logistic(w):
        z = A @ w
        return jnp.sum(yv * z - jnp.logaddexp(0.0, z)) - 0.5 * jnp.sum(w * w)

    return logistic


def probe(name, obj, n, block_batch):
    rng = np.random.default_rng(1)
    X0 = jnp.asarray(rng.standard_normal((256, n)) * 0.1, jnp.float32)
    try:
        res = qnm.optimize_batched_resident(
            obj, X0, tol=1e-3, max_iterations=500, block_batch=block_batch)
        conv = int(jnp.sum(res.status == int(qnm.Status.CONVERGED)))
        log(f"resident {name} bb={block_batch}: OK conv {conv}/256")
        return True
    except Exception as e:  # noqa: BLE001
        log(f"resident {name} bb={block_batch}: FAIL "
            f"{type(e).__name__}: {str(e)[:160]}")
        return False
    finally:
        jax.clear_caches()


def make_quad(rng, n):
    A = rng.standard_normal((n, n))
    Q = jnp.asarray(A @ A.T / n + np.eye(n), jnp.float32)

    def quad(x):
        return -0.5 * x @ (Q @ x)

    return quad


def main():
    log(f"device: {jax.devices()[0]}")
    rng = np.random.default_rng(0)

    # after the selective rewrite (2D dots stay native MXU dots): the
    # m sweep at n=60 plus the n=60/n=95 quadratics that used to crash
    for m in [96, 128, 256, 512]:
        probe(f"logistic m={m} n=60", make_logistic(rng, m, 60), 60, 128)
    for n in [60, 95]:
        probe(f"quad n={n}", make_quad(rng, n), n, 128)


if __name__ == "__main__":
    main()
