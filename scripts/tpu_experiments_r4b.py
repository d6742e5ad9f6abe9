"""Round-4 continuation: resident engine + dot-rewritten matvec objective
on the REAL chip, swept over n, to test the VMEM-capacity hypothesis.

Prior bisection (scripts/mosaic_bisect_r4.py) showed every individual op
pattern AND the full rewritten quad vag kernel lower fine standalone;
the crash only appears for the full resident solve kernel. If small n
works and the crash appears above some n*, it's capacity (the rewritten
quad adds an (n, n, gb) broadcast temporary on top of the (n, n, gb) B
tile and the line-search temporaries); if even n=8 crashes, it's a
context interaction (objective inside the while loops).
"""

import sys
import traceback

import jax
import jax.numpy as jnp
import numpy as np

import quasinewtonmethods_jl_tpu as qnm


def log(m):
    print(m, file=sys.stderr, flush=True)


def main():
    log(f"device: {jax.devices()[0]}")
    rng = np.random.default_rng(0)
    for n in (8, 16, 32, 48, 60):
        Q = rng.standard_normal((n, n))
        Q = jnp.asarray(Q @ Q.T + n * np.eye(n), jnp.float32)

        def quad(x, Q=Q):
            return -0.5 * x @ (Q @ x)

        X0 = jnp.asarray(rng.standard_normal((256, n)), jnp.float32)
        try:
            res = qnm.optimize_batched_resident(
                quad, X0, tol=1e-3, max_iterations=500, block_batch=128,
            )
            conv = int(jnp.sum(res.status == int(qnm.Status.CONVERGED)))
            log(f"n={n:3d} OK   conv {conv}/256 iters_max {int(jnp.max(res.iterations))}")
        except Exception as e:  # noqa: BLE001
            log(f"n={n:3d} FAIL {type(e).__name__}: {str(e)[:200]}")
            if "--trace" in sys.argv:
                traceback.print_exc()


if __name__ == "__main__":
    main()
