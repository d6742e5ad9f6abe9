"""Probe: can Mosaic lower PLAIN 2D dot_generals (no batch dims) inside
our resident-style pallas_call?  The round-3 blocker note says "batched
dots"; the vmapped logistic's two dots are in fact canonical 2D matmuls
(m,n)@(n,gb) — if those lower natively we should NOT rewrite them
(MXU >> VPU mul+reduce, and no (m,n,gb) temporary).

Also probe the rewrite's CHUNKED mul+reduce path standalone (suspect for
the r4d all-m failure: 60-long contraction chunked into 8-slices leaves
a 4-row tail — Mosaic wants second-minor multiples of 8).
"""

import functools
import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

M, N, GB = 128, 60, 128


def log(m):
    print(m, file=sys.stderr, flush=True)


def probe(name, fn, extra_inputs=()):
    def kern(x_ref, *rest):
        in_refs, o_ref = rest[:-1], rest[-1]
        o_ref[:] = fn(x_ref[:], *[r[:] for r in in_refs])

    specs = [pl.BlockSpec((N, GB), lambda i: (0, 0), memory_space=pltpu.VMEM)]
    for e in extra_inputs:
        specs.append(pl.BlockSpec(e.shape, lambda i, _nd=e.ndim: (0,) * _nd,
                                  memory_space=pltpu.VMEM))
    try:
        X = jnp.linspace(-2, 2, N * GB, dtype=jnp.float32).reshape(N, GB)
        out = pl.pallas_call(
            kern,
            grid=(1,),
            in_specs=specs,
            out_specs=pl.BlockSpec((M, GB), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((M, GB), jnp.float32),
        )(X, *extra_inputs)
        jax.block_until_ready(out)
        want = fn(X, *extra_inputs)
        err = float(jnp.max(jnp.abs(out - want)))
        log(f"OK   {name} maxerr={err:.2e}")
        return True
    except Exception as e:  # noqa: BLE001
        log(f"FAIL {name}: {type(e).__name__}: {str(e)[:140]}")
        return False
    finally:
        jax.clear_caches()


def main():
    log(f"device: {jax.devices()[0]}")
    rng = np.random.default_rng(0)
    A = jnp.asarray(rng.standard_normal((M, N)) / np.sqrt(N), jnp.float32)

    # 1. canonical 2D matmul, f32 highest precision
    probe("dot2d_canonical",
          lambda X, A: jax.lax.dot_general(
              A, X, (((1,), (0,)), ((), ())),
              precision=jax.lax.Precision.HIGHEST), (A,))
    # 2. jnp.matmul spelling
    probe("matmul", lambda X, A: A @ X, (A,))
    # 3. second shape: (gb, m') = X.T @ A.T style — the vjp's dot
    At = A.T  # (N, M)

    def vjp_style(X, At):
        # (gb, n)·(n, m) -> (gb, m): transpose-heavy variant
        r = jax.lax.dot_general(X.T, At, (((1,), (0,)), ((), ())),
                                precision=jax.lax.Precision.HIGHEST)
        return r.T[:M]  # (m, gb)

    probe("dot2d_vjp_style", vjp_style, (At,))

    # 4. the chunked mul+reduce path exactly as dot_rewrite emits it
    from quasinewtonmethods_jl_tpu.ops.dot_rewrite import dot_general_as_mulsum
    probe("mulsum_chunked",
          lambda X, A: dot_general_as_mulsum(
              A, X, (((1,), (0,)), ((), ()))), (A,))

    # 5. unchunked mul+reduce at the same shape (temp 60*128*128 = 3.8MB)
    import quasinewtonmethods_jl_tpu.ops.dot_rewrite as dr
    orig = dr._TEMP_ELEMS_BUDGET
    dr._TEMP_ELEMS_BUDGET = 1 << 30
    probe("mulsum_unchunked",
          lambda X, A: dot_general_as_mulsum(
              A, X, (((1,), (0,)), ((), ()))), (A,))
    dr._TEMP_ELEMS_BUDGET = orig


if __name__ == "__main__":
    main()
