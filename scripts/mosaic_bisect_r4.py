"""Bisect the Mosaic compile-helper crash for dot-rewritten objectives.

Round-4: the dot_general -> mul+reduce rewrite still crashes the compile
helper (HTTP 500, <2s) on the quadratic/logistic resident kernels. The
round-3 playbook: rebuild the kernel with feature toggles until the
offending op class is found. Each probe is a minimal pallas_call with one
candidate op pattern at the resident kernel's shapes.
"""

import sys

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N, GB = 60, 128


def log(m):
    print(m, file=sys.stderr, flush=True)


def probe(name, kernel, in_shapes, out_shape):
    specs = [pl.BlockSpec(s, lambda *_: (0,) * len(s), memory_space=pltpu.VMEM)
             for s in in_shapes]
    outspec = pl.BlockSpec(out_shape, lambda *_: (0,) * len(out_shape),
                           memory_space=pltpu.VMEM)
    args = [jnp.ones(s, jnp.float32) for s in in_shapes]
    try:
        fn = pl.pallas_call(
            kernel,
            grid=(1,),
            in_specs=specs,
            out_specs=outspec,
            out_shape=jax.ShapeDtypeStruct(out_shape, jnp.float32),
        )
        r = jax.jit(fn)(*args)
        r.block_until_ready()
        log(f"OK   {name}")
        return True
    except Exception as e:  # noqa: BLE001
        log(f"FAIL {name}: {type(e).__name__}: {str(e)[:160]}")
        return False


def main():
    log(f"device: {jax.devices()[0]}")

    # warm the tunnel with a trivial kernel
    def triv(x_ref, o_ref):
        o_ref[:] = x_ref[:] * 2.0

    probe("trivial", triv, [(N, GB)], (N, GB))

    # A. 2D transpose (128, 60) -> (60, 128)
    def tr2d(x_ref, o_ref):
        o_ref[:] = jnp.transpose(x_ref[:], (1, 0))

    probe("transpose2d", tr2d, [(GB, N)], (N, GB))

    # B. 3D broadcast-multiply + reduce over LEADING axis:
    #    (n,gb)x(n,n): lhs[:, :, None] * rhs[:, None, :] sum axis 0
    def mulsum_lead(x_ref, q_ref, o_ref):
        x = x_ref[:]
        q = q_ref[:]
        o_ref[:] = jnp.sum(x[:, :, None] * q[:, None, :], axis=0)

    probe("mulsum_leading_contract", mulsum_lead, [(N, GB), (N, N)], (GB, N))

    # C. same but contract-last layout: (gb,n)x(n,n) -> expand to
    #    (gb, n_out, n_c), sum axis 2
    def mulsum_trail(x_ref, q_ref, o_ref):
        x = x_ref[:]  # (gb, n)
        q = q_ref[:]  # (n_out, n_c) pre-transposed outside
        o_ref[:] = jnp.sum(x[:, None, :] * q[None, :, :], axis=2)

    probe("mulsum_trailing_contract", mulsum_trail, [(GB, N), (N, N)], (GB, N))

    # D. expand_dims forms exactly as dot_rewrite emits them
    def mulsum_expand(x_ref, q_ref, o_ref):
        x = jnp.expand_dims(x_ref[:], (2,))     # (n, gb, 1)
        q = jnp.expand_dims(q_ref[:], (1,))     # (n, 1, n)
        o_ref[:] = jnp.sum(x * q, axis=(0,))

    probe("mulsum_expand_dims", mulsum_expand, [(N, GB), (N, N)], (GB, N))

    # E. batched per-lane dot with batch dims:
    #    (gb,n) x (n,gb) batch-matched -> (gb,)  [the e: eqn in quad vag]
    def perlane(x_ref, y_ref, o_ref):
        x = x_ref[:]  # (gb, n)
        y = y_ref[:]  # (n, gb)
        o_ref[:] = jnp.sum(x * jnp.transpose(y, (1, 0)), axis=1)[None, :]

    probe("perlane_dot_via_transpose", perlane, [(GB, N), (N, GB)], (1, GB))

    # F. scalar broadcast "dot" (dims (( ),( )),(( ),( ))): 1.0 * array
    def scal(x_ref, o_ref):
        o_ref[:] = jnp.float32(1.0) * x_ref[:]

    probe("scalar_mul", scal, [(GB, N)], (GB, N))

    # G. the FULL rewritten quadratic vag_b, hoisted, inside one kernel
    import numpy as np

    from quasinewtonmethods_jl_tpu.api import as_value_and_grad
    from quasinewtonmethods_jl_tpu.resident_solve import _hoist_consts

    rng = np.random.default_rng(0)
    Q = jnp.asarray(rng.standard_normal((N, N)), jnp.float32)
    Q = Q @ Q.T + N * jnp.eye(N, dtype=jnp.float32)

    def quad(x):
        return -0.5 * x @ (Q @ x)

    vag = as_value_and_grad(quad, None)

    def vag_b(X):
        fv, gv = jax.vmap(vag, in_axes=1, out_axes=(0, 1))(X)
        return fv[None, :], gv

    x_ex = jax.ShapeDtypeStruct((N, GB), jnp.float32)
    vag_cc, consts = _hoist_consts(vag_b, x_ex, True)
    const_shapes = [jnp.shape(c) for c in consts]

    def full_vag_kernel(x_ref, *rest):
        cr, (f_out, g_out) = rest[:len(consts)], rest[len(consts):]
        cs = [r[:].reshape(s) for r, s in zip(cr, const_shapes)]
        fv, gv = vag_cc(x_ref[:], *cs)
        f_out[:] = fv
        g_out[:] = gv

    specs = [pl.BlockSpec((N, GB), lambda i: (0, 0), memory_space=pltpu.VMEM)]
    for c in consts:
        specs.append(pl.BlockSpec(
            jnp.shape(c), (lambda i, _nd=jnp.ndim(c): (0,) * _nd),
            memory_space=pltpu.VMEM))
    try:
        out = pl.pallas_call(
            full_vag_kernel,
            grid=(1,),
            in_specs=specs,
            out_specs=[
                pl.BlockSpec((1, GB), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((N, GB), lambda i: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((1, GB), jnp.float32),
                jax.ShapeDtypeStruct((N, GB), jnp.float32),
            ],
        )(jnp.ones((N, GB), jnp.float32), *consts)
        jax.block_until_ready(out)
        # numeric check vs XLA
        want = vag_b(jnp.ones((N, GB), jnp.float32))
        import numpy as np
        np.testing.assert_allclose(np.asarray(out[0]), np.asarray(want[0]), rtol=2e-5)
        np.testing.assert_allclose(np.asarray(out[1]), np.asarray(want[1]), rtol=2e-5)
        log("OK   full_rewritten_quad_vag (numerics match XLA)")
    except Exception as e:  # noqa: BLE001
        log(f"FAIL full_rewritten_quad_vag: {type(e).__name__}: {str(e)[:200]}")


if __name__ == "__main__":
    main()
