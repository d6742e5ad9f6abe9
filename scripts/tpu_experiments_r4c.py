"""Round-4: bisect the logistic-MAP resident crash (quad now works).

Sweep data rows m and n for the logistic objective through the resident
engine on chip; also probe the rewritten logistic vag standalone in one
pallas_call (probe-G style) to separate objective-lowering failures from
whole-kernel VMEM pressure.
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import quasinewtonmethods_jl_tpu as qnm
from quasinewtonmethods_jl_tpu.api import as_value_and_grad
from quasinewtonmethods_jl_tpu.resident_solve import _hoist_consts

GB = 128


def log(m):
    print(m, file=sys.stderr, flush=True)


def make_logistic(rng, m, n):
    A = jnp.asarray(rng.standard_normal((m, n)) / np.sqrt(n), jnp.float32)
    yv = jnp.asarray((rng.random(m) < 0.5).astype(np.float32))

    def logistic(w):
        z = A @ w
        return jnp.sum(yv * z - jnp.logaddexp(0.0, z)) - 0.5 * jnp.sum(w * w)

    return logistic


def probe_vag_standalone(name, obj, n):
    vag = as_value_and_grad(obj, None)

    def vag_b(X):
        fv, gv = jax.vmap(vag, in_axes=1, out_axes=(0, 1))(X)
        return fv[None, :], gv

    x_ex = jax.ShapeDtypeStruct((n, GB), jnp.float32)
    vag_cc, consts = _hoist_consts(vag_b, x_ex, True)
    const_shapes = [jnp.shape(c) for c in consts]

    def kern(x_ref, *rest):
        cr, (f_out, g_out) = rest[: len(consts)], rest[len(consts):]
        cs = [r[:].reshape(s) for r, s in zip(cr, const_shapes)]
        fv, gv = vag_cc(x_ref[:], *cs)
        f_out[:] = fv
        g_out[:] = gv

    specs = [pl.BlockSpec((n, GB), lambda i: (0, 0), memory_space=pltpu.VMEM)]
    for c in consts:
        specs.append(
            pl.BlockSpec(jnp.shape(c), (lambda i, _nd=jnp.ndim(c): (0,) * _nd),
                         memory_space=pltpu.VMEM))
    try:
        out = pl.pallas_call(
            kern,
            grid=(1,),
            in_specs=specs,
            out_specs=[
                pl.BlockSpec((1, GB), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((n, GB), lambda i: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((1, GB), jnp.float32),
                jax.ShapeDtypeStruct((n, GB), jnp.float32),
            ],
        )(jnp.ones((n, GB), jnp.float32), *consts)
        jax.block_until_ready(out)
        want = jax.jit(vag_b)(jnp.ones((n, GB), jnp.float32))
        np.testing.assert_allclose(np.asarray(out[0]), np.asarray(want[0]),
                                   rtol=3e-5, atol=3e-5)
        np.testing.assert_allclose(np.asarray(out[1]), np.asarray(want[1]),
                                   rtol=3e-5, atol=3e-5)
        log(f"standalone {name}: OK (numerics match)")
        return True
    except Exception as e:  # noqa: BLE001
        log(f"standalone {name}: FAIL {type(e).__name__}: {str(e)[:160]}")
        return False


def probe_resident(name, obj, n):
    rng = np.random.default_rng(1)
    X0 = jnp.asarray(rng.standard_normal((256, n)) * 0.1, jnp.float32)
    try:
        res = qnm.optimize_batched_resident(
            obj, X0, tol=1e-3, max_iterations=500, block_batch=128)
        conv = int(jnp.sum(res.status == int(qnm.Status.CONVERGED)))
        log(f"resident {name}: OK conv {conv}/256")
        return True
    except Exception as e:  # noqa: BLE001
        log(f"resident {name}: FAIL {type(e).__name__}: {str(e)[:160]}")
        return False


def main():
    log(f"device: {jax.devices()[0]}")
    rng = np.random.default_rng(0)

    # standalone vag probes first (fast to compile)
    for m, n in [(128, 60), (64, 60), (128, 32)]:
        probe_vag_standalone(f"logistic m={m} n={n}", make_logistic(rng, m, n), n)

    # resident probes, smallest first
    for m, n in [(32, 16), (64, 32), (64, 60), (128, 60)]:
        probe_resident(f"logistic m={m} n={n}", make_logistic(rng, m, n), n)


if __name__ == "__main__":
    main()
