"""Bisect which op in the logistic objective's vag kills the Mosaic
compile helper (fails standalone at every size — not VMEM).

Suspects: jnp.logaddexp (log1p? the scalar-0.0 broadcast? the vjp's
exp-of-difference), following the round-3 lesson that scalar-Python
branches in `where` crash the helper.
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

M, GB = 64, 128


def log(m):
    print(m, file=sys.stderr, flush=True)


def probe(name, fn):
    def kern(x_ref, o_ref):
        o_ref[:] = fn(x_ref[:])

    try:
        out = pl.pallas_call(
            kern,
            grid=(1,),
            in_specs=[pl.BlockSpec((M, GB), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((M, GB), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((M, GB), jnp.float32),
        )(jnp.linspace(-3, 3, M * GB, dtype=jnp.float32).reshape(M, GB))
        jax.block_until_ready(out)
        log(f"OK   {name}")
        return True
    except Exception as e:  # noqa: BLE001
        log(f"FAIL {name}: {type(e).__name__}: {str(e)[:120]}")
        return False


def main():
    log(f"device: {jax.devices()[0]}")
    probe("exp", jnp.exp)
    probe("log1p", jnp.log1p)
    probe("logaddexp_scalar", lambda z: jnp.logaddexp(0.0, z))
    probe("logaddexp_array", lambda z: jnp.logaddexp(z * 0.5, z))
    probe("softplus_manual",
          lambda z: jnp.maximum(z, 0.0) + jnp.log1p(jnp.exp(-jnp.abs(z))))
    probe("sigmoid", jax.nn.sigmoid)
    probe("logaddexp_grad",
          lambda z: jax.vmap(jax.grad(lambda t: jnp.sum(
              jnp.logaddexp(0.0, t))))(z))
    # the exact per-lane value+grad of sum(logaddexp(0,z)) as vmapped vag
    def obj(z):
        return jnp.sum(jnp.logaddexp(0.0, z))

    def vag_lanes(Z):
        fv, gv = jax.vmap(jax.value_and_grad(obj), in_axes=1,
                          out_axes=(0, 1))(Z)
        return gv + fv[None, :]

    probe("vag_logaddexp_lanes", vag_lanes)


if __name__ == "__main__":
    main()
