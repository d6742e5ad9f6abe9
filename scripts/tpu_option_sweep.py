import sys
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np
import quasinewtonmethods_jl_tpu as qnm
from quasinewtonmethods_jl_tpu.batched_solve import optimize_batched_compacted, optimize_batched_fused
from quasinewtonmethods_jl_tpu.lbfgs_batched_solve import optimize_lbfgs_batched_fused
from quasinewtonmethods_jl_tpu.models import rosenbrock_logdensity
rng = np.random.default_rng(7)
X = jnp.asarray(rng.standard_normal((512, 60)), jnp.float32)
Xl = jnp.asarray(rng.standard_normal((256, 256)), jnp.float32)
cases = {
    "fused wolfe": lambda: optimize_batched_fused(rosenbrock_logdensity, X, ls=qnm.Wolfe(), tol=1e-3, kernel="pallas"),
    "fused wolfe+fold": lambda: optimize_batched_fused(rosenbrock_logdensity, X, ls=qnm.Wolfe(), tol=1e-3, kernel="pallas", fold_eval=True),
    "fused fold+unroll4": lambda: optimize_batched_fused(rosenbrock_logdensity, X, tol=1e-3, kernel="pallas", fold_eval=True, unroll=4),
    "compacted pallas": lambda: optimize_batched_compacted(rosenbrock_logdensity, X, tol=1e-3, kernel="pallas", chunk=64),
    "lbfgs circ default-prec": lambda: optimize_lbfgs_batched_fused(rosenbrock_logdensity, Xl, history=10, tol=1e-3),
    "lbfgs circ HIGHEST": lambda: optimize_lbfgs_batched_fused(rosenbrock_logdensity, Xl, history=10, tol=1e-3, gram_precision=jax.lax.Precision.HIGHEST),
    "lbfgs wolfe": lambda: optimize_lbfgs_batched_fused(rosenbrock_logdensity, Xl, history=10, tol=1e-3, ls=qnm.Wolfe()),
    "order3 pallas": lambda: optimize_batched_fused(rosenbrock_logdensity, X, tol=1e-3, kernel="pallas", ls=qnm.BackTracking(order=3)),
}
for name, fn in cases.items():
    try:
        out = fn()
        b = out.status.shape[0]
        conv = int(jnp.sum(out.status == qnm.Status.CONVERGED))
        ok = bool(jnp.all(jnp.isfinite(out.x)))
        print(f"{name}: conv {conv}/{b} finite {ok}", flush=True)
    except Exception as e:
        print(f"{name}: FAIL {type(e).__name__}: {str(e)[:150]}", flush=True)
print("sweep done", flush=True)
