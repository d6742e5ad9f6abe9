"""Constrained-parameter transforms: bijection correctness, exact
log-Jacobians vs autodiff, analytic-gradient pullback, and end-to-end
MAP/sampling through the engines.

The reference delegates constraints to ProbabilityModels.jl-generated
callbacks (reference src/QuasiNewtonMethods.jl:8-9 is the protocol;
README.md:14 the use case); here the transforms are first-class and these
tests pin the math the generated callbacks would embed."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import quasinewtonmethods_jl_tpu as qnm
from quasinewtonmethods_jl_tpu import transforms as tfm


SQUARE_TRANSFORMS = [
    tfm.Identity(5),
    tfm.Positive(4),
    tfm.Positive(3, lo=-2.0),
    tfm.Interval(4, lo=-1.0, hi=3.0),
    tfm.Ordered(5),
]
ALL_TRANSFORMS = SQUARE_TRANSFORMS + [
    tfm.Simplex(4),
    tfm.BlockTransform(
        [tfm.Identity(2), tfm.Positive(2), tfm.Simplex(3), tfm.Interval(1)]
    ),
]


def _ids(ts):
    return [type(t).__name__ + str(i) for i, t in enumerate(ts)]


@pytest.mark.parametrize("t", ALL_TRANSFORMS, ids=_ids(ALL_TRANSFORMS))
def test_roundtrip(t):
    z = jax.random.normal(jax.random.key(0), (t.unconstrained_size,))
    x = t.forward(z)
    assert x.shape == (t.constrained_size,)
    np.testing.assert_allclose(t.inverse(x), z, rtol=1e-10, atol=1e-12)


@pytest.mark.parametrize("t", ALL_TRANSFORMS, ids=_ids(ALL_TRANSFORMS))
def test_forward_in_constraint_set(t):
    z = 3.0 * jax.random.normal(jax.random.key(1), (t.unconstrained_size,))
    x = np.asarray(t.forward(z))
    if isinstance(t, tfm.Positive):
        assert (x > t.lo).all()
    elif isinstance(t, tfm.Interval):
        assert (x > t.lo).all() and (x < t.hi).all()
    elif isinstance(t, tfm.Ordered):
        assert (np.diff(x) > 0).all()
    elif isinstance(t, tfm.Simplex):
        assert (x > 0).all()
        np.testing.assert_allclose(x.sum(), 1.0, rtol=1e-12)


@pytest.mark.parametrize("t", SQUARE_TRANSFORMS, ids=_ids(SQUARE_TRANSFORMS))
def test_log_det_matches_autodiff(t):
    z = jax.random.normal(jax.random.key(2), (t.unconstrained_size,))
    J = jax.jacfwd(t.forward)(z)
    _, ref = jnp.linalg.slogdet(J)
    np.testing.assert_allclose(t.log_det_jacobian(z), ref, rtol=1e-9)


def test_simplex_log_det_matches_autodiff():
    # the simplex Jacobian is the (K-1)x(K-1) map onto the free coordinates
    t = tfm.Simplex(5)
    z = jax.random.normal(jax.random.key(3), (4,))
    J = jax.jacfwd(lambda z_: t.forward(z_)[:-1])(z)
    _, ref = jnp.linalg.slogdet(J)
    np.testing.assert_allclose(t.log_det_jacobian(z), ref, rtol=1e-9)


def test_simplex_zero_maps_to_uniform():
    t = tfm.Simplex(6)
    np.testing.assert_allclose(
        t.forward(jnp.zeros(5)), jnp.full(6, 1.0 / 6.0), rtol=1e-12
    )


def test_block_transform_is_the_sum_of_parts():
    blocks = [tfm.Positive(2), tfm.Simplex(3), tfm.Interval(2, lo=0.0, hi=2.0)]
    t = tfm.BlockTransform(blocks)
    assert t.unconstrained_size == 2 + 2 + 2
    assert t.constrained_size == 2 + 3 + 2
    z = jax.random.normal(jax.random.key(4), (t.unconstrained_size,))
    x, ld = t.forward_and_log_det(z)
    parts, lds, off = [], [], 0
    for b in blocks:
        xb, lb = b.forward_and_log_det(z[off : off + b.unconstrained_size])
        parts.append(xb)
        lds.append(lb)
        off += b.unconstrained_size
    np.testing.assert_allclose(x, jnp.concatenate(parts), rtol=1e-12)
    np.testing.assert_allclose(ld, sum(lds), rtol=1e-12)


def test_transforms_jit_and_vmap():
    t = tfm.BlockTransform([tfm.Positive(2), tfm.Simplex(3)])
    zs = jax.random.normal(jax.random.key(5), (7, t.unconstrained_size))
    batched = jax.jit(jax.vmap(t.forward))(zs)
    looped = jnp.stack([t.forward(z) for z in zs])
    np.testing.assert_allclose(batched, looped, rtol=1e-12)


def test_forward_draws_shapes():
    t = tfm.Simplex(4)
    z = jax.random.normal(jax.random.key(6), (5, 8, 3))
    x = tfm.forward_draws(t, z)
    assert x.shape == (5, 8, 4)
    np.testing.assert_allclose(x[2, 3], t.forward(z[2, 3]), rtol=1e-12)


def test_dtype_preserved_f32():
    t = tfm.BlockTransform([tfm.Positive(2), tfm.Simplex(3), tfm.Interval(1)])
    z = jnp.zeros(t.unconstrained_size, jnp.float32)
    x, ld = t.forward_and_log_det(z)
    assert x.dtype == jnp.float32 and ld.dtype == jnp.float32
    assert t.inverse(x.astype(jnp.float32)).dtype == jnp.float32


# ---------------------------------------------------------------------------
# Cholesky-factor transforms (LKJ / covariance)


CHOL_TRANSFORMS = [tfm.CorrCholesky(2), tfm.CorrCholesky(4), tfm.CovCholesky(3)]


@pytest.mark.parametrize("t", CHOL_TRANSFORMS, ids=_ids(CHOL_TRANSFORMS))
def test_cholesky_roundtrip(t):
    z = jax.random.normal(jax.random.key(20), (t.unconstrained_size,))
    x = t.forward(z)
    assert x.shape == (t.constrained_size,)
    np.testing.assert_allclose(t.inverse(x), z, rtol=1e-9, atol=1e-12)


def test_corr_cholesky_is_a_correlation_factor():
    t = tfm.CorrCholesky(5)
    z = 2.0 * jax.random.normal(jax.random.key(21), (t.unconstrained_size,))
    L = tfm.unpack_cholesky(t.forward(z), 5)
    R = L @ L.T
    np.testing.assert_allclose(np.diag(np.asarray(R)), 1.0, rtol=1e-12)
    assert (np.linalg.eigvalsh(np.asarray(R)) > 0).all()
    # L is lower triangular with positive diagonal
    assert np.allclose(np.triu(np.asarray(L), 1), 0.0)
    assert (np.diag(np.asarray(L)) > 0).all()


def test_corr_cholesky_zero_maps_to_identity():
    t = tfm.CorrCholesky(4)
    L = tfm.unpack_cholesky(t.forward(jnp.zeros(6)), 4)
    np.testing.assert_allclose(L, jnp.eye(4), atol=1e-12)


@pytest.mark.parametrize("dim", [2, 3, 5])
def test_corr_cholesky_log_det_matches_autodiff(dim):
    # free output coordinates = the strict lower triangle of L
    t = tfm.CorrCholesky(dim)
    rows, cols = jnp.tril_indices(dim, k=-1)

    def free_coords(z):
        return tfm.unpack_cholesky(t.forward(z), dim)[rows, cols]

    z = jax.random.normal(jax.random.key(22), (t.unconstrained_size,))
    J = jax.jacfwd(free_coords)(z)
    _, ref = jnp.linalg.slogdet(J)
    np.testing.assert_allclose(t.log_det_jacobian(z), ref, rtol=1e-9)


def test_cov_cholesky_log_det_matches_autodiff():
    t = tfm.CovCholesky(4)
    z = jax.random.normal(jax.random.key(23), (t.unconstrained_size,))
    J = jax.jacfwd(t.forward)(z)
    _, ref = jnp.linalg.slogdet(J)
    np.testing.assert_allclose(t.log_det_jacobian(z), ref, rtol=1e-10)


def test_pack_unpack_cholesky_batched():
    x = jax.random.normal(jax.random.key(24), (3, 7, 10))
    L = tfm.unpack_cholesky(x, 4)
    assert L.shape == (3, 7, 4, 4)
    np.testing.assert_allclose(tfm.pack_cholesky(L), x, rtol=1e-12)


def _lkj_cholesky_logdensity(dim, eta=1.0):
    # LKJ(eta) density on the Cholesky factor: sum_i (dim - i - 1 + 2(eta-1))
    # * log L_ii over 0-indexed rows (Stan's lkj_corr_cholesky_lpdf kernel).
    expo = jnp.arange(dim - 1, -1, -1, dtype=float) + 2.0 * (eta - 1.0)

    def logdensity(x):
        L = tfm.unpack_cholesky(x, dim)
        return jnp.sum(expo * jnp.log(jnp.diagonal(L)))

    return logdensity


def test_lkj_uniform_marginal_k2():
    # K=2, eta=1: the off-diagonal correlation is uniform(-1, 1) —
    # mean 0, var 1/3. A wrong CorrCholesky Jacobian biases this.
    t = tfm.CorrCholesky(2)
    m = tfm.transform_objective(_lkj_cholesky_logdensity(2), t)
    z0 = 0.1 * jax.random.normal(jax.random.key(25), (32, 1))
    res = qnm.chees_sample(m, jax.random.key(26), z0, n_samples=500, n_warmup=300)
    r = np.asarray(tfm.forward_draws(t, res.samples))[..., 1]  # L_10 = corr
    assert abs(r.mean()) < 0.03
    np.testing.assert_allclose(r.var(), 1.0 / 3.0, rtol=0.08)


def test_lkj_beta_marginal_k3():
    # K=3, eta=1: each correlation is marginally Beta(3/2, 3/2) on [-1, 1]
    # (mean 0, var 1/4).
    t = tfm.CorrCholesky(3)
    m = tfm.transform_objective(_lkj_cholesky_logdensity(3), t)
    z0 = 0.1 * jax.random.normal(jax.random.key(27), (64, 3))
    res = qnm.chees_sample(m, jax.random.key(28), z0, n_samples=500, n_warmup=300)
    L = tfm.unpack_cholesky(tfm.forward_draws(t, res.samples), 3)
    R = np.asarray(L @ jnp.swapaxes(L, -1, -2))
    for i, j in [(1, 0), (2, 0), (2, 1)]:
        r = R[..., i, j]
        assert abs(r.mean()) < 0.04, (i, j, r.mean())
        np.testing.assert_allclose(r.var(), 0.25, rtol=0.1)


# ---------------------------------------------------------------------------
# TransformedModel: objective wrapping + analytic gradient pullback


class _GammaModel(qnm.ProbabilityModel):
    """Gamma(a, rate b) log-density on x > 0, with an analytic gradient."""

    def __init__(self, a, b):
        super().__init__(1)
        self.a, self.b = a, b

    def logdensity(self, x):
        return (self.a - 1.0) * jnp.log(x[0]) - self.b * x[0]

    def logdensity_and_gradient(self, x):
        val = self.logdensity(x)
        return val, jnp.array([(self.a - 1.0) / x[0] - self.b])


def test_transformed_logdensity_value():
    m = tfm.transform_objective(_GammaModel(3.0, 2.0), tfm.Positive(1))
    z = jnp.array([0.3])
    x = jnp.exp(z)
    expected = (3.0 - 1.0) * jnp.log(x[0]) - 2.0 * x[0] + z[0]
    np.testing.assert_allclose(m.logdensity(z), expected, rtol=1e-12)


def test_analytic_gradient_pullback_matches_ad():
    m = tfm.transform_objective(_GammaModel(3.0, 2.0), tfm.Positive(1))
    z = jnp.array([-0.4])
    v_a, g_a = m.logdensity_and_gradient(z)
    v_d, g_d = jax.value_and_grad(m.logdensity)(z)
    np.testing.assert_allclose(v_a, v_d, rtol=1e-12)
    np.testing.assert_allclose(g_a, g_d, rtol=1e-12)


def test_analytic_pullback_block_transform():
    # mixed blocks: make sure the vjp pullback handles size-changing blocks
    t = tfm.BlockTransform([tfm.Positive(1), tfm.Simplex(3)])

    class M(qnm.ProbabilityModel):
        def __init__(self):
            super().__init__(4)

        def logdensity(self, x):
            return -0.5 * x[0] ** 2 + jnp.sum(jnp.array([2.0, 3.0, 4.0]) * jnp.log(x[1:]))

        def logdensity_and_gradient(self, x):
            g = jnp.concatenate(
                [-x[:1], jnp.array([2.0, 3.0, 4.0]) / x[1:]]
            )
            return self.logdensity(x), g

    m = tfm.transform_objective(M(), t)
    z = jax.random.normal(jax.random.key(7), (3,))
    v_a, g_a = m.logdensity_and_gradient(z)
    v_d, g_d = jax.value_and_grad(m.logdensity)(z)
    np.testing.assert_allclose(v_a, v_d, rtol=1e-11)
    np.testing.assert_allclose(g_a, g_d, rtol=1e-11)


def test_constrain_unconstrain_helpers():
    t = tfm.BlockTransform([tfm.Positive(2), tfm.Interval(2)])
    m = tfm.transform_objective(lambda x: -jnp.sum(x**2), t)
    x = jnp.array([0.5, 2.0, 0.25, 0.75])
    z = m.unconstrain(x)
    np.testing.assert_allclose(m.constrain(z), x, rtol=1e-10)
    xs = jnp.stack([x, 2 * x / 3])
    np.testing.assert_allclose(m.constrain(m.unconstrain(xs)), xs, rtol=1e-10)


# ---------------------------------------------------------------------------
# End-to-end: MAP through the engines lands on the closed-form z-mode


def test_map_gamma_mode_is_a_over_b():
    # d/dz [(a-1) log x - b x + z], x = e^z  ==>  a - b e^z = 0: x* = a/b
    a, b = 3.0, 2.0
    m = tfm.transform_objective(_GammaModel(a, b), tfm.Positive(1))
    res = qnm.optimize(m, jnp.zeros(1), tol=1e-10)
    assert np.isfinite(float(res.fun))
    np.testing.assert_allclose(m.constrain(res.x), [a / b], rtol=1e-8)


def test_map_beta_interval_mode_is_the_mean():
    # Beta(a,b) on (lo,hi) + sigmoid Jacobian: effective exponents become
    # (a, b), so the z-mode maps to p = a/(a+b) exactly.
    a, b, lo, hi = 2.0, 5.0, -1.0, 3.0

    def logdensity(x):
        p = (x[0] - lo) / (hi - lo)
        return (a - 1.0) * jnp.log(p) + (b - 1.0) * jnp.log1p(-p)

    m = tfm.transform_objective(logdensity, tfm.Interval(1, lo=lo, hi=hi))
    res = qnm.optimize(m, jnp.zeros(1), tol=1e-10)
    np.testing.assert_allclose(
        m.constrain(res.x), [lo + (hi - lo) * a / (a + b)], rtol=1e-8
    )


def test_map_batched_fleet_on_transformed_model():
    # 8-lane fleet on a product of gammas through the fused batched engine
    a = jnp.array([2.0, 3.0, 4.0, 5.0])
    b = jnp.array([1.0, 2.0, 0.5, 4.0])

    def logdensity(x):
        return jnp.sum((a - 1.0) * jnp.log(x) - b * x)

    m = tfm.transform_objective(logdensity, tfm.Positive(4))
    z0 = 0.1 * jax.random.normal(jax.random.key(8), (8, 4))
    res = qnm.optimize_batched(m, z0, tol=1e-7)
    assert int(jnp.sum(res.status == qnm.Status.CONVERGED)) == 8
    x = m.constrain(res.x)
    np.testing.assert_allclose(x, jnp.broadcast_to(a / b, (8, 4)), rtol=1e-6)


def test_sampling_dirichlet_mean_through_simplex():
    # Distribution-level check of the Jacobian: ChEES draws from
    # Dirichlet(alpha) in z-space must have constrained mean alpha/sum.
    # A wrong log|J| would bias this, not just slow it.
    alpha = jnp.array([2.0, 3.0, 5.0])

    def logdensity(x):
        return jnp.sum((alpha - 1.0) * jnp.log(x))

    t = tfm.Simplex(3)
    m = tfm.transform_objective(logdensity, t)
    z0 = 0.1 * jax.random.normal(jax.random.key(9), (32, 2))
    res = qnm.chees_sample(
        m, jax.random.key(10), z0, n_samples=400, n_warmup=300
    )
    x = tfm.forward_draws(t, res.samples)
    mean = np.asarray(jnp.mean(x, axis=(0, 1)))
    np.testing.assert_allclose(mean, alpha / alpha.sum(), atol=0.02)


# ---------------------------------------------------------------------------
# HierarchicalRegression: the full-stack constrained model family


def test_hierarchical_map_converges_and_recovers_beta():
    from quasinewtonmethods_jl_tpu.models import HierarchicalRegression

    m = HierarchicalRegression(n_groups=6, q=2, p=3, n_obs=400, seed=3)
    tm = tfm.transform_objective(m, m.transform)
    z0 = tm.unconstrain(m.initial_point())
    res = qnm.optimize(tm, z0, tol=1e-8, max_iterations=2000)
    assert int(res.status) == int(qnm.Status.CONVERGED)
    x = tm.constrain(res.x)
    beta, _, tau, sigma, L = m.split(x)
    # with 400 obs / 6 dims, MAP beta lands near truth
    np.testing.assert_allclose(beta, m.beta_true, atol=0.15)
    assert 0.3 < float(sigma) < 0.8  # truth 0.5
    assert (np.asarray(tau) > 0).all()
    R = np.asarray(L @ L.T)
    np.testing.assert_allclose(np.diag(R), 1.0, rtol=1e-10)


def test_hierarchical_fleet_and_pipeline():
    from quasinewtonmethods_jl_tpu.models import HierarchicalRegression

    m = HierarchicalRegression(n_groups=4, q=2, p=2, n_obs=200, seed=4)
    res = qnm.map_then_sample(
        m,
        jax.random.key(30),
        m.initial_point(),
        n_chains=8,
        n_samples=200,
        n_warmup=200,
        transform=m.transform,
        init_scale=0.05,
    )
    # constrained draws respect every constraint
    xc = np.asarray(res.samples_constrained)
    _, _, tau, sigma, _ = m.split(jnp.asarray(xc[0, 0]))
    assert (np.asarray(tau) > 0).all() and float(sigma) > 0
    # posterior beta covers the truth loosely
    k = m.p
    beta_mean = xc[..., :k].reshape(-1, k).mean(0)
    np.testing.assert_allclose(beta_mean, m.beta_true, atol=0.25)
    # diagnostics on the constrained scale, finite
    assert np.isfinite(res.diagnostics.rhat).all()


# ---------------------------------------------------------------------------
# map_then_sample(transform=...): the one-call constrained pipeline


_GA = jnp.array([3.0, 5.0, 2.0])
_GB = jnp.array([2.0, 1.0, 4.0])


def _gamma_product_logdensity(x):
    return jnp.sum((_GA - 1.0) * jnp.log(x) - _GB * x)


def _gamma_product_vag(x):
    return _gamma_product_logdensity(x), (_GA - 1.0) / x - _GB


def test_map_then_sample_transform():
    t = tfm.Positive(3)
    res = qnm.map_then_sample(
        _gamma_product_logdensity,
        jax.random.key(11),
        jnp.ones(3),  # constrained-space center
        n_chains=16,
        n_samples=300,
        n_warmup=300,
        transform=t,
    )
    # z-space draws and the constrained view are consistent
    assert res.samples_constrained.shape == res.samples.shape
    np.testing.assert_allclose(
        res.samples_constrained, tfm.forward_draws(t, res.samples), rtol=1e-12
    )
    assert (np.asarray(res.samples_constrained) > 0).all()
    # the z-mode maps to x = a/b exactly (see test_map_gamma_mode_is_a_over_b)
    np.testing.assert_allclose(res.x_map_constrained, _GA / _GB, rtol=1e-4)
    # diagnostics are on the CONSTRAINED scale: mean ~ Gamma mean a/b
    np.testing.assert_allclose(
        res.diagnostics.mean, _GA / _GB, rtol=0.1, atol=0.05
    )


def test_map_then_sample_transform_analytic_vag():
    # x-space analytic gradient is pulled back through the transform;
    # same seeds => same draws as the AD path
    kw = dict(
        n_chains=8, n_samples=32, n_warmup=64, compute_diagnostics=False
    )
    t = tfm.Positive(3)
    r_ad = qnm.map_then_sample(
        _gamma_product_logdensity, jax.random.key(12), jnp.ones(3),
        transform=t, **kw,
    )
    r_an = qnm.map_then_sample(
        _gamma_product_logdensity, jax.random.key(12), jnp.ones(3),
        transform=t, value_and_grad_fn=_gamma_product_vag, **kw,
    )
    np.testing.assert_allclose(r_an.samples, r_ad.samples, rtol=1e-8, atol=1e-10)
