"""Analytic log-derivatives vs autodiff; numerics stability tests.

Port of the reference test_derivative (test_general.py:591-647: GF
inverse-CDF value/derivative vs autograd jacobian for all 4 approximations)
and test_softplus_m_1_approximation.py.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from jammy_flows_tpu.ops import logistic_kde
from jammy_flows_tpu.ops.special import log_one_plus_exp_x_to_a_minus_1


IFTS = ["isigmoid", "inormal_partly_precise", "inormal_partly_crude",
        "inormal_full_pade"]


@pytest.mark.parametrize("ift", IFTS)
def test_gaussianize_derivative_matches_autodiff(ift):
    """The analytic log-derivative must match jax.jacobian of the value
    (tol 1e-6 in the bulk, as in test_general.py:591-647)."""
    key = jax.random.PRNGKey(0)
    k, d, b = 7, 3, 40
    means = jax.random.normal(key, (k, d, 1), jnp.float64)
    log_w = jax.random.normal(jax.random.PRNGKey(1), (k, d, 1), jnp.float64) * 0.3
    log_n = jax.random.normal(jax.random.PRNGKey(2), (k, d, 1), jnp.float64) * 0.2
    x = jax.random.normal(jax.random.PRNGKey(3), (b, d), jnp.float64) * 2.0
    zeros = jnp.zeros((1, 1, 1)); ones = jnp.ones((1, 1, 1))

    val, log_deriv = logistic_kde.gaussianize_forward(
        x, means, log_w, log_n, zeros, ones, add_skewness=False,
        inverse_function_type=ift)

    def value_1d(xi):
        return logistic_kde.gaussianize_value(
            xi[None, :], means, log_w, log_n, zeros, ones,
            add_skewness=False, inverse_function_type=ift)[0]

    jac = jax.vmap(jax.jacobian(value_1d))(x)          # (B, D, D)
    diag = jnp.diagonal(jac, axis1=1, axis2=2)
    np.testing.assert_allclose(np.asarray(jnp.exp(log_deriv)),
                               np.asarray(diag), rtol=1e-6, atol=1e-8)
    # off-diagonal terms must vanish (elementwise map)
    off = jac - jnp.eye(d)[None] * diag[:, :, None]
    assert float(jnp.abs(off).max()) < 1e-12


@pytest.mark.parametrize("ift", IFTS)
def test_gaussianize_derivative_with_skewness(ift):
    key = jax.random.PRNGKey(5)
    k, d, b = 6, 2, 30
    means = jax.random.normal(key, (k, d, 1), jnp.float64)
    log_w = jnp.zeros((k, d, 1), jnp.float64) - 0.3
    log_n = jnp.zeros((k, d, 1), jnp.float64)
    log_skew = jax.random.normal(jax.random.PRNGKey(6), (k, d, 1),
                                 jnp.float64) * 0.3
    signs = jnp.asarray(np.concatenate([np.ones((k // 2, 1, 1)),
                                        -np.ones((k - k // 2, 1, 1))], axis=0))
    x = jax.random.normal(jax.random.PRNGKey(7), (b, d), jnp.float64) * 1.5

    val, log_deriv = logistic_kde.gaussianize_forward(
        x, means, log_w, log_n, log_skew, signs, add_skewness=True,
        inverse_function_type=ift)

    def value_1d(xi):
        return logistic_kde.gaussianize_value(
            xi[None, :], means, log_w, log_n, log_skew, signs,
            add_skewness=True, inverse_function_type=ift)[0]

    jac = jax.vmap(jax.jacobian(value_1d))(x)
    diag = jnp.diagonal(jac, axis1=1, axis2=2)
    np.testing.assert_allclose(np.asarray(jnp.exp(log_deriv)),
                               np.asarray(diag), rtol=1e-5, atol=1e-8)


@pytest.mark.parametrize("ift", IFTS)
def test_f32_gradients_finite_near_cdf_half(ift):
    """f32 training regression: parameter gradients must stay finite when a
    sample sits exactly at the mixture median (cdf = 0.5).  The
    sqrt-from-ln_fac reconstruction of 2c-1 has an infinite ln_fac-gradient
    there (inf * 0 = NaN through jnp.where) - fixed by the near-center
    direct-difference branch (ops/logistic_kde.py:erfinv_f32_args_from_logs)."""
    k, d = 5, 2
    means = jnp.zeros((k, d, 1), jnp.float32)
    log_w = jnp.zeros((k, d, 1), jnp.float32)
    log_n = jnp.zeros((k, d, 1), jnp.float32)
    zeros = jnp.zeros((1, 1, 1), jnp.float32)
    ones = jnp.ones((1, 1, 1), jnp.float32)
    # x=0 hits cdf=0.5 exactly for the symmetric mixture; add near-center
    # and tail points
    x = jnp.asarray([[0.0, 1e-6], [1e-4, -1e-4], [0.5, -8.0], [12.0, -12.0]],
                    jnp.float32)

    def f(xx, m, lw, ln):
        v, ld = logistic_kde.gaussianize_forward(
            xx, m, lw, ln, zeros, ones, add_skewness=False,
            inverse_function_type=ift)
        return v.sum() + ld.sum()

    grads = jax.grad(f, argnums=(0, 1, 2, 3))(x, means, log_w, log_n)
    for g in grads:
        assert bool(jnp.isfinite(g).all()), f"non-finite grad for {ift}"
    # value near the center must resolve sub-1e-3 structure (no f32
    # dead-zone): gaussianize(1e-4) - gaussianize(0) ~ pdf(0)*ndtri'(0.5)*1e-4.
    # full_pade excluded: its ln_fac-only formulation quantizes ~(2c-1)^2
    # near the center by construction (value error still < 1e-3).
    if ift != "inormal_full_pade":
        v, _ = logistic_kde.gaussianize_forward(
            x, means, log_w, log_n, zeros, ones, add_skewness=False,
            inverse_function_type=ift)
        assert float(v[1, 0]) > 1e-5
        assert float(v[0, 0]) == pytest.approx(0.0, abs=1e-6)


def test_log_one_plus_exp_x_to_a_minus_1_stability():
    """Stable log((1+e^x)^a - 1) across regimes
    (test_softplus_m_1_approximation.py:28)."""
    xs = jnp.asarray(np.linspace(-300.0, 300.0, 1001), jnp.float64)
    for a in [0.1, 1.0, 3.0, 9.0]:
        out = log_one_plus_exp_x_to_a_minus_1(xs, jnp.asarray(a))
        assert bool(jnp.isfinite(out).all()), f"non-finite for a={a}"
        # exact comparison where the direct f64 formula itself is accurate
        # (for x << 0 the direct (1+e^x)^a - 1 cancels catastrophically)
        mid = xs[(xs > -2) & (xs < 20)]
        exact = np.log((1.0 + np.exp(np.asarray(mid)))**a - 1.0)
        np.testing.assert_allclose(
            np.asarray(log_one_plus_exp_x_to_a_minus_1(mid, jnp.asarray(a))),
            exact, rtol=1e-9)
        # far-left asymptotics: log(expm1(a*e^x)) ~ log(a) + x
        left = xs[xs < -50]
        np.testing.assert_allclose(
            np.asarray(log_one_plus_exp_x_to_a_minus_1(left, jnp.asarray(a))),
            np.log(a) + np.asarray(left), rtol=1e-6)
        # asymptotics: x -> inf: a*x ; gradient finite everywhere
        g = jax.vmap(jax.grad(
            lambda xx: log_one_plus_exp_x_to_a_minus_1(xx, jnp.asarray(a))))(xs)
        assert bool(jnp.isfinite(g).all())


def test_mcmc_metrics():
    from jammy_flows_tpu.inference import metrics
    key = jax.random.PRNGKey(0)
    # iid normal chains: rhat ~ 1, ESS ~ S*C
    samples = jax.random.normal(key, (200, 8, 3), jnp.float64)
    rhat = metrics.potential_scale_reduction(samples)
    np.testing.assert_allclose(np.asarray(rhat), 1.0, atol=0.05)
    ess = metrics.effective_sample_size(samples)
    assert (np.asarray(ess) > 0.5 * 200 * 8).all()
    # strongly autocorrelated chains: low ESS
    t = jnp.cumsum(jax.random.normal(key, (200, 8, 1)), axis=0)
    ess2 = metrics.effective_sample_size(t)
    assert float(ess2[0]) < 200.0
