"""Data-driven initialization, failsafe resampling, Poisson heads."""
import jax
import jax.numpy as jnp
import numpy as np

from jammy_flows_tpu import pdf


def test_data_driven_init_improves_nll():
    """Percentile/PCA init must beat random init on bimodal data
    (extra_functions.py:179-409 semantics)."""
    rng = np.random.default_rng(0)
    data = np.concatenate([rng.normal([2, 0], [0.5, 0.3], (500, 2)),
                           rng.normal([-2, 1], [0.4, 1.0], (500, 2))])
    p = pdf("e2", "ggt")
    nll_rand = float(-p.log_prob(p.init_params(seed=1),
                                 jnp.asarray(data))[0].mean())
    nll_data = float(-p.log_prob(p.init_params(seed=1, data=data),
                                 jnp.asarray(data))[0].mean())
    assert nll_data < nll_rand


def test_data_driven_init_conditional_mlp_bias():
    rng = np.random.default_rng(0)
    data = rng.normal(0, 2.0, (400, 2))
    p = pdf("e2", "gg", conditional_input_dim=2)
    params = p.init_params(seed=1, data=data)
    ci = jnp.zeros((data.shape[0], 2))
    nll = float(-p.log_prob(params, jnp.asarray(data),
                            conditional_input=ci)[0].mean())
    assert np.isfinite(nll) and nll < 6.0


def test_failsafe_resampling_v_flow():
    p = pdf("s2", "v")
    params = p.init_params(seed=2)
    x, z, lp, lb = p.sample(params, jax.random.PRNGKey(0), samplesize=40,
                            failsafe_crosscheck_tolerance=1e-4)
    lp_eval, _, _ = p.log_prob(params, x)
    assert float(jnp.abs(lp - lp_eval).max()) < 1e-4


def test_poisson_standalone_mlp():
    p = pdf("e2", "gg", conditional_input_dim=3,
            predict_log_normalization=True,
            join_poisson_and_pdf_description=False,
            hidden_mlp_dims_poisson="32")
    params = p.init_params(seed=0)
    assert "poisson_mlp" in params
    ll = p.log_mean_poisson(params, conditional_input=jnp.ones((5, 3)))
    assert ll.shape == (5, 1)
    # damped init pins the Poisson log-mean near the -1 bias
    np.testing.assert_allclose(np.asarray(ll), -1.0, atol=0.01)


def test_poisson_nonconditional_parameter():
    p = pdf("e2", "gg", predict_log_normalization=True)
    params = p.init_params(seed=0)
    assert "log_lambda" in params
    ll = p.log_mean_poisson(params)
    assert ll.shape == (1, 1)
