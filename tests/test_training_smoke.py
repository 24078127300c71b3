"""f32 training smoke tests.

The production dtype on TPU is float32; these tests catch f32-only
regressions that the (mostly f64, log_prob-only) rest of the suite cannot -
e.g. the NaN parameter gradient at cdf=0.5 in the partly_precise iCDF pass
(fixed in ops/logistic_kde.py:erfinv_f32_args_from_logs).
"""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from jammy_flows_tpu import pdf


def _train(p, data, conditional_input=None, steps=60, lr=5e-3):
    params = p.init_params(seed=0, dtype=jnp.float32)
    opt = optax.adam(lr)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state):
        def loss_fn(pp):
            return -p.log_prob(pp, data,
                               conditional_input=conditional_input)[0].mean()
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    first = last = None
    for i in range(steps):
        params, opt_state, loss = step(params, opt_state)
        assert np.isfinite(float(loss)), f"non-finite loss at step {i}"
        if i == 0:
            first = float(loss)
        last = float(loss)
    return first, last, params


@pytest.mark.parametrize("pdf_defs,flow_defs,opts", [
    ("e2", "gg", {}),
    ("e2", "gg", {"g": {"inverse_function_type": "inormal_partly_precise"}}),
    ("e2", "t", {"t": {"cov_type": "full"}}),
    ("s2", "f", {}),
    ("i1+a1", "r+w", {}),
])
def test_f32_training_stays_finite_and_improves(pdf_defs, flow_defs, opts):
    rng = np.random.default_rng(0)
    p = pdf(pdf_defs, flow_defs, options_overwrite=opts)
    if pdf_defs == "e2":
        data = rng.standard_normal((512, 2)) * [1.0, 0.5] + [0.7, -0.3]
    elif pdf_defs == "s2":
        theta = np.arccos(np.clip(rng.normal(0.3, 0.3, 512), -0.99, 0.99))
        phi = rng.uniform(0.5, 2.0, 512)
        data = np.stack([theta, phi], 1)
    else:
        data = np.stack([rng.beta(2, 2, 512), rng.beta(3, 2, 512) * 0.8 + 0.1], 1)
    data = jnp.asarray(data, jnp.float32)
    first, last, _ = _train(p, data)
    assert last < first, (first, last)


def test_f32_conditional_training_large_inputs():
    """Conditional MLP path with inputs of scale ~100 (stresses the damped
    init; reference test_general.py:429)."""
    rng = np.random.default_rng(1)
    p = pdf("e2", "gg", conditional_input_dim=2)
    ci = jnp.asarray(rng.standard_normal((512, 2)) * 100.0, jnp.float32)
    data = jnp.asarray(rng.standard_normal((512, 2)), jnp.float32)
    first, last, _ = _train(p, data, conditional_input=ci)
    assert last < first


def test_f32_sampling_gradient_finite():
    """Reparameterized sampling gradients (implicit-function custom_vjp)
    stay finite in f32."""
    p = pdf("e2", "gg")
    params = p.init_params(seed=0, dtype=jnp.float32)

    def expectation(pp):
        x, _, lp, _ = p.sample(pp, jax.random.PRNGKey(0), samplesize=128)
        return (x**2).mean() + lp.mean()

    g = jax.jit(jax.grad(expectation))(params)
    for leaf in jax.tree.leaves(g):
        assert bool(jnp.isfinite(leaf).all())
