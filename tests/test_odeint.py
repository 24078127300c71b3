"""Adaptive dopri5 integrator + continuous-adjoint gradients (ops/odeint.py).

The TPU-native equivalent of torchdiffeq.odeint_adjoint used by the 'c'
CNF layer (reference cnf_sphere_charts.py:228-244).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from jammy_flows_tpu.ops.odeint import TABLEAUS, odeint, odeint_dopri5


@pytest.mark.parametrize("name", sorted(TABLEAUS))
def test_tableau_consistency(name):
    """Row sums of A must equal c; both weight vectors must sum to 1."""
    tab = TABLEAUS[name]
    for ci, row in zip(tab.c, tab.a):
        assert abs(sum(row) - ci) < 1e-12, (name, ci, sum(row))
    b_low = [s - e for s, e in zip(tab.b_sol, tab.b_err)]
    assert abs(sum(tab.b_sol) - 1.0) < 1e-12
    assert abs(sum(b_low) - 1.0) < 1e-12


@pytest.mark.parametrize("name", sorted(TABLEAUS))
def test_all_methods_nonlinear_accuracy(name):
    """Every embedded pair integrates a stiff-ish nonlinear ODE to its
    tolerance: logistic equation y' = y(1-y), closed form known."""
    def f(t, y, th):
        return th * y * (1.0 - y)

    y0 = jnp.array([0.1])
    th = jnp.array(2.0)
    y1 = odeint(f, y0, th, 0.0, 3.0, 1e-8, 1e-8, max_steps=100000,
                method=name)
    exact = 1.0 / (1.0 + (1 / 0.1 - 1) * np.exp(-2.0 * 3.0))
    np.testing.assert_allclose(float(y1[0]), exact, atol=1e-6)

    # adjoint gradient w.r.t. theta vs finite differences
    def L(a):
        return odeint(f, y0, a, 0.0, 3.0, 1e-9, 1e-9, max_steps=100000,
                      method=name).sum()

    eps = 1e-6
    fd = (float(L(th + eps)) - float(L(th - eps))) / (2 * eps)
    ga = float(jax.grad(L)(th))
    assert abs(ga - fd) < 1e-5, (name, ga, fd)


def test_linear_decay_value_and_grads():
    def f(t, y, theta):
        return -theta * y

    y0 = jnp.array([2.0, 3.0])
    theta = jnp.array(0.7)
    y1 = odeint_dopri5(f, y0, theta, 0.0, 1.0, 1e-9, 1e-9)
    np.testing.assert_allclose(np.asarray(y1),
                               np.asarray(y0) * np.exp(-0.7), atol=1e-8)

    L = lambda y0_, th_: odeint_dopri5(f, y0_, th_, 0.0, 1.0, 1e-9, 1e-9).sum()
    g_y0, g_th = jax.grad(L, argnums=(0, 1))(y0, theta)
    np.testing.assert_allclose(np.asarray(g_y0), np.exp(-0.7), atol=1e-7)
    np.testing.assert_allclose(float(g_th), -(2 + 3) * np.exp(-0.7), atol=1e-7)


def test_nonlinear_roundtrip_and_adjoint_vs_fd():
    def f(t, y, th):
        return jnp.sin(t) * y + th["a"] * y**2 + th["b"]

    th = {"a": jnp.array(0.3), "b": jnp.array(0.1)}
    y0 = jnp.array([0.5])
    yf = odeint_dopri5(f, y0, th, 0.0, 1.5, 1e-10, 1e-10)
    yback = odeint_dopri5(f, yf, th, 1.5, 0.0, 1e-10, 1e-10)
    np.testing.assert_allclose(np.asarray(yback), np.asarray(y0), atol=1e-9)

    def L(a):
        return odeint_dopri5(f, y0, {"a": a, "b": th["b"]},
                             0.0, 1.5, 1e-11, 1e-11).sum()

    eps = 1e-6
    fd = (float(L(jnp.array(0.3 + eps))) - float(L(jnp.array(0.3 - eps)))) \
        / (2 * eps)
    ga = float(jax.grad(L)(jnp.array(0.3)))
    assert abs(ga - fd) < 1e-6


def test_pytree_state_jit_vmap():
    def f(t, state, th):
        y, z = state
        return (-th * y, y * z)

    y0 = (jnp.array([1.0, 2.0]), jnp.array([0.5, 0.5]))
    out = jax.jit(lambda s: odeint_dopri5(f, s, jnp.array(0.3),
                                          0.0, 1.0, 1e-8, 1e-8))(y0)
    assert out[0].shape == (2,) and out[1].shape == (2,)
    assert np.isfinite(np.asarray(out[0])).all()

    batched = jax.vmap(lambda y: odeint_dopri5(
        lambda t, yy, th: -th * yy, y, jnp.array(0.5), 0.0, 1.0, 1e-8, 1e-8))(
            jnp.arange(6.0).reshape(3, 2))
    np.testing.assert_allclose(np.asarray(batched),
                               np.arange(6.0).reshape(3, 2) * np.exp(-0.5),
                               atol=1e-7)


@pytest.mark.parametrize("solver", ["dopri5", "dopri8", "bosh3"])
def test_cnf_adaptive_matches_fixed_step(solver):
    """Adaptive solvers and fine-step RK4 must agree on the 'c' flow."""
    from jammy_flows_tpu import pdf

    x = jnp.stack([jnp.array([1.0, 2.0]), jnp.array([0.4, 5.0]),
                   jnp.array([2.4, 0.7])])
    p_ad = pdf("s2", "c", options_overwrite={
        "c": {"solver": solver, "cnf_network_hidden_dims": "16"}})
    p_rk = pdf("s2", "c", options_overwrite={
        "c": {"solver": "rk4", "step_size": 1.0 / 64.0,
              "cnf_network_hidden_dims": "16"}})
    params = p_ad.init_params(seed=3)
    lp_ad, _, _ = p_ad.log_prob(params, x)
    lp_rk, _, _ = p_rk.log_prob(params, x)
    np.testing.assert_allclose(np.asarray(lp_ad), np.asarray(lp_rk),
                               atol=1e-5)

    g = jax.grad(lambda pp: p_ad.log_prob(pp, x)[0].mean())(params)
    assert all(bool(jnp.isfinite(l).all())
               for l in jax.tree_util.tree_leaves(g))
