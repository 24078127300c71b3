"""Implicit-function gradients of iterative inverses vs finite differences.

The reference differentiates through its Newton loops (bisection_n_newton.py)
and tests gradient equivalence in test_newton_iters.py; here the inverses
carry custom_vjp implicit gradients, checked against central finite
differences.
"""
import jax
import jax.numpy as jnp
import numpy as np

from jammy_flows_tpu import pdf
from jammy_flows_tpu.ops.inverse import make_inverse_fn


def test_inverse_fn_gradients_match_fd():
    """d inverse / d params for a simple monotone family."""
    def value_fn(x, params):
        a, b = params
        return a * x + b * jnp.tanh(x)

    inv = make_inverse_fn(value_fn, lo=-100.0, hi=100.0)
    target = jnp.asarray([[0.7, -1.3]], dtype=jnp.float64)

    def solve_sum(params):
        return jnp.sum(inv(target, params))

    a = jnp.asarray(1.5, jnp.float64)
    b = jnp.asarray(0.8, jnp.float64)
    g = jax.grad(solve_sum)((a, b))
    eps = 1e-6
    fd_a = (solve_sum((a + eps, b)) - solve_sum((a - eps, b))) / (2 * eps)
    fd_b = (solve_sum((a, b + eps)) - solve_sum((a, b - eps))) / (2 * eps)
    np.testing.assert_allclose(float(g[0]), float(fd_a), rtol=1e-5)
    np.testing.assert_allclose(float(g[1]), float(fd_b), rtol=1e-5)
    # d/d target
    gt = jax.grad(lambda t: jnp.sum(inv(t, (a, b))))(target)
    fd_t = (jnp.sum(inv(target + eps, (a, b)))
            - jnp.sum(inv(target - eps, (a, b)))) / (2 * eps)
    np.testing.assert_allclose(float(jnp.sum(gt)), float(fd_t), rtol=1e-5)


def test_sampling_gradient_matches_fd_gf():
    """Gradient of a sampling statistic w.r.t. flow params (through the
    bisection+Newton custom_vjp) vs finite differences."""
    p = pdf("e1", "g")
    params = p.init_params(seed=0)
    key = jax.random.PRNGKey(0)

    def stat(pp):
        x, _, _, _ = p.sample(pp, key, samplesize=64)
        return jnp.mean(x**2)

    g = jax.grad(stat)(params)["flow_0"]
    eps = 1e-6
    fd = np.zeros_like(np.asarray(params["flow_0"]))
    base = np.asarray(params["flow_0"])
    for i in range(0, len(base), max(1, len(base) // 8)):  # spot-check dims
        pp_plus = {"flow_0": params["flow_0"].at[i].add(eps)}
        pp_minus = {"flow_0": params["flow_0"].at[i].add(-eps)}
        fd_i = (float(stat(pp_plus)) - float(stat(pp_minus))) / (2 * eps)
        np.testing.assert_allclose(float(g[i]), fd_i, rtol=2e-4, atol=1e-7,
                                   err_msg=f"param {i}")


def test_sphere_newton_gradient_matches_fd():
    """Implicit gradients of the exp-map sphere inverse (v flow sampling)."""
    p = pdf("s2", "v", options_overwrite={"v": {"num_components": 3}})
    params = p.init_params(seed=1)
    key = jax.random.PRNGKey(2)

    def stat(pp):
        x, _, _, _ = p.sample(pp, key, samplesize=16)
        return jnp.mean(jnp.cos(x[:, 0]))

    g = jax.grad(stat)(params)["flow_0"]
    base = params["flow_0"]
    # the FD baseline carries the Newton solve's own convergence noise
    # (~1e-9), so eps must stay large-ish and the tolerance loose
    eps = 1e-5
    for i in [0, len(base) // 2, len(base) - 1]:
        fd_i = (float(stat({"flow_0": base.at[i].add(eps)}))
                - float(stat({"flow_0": base.at[i].add(-eps)}))) / (2 * eps)
        np.testing.assert_allclose(float(g[i]), fd_i, rtol=5e-2, atol=1e-6,
                                   err_msg=f"param {i}")
