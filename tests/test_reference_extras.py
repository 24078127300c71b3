"""Tests mirroring reference suites not yet covered elsewhere:

- tests/test_inner_loop_simplex.py: Gumbel-softmax flow vs the exact
  concrete-distribution density; `w` flow normalization.
- tests/test_spheres.py:25: near-pole stability of S2 flows.
- tests/test_mlps.py:25: AmortizableMLP equivalences (functional analogs:
  low-rank smart fallback, broadcast vs per-sample params, highway modes).
- test_entropy_and_marginal_entropy.py:96: entropy is differentiable.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from jammy_flows_tpu import pdf
from jammy_flows_tpu.models.amortizable_mlp import AmortizableMLP


# -- simplex flows vs exact densities ------------------------------------

def _pinned_gumbel_density_k2(x1, tau, a1, a2):
    """Exact density of the reference's gumbel_softmax flow for K=2.

    The flow (gumbel_softmax.py:318-377 - reproduced in
    layers/simplex.py:GumbelSoftmax) pushes ONE standard Gumbel G per
    intrinsic dim through x1 = sigmoid((G + log(a1/a2)) / tau) with the last
    class's Gumbel pinned at 0 (NOT the K-iid-Gumbel concrete distribution -
    the reference's own concrete-density comparison is commented out in
    tests/test_inner_loop_simplex.py:80).  Inverting: G = tau*logit(x1) - a,
    p(x1) = gumbel_pdf(G) * tau / (x1 (1-x1)).
    """
    a = np.log(a1) - np.log(a2)
    g = tau * (np.log(x1) - np.log1p(-x1)) - a
    return np.exp(-g - np.exp(-g)) * tau / (x1 * (1.0 - x1))


def test_gumbel_softmax_matches_exact_density():
    """pdf("a1","u") log_prob must equal the closed-form pushforward density
    for the (tau, probs) stored in its parameters."""
    p = pdf("a1", "u")
    params = p.init_params(seed=0, dtype=jnp.float64)
    # params: [log_tau, log_prob_1, log_prob_2]
    flat = np.array([np.log(1.5), np.log(2.0), np.log(1.0)])
    params = jax.tree.map(
        lambda a: jnp.asarray(flat) if a.shape == (3,) else a, params)

    xs = jnp.linspace(0.02, 0.998, 301, dtype=jnp.float64)[:, None]
    lp = np.asarray(p.log_prob(params, xs)[0])
    exact = _pinned_gumbel_density_k2(np.asarray(xs[:, 0]), 1.5, 2.0, 1.0)
    # bulk: exact agreement; tails (density down to 1e-294 here): log-space
    # within 0.05 - the pade iCDF tails are ~2% relative by construction,
    # same as the reference.
    bulk = exact > 1e-4
    np.testing.assert_allclose(np.exp(lp[bulk]), exact[bulk],
                               rtol=1e-5, atol=1e-8)
    np.testing.assert_allclose(lp, np.log(exact), rtol=0.01, atol=0.05)


def test_gumbel_softmax_normalized():
    """The pushforward density must integrate to 1 on the 1-simplex."""
    p = pdf("a1", "u")
    params = p.init_params(seed=0, dtype=jnp.float64)
    n = 8001
    xs = jnp.linspace(2e-4, 1.0 - 2e-4, n, dtype=jnp.float64)[:, None]
    lp = p.log_prob(params, xs)[0]
    integral = float(jnp.trapezoid(jnp.exp(lp), xs[:, 0]))
    assert abs(integral - 1.0) < 5e-3, integral


def test_inner_loop_simplex_normalized():
    """pdf("a1","w") with random params must integrate to 1 on the
    1-simplex (the roundtrip tests check bijectivity; this checks the
    log-det chain end-to-end against quadrature)."""
    p = pdf("a1", "w")
    params = p.init_params(seed=3, dtype=jnp.float64)
    n = 4001
    xs = jnp.linspace(5e-4, 1.0 - 5e-4, n, dtype=jnp.float64)[:, None]
    lp = p.log_prob(params, xs)[0]
    integral = float(jnp.trapezoid(jnp.exp(lp), xs[:, 0]))
    assert abs(integral - 1.0) < 5e-3, integral


# -- near-pole stability on S2 -------------------------------------------

@pytest.mark.parametrize("flow_defs,opts", [
    ("f", {}),
    ("v", {"v": {"natural_direction": 0}}),
    ("o", {}),
])
def test_s2_near_pole_stability(flow_defs, opts):
    """log_prob and roundtrips must stay finite for points arbitrarily close
    to the poles (reference tests/test_spheres.py:25-78)."""
    if flow_defs == "o":
        p = pdf("s1", flow_defs, options_overwrite=opts)
        eps_points = np.array([[1e-7], [2 * np.pi - 1e-7], [np.pi]])
    else:
        p = pdf("s2", flow_defs, options_overwrite=opts)
        eps_points = np.array([
            [1e-7, 0.5], [np.pi - 1e-7, 0.5],
            [1e-5, 6.28], [np.pi - 1e-5, 1e-7],
        ])
    params = p.init_params(seed=1, dtype=jnp.float64)
    x = jnp.asarray(eps_points, jnp.float64)
    lp, lp_base, base = p.log_prob(params, x)
    assert bool(jnp.isfinite(lp).all()), np.asarray(lp)
    assert bool(jnp.isfinite(base).all())
    # gradients wrt params stay finite at the poles too
    g = jax.grad(lambda pp: p.log_prob(pp, x)[0].sum())(params)
    for leaf in jax.tree.leaves(g):
        assert bool(jnp.isfinite(leaf).all())


# -- AmortizableMLP equivalences -----------------------------------------

def test_mlp_broadcast_vs_per_sample():
    """Bp=1 broadcast parameters must equal explicitly tiled (Bp=B) ones
    (functional analog of reference tests/test_mlps.py:25 'amortized vs
    permanent' equivalence)."""
    mlp = AmortizableMLP(3, "16-16", 5, highway_mode=1,
                         low_rank_approximations=4)
    rng = np.random.default_rng(0)
    flat = jnp.asarray(rng.standard_normal((1, mlp.num_params)))
    x = jnp.asarray(rng.standard_normal((7, 3)))
    out1 = mlp.apply(flat, x)
    out2 = mlp.apply(jnp.tile(flat, (7, 1)), x)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), rtol=1e-12)


def test_mlp_smart_svd_falls_back_to_full():
    """svd_mode='smart' must use the full matrix whenever the low-rank
    factorization is not cheaper (amortizable_mlp.py:272-375)."""
    full = AmortizableMLP(4, "8", 4, low_rank_approximations=0)
    # rank 100 >> min(in,out): smart mode falls back -> identical param count
    smart = AmortizableMLP(4, "8", 4, low_rank_approximations=100)
    assert full.num_params == smart.num_params
    rng = np.random.default_rng(1)
    flat = jnp.asarray(rng.standard_normal((1, full.num_params)))
    x = jnp.asarray(rng.standard_normal((5, 4)))
    np.testing.assert_allclose(np.asarray(full.apply(flat, x)),
                               np.asarray(smart.apply(flat, x)), rtol=1e-12)


def test_mlp_low_rank_matches_manual_uv():
    """A rank-r block must compute u @ (v @ x) + b exactly."""
    mlp = AmortizableMLP(6, "", 4, low_rank_approximations=2)
    block = mlp.mlp_list[0]
    assert not block["full_flags"][0]
    rng = np.random.default_rng(2)
    flat = rng.standard_normal((1, mlp.num_params))
    x = rng.standard_normal((3, 6))
    u = flat[0, :8].reshape(4, 2)
    v = flat[0, 8:20].reshape(2, 6)
    b = flat[0, 20:24]
    expected = x @ v.T @ u.T + b
    out = mlp.apply(jnp.asarray(flat), jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out), expected, rtol=1e-10)


@pytest.mark.parametrize("mode", [0, 1, 2, 3, 4])
def test_mlp_highway_modes_shapes_and_grads(mode):
    mlp = AmortizableMLP(3, "8-8", 5, highway_mode=mode)
    rng = np.random.default_rng(mode)
    flat = jnp.asarray(rng.standard_normal((1, mlp.num_params)) * 0.1)
    x = jnp.asarray(rng.standard_normal((4, 3)))
    out = mlp.apply(flat, x)
    assert out.shape == (4, 5)
    g = jax.grad(lambda f: mlp.apply(f, x).sum())(flat)
    assert bool(jnp.isfinite(g).all())


def test_mlp_precise_structure():
    """precise_mlp_structure (amortizable_mlp.py:56-62): a custom per-matrix
    structure that replicates the automatic one must match it exactly, and
    heterogeneous per-block shapes/ranks must work."""
    auto = AmortizableMLP(5, [16, 16], 7, highway_mode=2,
                          low_rank_approximations=[3, 4, 5, 6, 0])
    precise = AmortizableMLP(5, [], 7, highway_mode=2, precise_mlp_structure={
        "mlp_list": [
            {"inputs": [5, 16], "outputs": [16, 7],
             "low_rank_approximations": [3, 4], "add_final_bias": False},
            {"inputs": [5, 16], "outputs": [16, 7],
             "low_rank_approximations": [5, 6], "add_final_bias": False},
        ],
        "linear_highway": {"inputs": [5], "outputs": [7],
                           "low_rank_approximations": [0],
                           "add_final_bias": True},
    })
    assert auto.num_params == precise.num_params
    rng = np.random.default_rng(3)
    flat = jnp.asarray(rng.standard_normal((1, auto.num_params)))
    x = jnp.asarray(rng.standard_normal((4, 5)))
    np.testing.assert_allclose(np.asarray(auto.apply(flat, x)),
                               np.asarray(precise.apply(flat, x)), rtol=1e-12)

    custom = AmortizableMLP(5, [], 7, highway_mode=2, precise_mlp_structure={
        "mlp_list": [
            {"inputs": [5, 32], "outputs": [32, 7],
             "low_rank_approximations": [2, 2], "add_final_bias": False},
            {"inputs": [5, 8], "outputs": [8, 7],
             "low_rank_approximations": [0, 0], "add_final_bias": False},
        ],
        "linear_highway": {"inputs": [5], "outputs": [7],
                           "low_rank_approximations": [0],
                           "add_final_bias": True},
    })
    init = jnp.asarray(custom.default_init(fix_final_bias=np.zeros(7)))[None]
    out = custom.apply(init, x)
    assert out.shape == (4, 7) and bool(jnp.isfinite(out).all())


# -- entropy differentiability -------------------------------------------

def test_entropy_is_differentiable():
    """d entropy / d params exists and is finite
    (test_entropy_and_marginal_entropy.py:96)."""
    p = pdf("e2", "gg")
    params = p.init_params(seed=0, dtype=jnp.float64)
    key = jax.random.PRNGKey(0)

    def ent(pp):
        return p.entropy(pp, key, samplesize=256)["total"].sum()

    g = jax.grad(ent)(params)
    leaves = jax.tree.leaves(g)
    assert leaves
    for leaf in leaves:
        assert bool(jnp.isfinite(leaf).all())
        assert float(jnp.abs(leaf).max()) > 0.0


def test_minor_api_methods():
    """get_total_embedding_dim / transform_target_into_returnable_params
    (default.py:1709-1735)."""
    p = pdf("e2+s2+s1", "gg+f+m")
    params = p.init_params(seed=0)
    # e2 -> 2, s2 -> 3 (xyz), s1 -> 2 (xy)
    assert p.get_total_embedding_dim() == 7
    x, _, _, _ = p.sample(params, jax.random.PRNGKey(0), samplesize=8)
    emb = p.transform_target_into_returnable_params(x)
    assert emb.shape == (8, 7)
    ref, _ = p.transform_target_space(x)
    np.testing.assert_allclose(np.asarray(emb), np.asarray(ref))
