"""Column fast path vs row path parity.

TPU tile padding makes elementwise math on (B, 1)/(B, 2) arrays ~11x slower
than on flat (B,) arrays, so spherical/interval sub-manifolds run their
layer stacks on flat coordinate columns when every layer supports it
(layers/base.py supports_columns, models/pdf.py _try_columns).  These tests
pin the column path to the row path — values, log-dets, densities, and
gradients — across the production f/o/r option grid (reference option
surface: /root/reference/jammy_flows/layers/spheres/fvm_2d.py:28-210,
layers/intervals/rational_quadratic_spline.py:21-90).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from jammy_flows_tpu import pdf

PROD_F = {"f": {
    "add_vertical_rq_spline_flow": 1, "add_circular_rq_spline_flow": 1,
    "spline_num_basis_functions": -1, "vertical_smooth": 1,
    "vertical_flow_defs": "rr", "circular_flow_defs": "oo",
    "vertical_fix_boundary_derivative": 1,
    "vertical_fix_first_width_n_height_to_zero": 1,
    "vertical_also_fix_second_width_to_zero": 1,
    "vertical_independent_width_height_parametrization": 1,
    "circular_add_rotation": 0,
    "kappa_prediction": "direct_log_real_bounded",
    "rotation_mode": "householder",
}}

CASES = [
    ("s2_f_plain", "s2", "f", None, None),
    ("s2_fff_prod", "s2", "fff", PROD_F, None),
    ("s2_ff_prod_cond", "s2", "ff", PROD_F, 3),
    ("s2_f_xyz_mu", "s2", "f",
     {"f": {"rotation_mode": "xyz", "kappa_prediction": "mu"}}, None),
    ("s2_f_quat", "s2", "f",
     {"f": {"rotation_mode": "quaternion",
            "kappa_prediction": "quatvec_squared"}}, None),
    ("s2_ff_boundary", "s2", "ff",
     {"f": dict(PROD_F["f"], boundary_cos_theta_identity_region=0.1)}, None),
    ("s1_oo", "s1", "oo", None, None),
    ("s1_oo_nonsmooth", "s1", "oo",
     {"o": {"smooth_second_derivative": 0, "num_basis_functions": 6}}, None),
    ("s1_oo_fixedbd", "s1", "oo",
     {"o": {"smooth_second_derivative": 0, "num_basis_functions": 4,
            "fix_boundary_derivatives": 1.0}}, None),
    ("s1_y", "s1", "y", None, None),
    ("s1_m", "s1", "m", None, None),
    ("s1_m_natural", "s1", "m", {"m": {"natural_direction": 1}}, None),
    # (use_moebius_xyz_parametrization=0 is not reachable through the
    # option surface - the reference exposes only add_rotation/
    # num_basis_functions/natural_direction, flow_options.py:95-101)
    ("s1_m_rot", "s1", "m", {"m": {"add_rotation": 1}}, None),
    ("s1_mm_cond", "s1", "mm", None, 2),
    ("i1_rr", "i1_-0.5_2.0", "rr", None, None),
    ("i1_rr_smooth", "i1_0.0_1.0", "rr",
     {"r": {"smooth_second_derivative": 1, "num_basis_functions": 3}}, None),
    ("i1_rz_cond", "i1_0.0_1.0", "rz", None, 2),
    ("joint_e2s2_prod", "e2+s2", "gg+ff", PROD_F, 2),
]


def _row_path(p):
    """Context helper: force the row path on an otherwise column-capable
    PDF by monkeypatching the capability probe."""
    p._cols_ok = lambda *a, **kw: False
    p._cols_cache = {}


@pytest.mark.parametrize("name,defs,flows,opts,cond",
                         CASES, ids=[c[0] for c in CASES])
def test_column_path_matches_row_path(name, defs, flows, opts, cond):
    p = pdf(defs, flows, options_overwrite=opts or {},
            conditional_input_dim=cond)
    # the column path must actually engage (for the joint case only the
    # spherical sub-manifold is column-capable; e/gg uses the block kernels)
    assert p._cols_ok(len(p.layer_list) - 1, "density") and \
        p._cols_ok(len(p.layer_list) - 1, "sample"), name
    params = p.init_params(seed=0)
    rng = np.random.default_rng(1)
    B = 64
    ci = None if cond is None else jnp.asarray(rng.normal(size=(B, cond)))
    key = jax.random.PRNGKey(0)
    orig = p._cols_ok

    z = jax.random.normal(key, (B, p.total_base_dim), dtype=jnp.float64)
    ld0 = jnp.zeros(B, dtype=jnp.float64)

    x_col, ld_col = p.all_layer_forward(params, z, ld0, ci)
    _row_path(p)
    x_row, ld_row = p.all_layer_forward(params, z, ld0, ci)
    p._cols_ok = orig
    p._cols_cache = {}
    np.testing.assert_allclose(np.asarray(x_col), np.asarray(x_row),
                               atol=1e-12, rtol=0)
    np.testing.assert_allclose(np.asarray(ld_col), np.asarray(ld_row),
                               atol=1e-11, rtol=0)

    lp_col = p.log_prob(params, x_col, conditional_input=ci)[0]
    _row_path(p)
    lp_row = p.log_prob(params, x_col, conditional_input=ci)[0]
    p._cols_ok = orig
    p._cols_cache = {}
    np.testing.assert_allclose(np.asarray(lp_col), np.asarray(lp_row),
                               atol=1e-10, rtol=0)

    def nll(pp):
        return -p.log_prob(pp, x_col, conditional_input=ci)[0].mean()

    g_col = jax.grad(nll)(params)
    _row_path(p)
    g_row = jax.grad(nll)(params)
    p._cols_ok = orig
    p._cols_cache = {}
    for kk in g_col:
        d = np.abs(np.asarray(g_col[kk]) - np.asarray(g_row[kk])).max()
        assert d < 1e-9, (name, kk, d)


def test_column_path_engages_on_sampling():
    """PDF.sample must route through the column path and roundtrip."""
    p = pdf("s2", "ff", options_overwrite=PROD_F)
    params = p.init_params(seed=0)
    x, _, lp, _ = p.sample(params, jax.random.PRNGKey(3), 128)
    lp2, _, _ = p.log_prob(params, x)
    np.testing.assert_allclose(np.asarray(lp), np.asarray(lp2), atol=1e-8)


def test_embedding_space_layer_stays_on_row_path():
    """always_parametrize_in_embedding_space disables the column path (the
    embedding parametrization has no column twin)."""
    p = pdf("s2", "f")
    assert p._cols_ok(0, "density")
    p.layer_list[0][0].always_parametrize_in_embedding_space = True
    assert not p._cols_ok(0, "density")


V_VARIANTS = [
    ("linear", 0, "old"),
    ("quadratic", 0, "old"),
    ("exponential", 0, "old"),
    ("splines", 0, "old"),
    ("exponential", 1, "old"),
    ("exponential", 0, "householder"),
]


@pytest.mark.parametrize("exp_map_type,nat,meanpar", V_VARIANTS,
                         ids=[f"{e}_nat{n}_{m}" for e, n, m in V_VARIANTS])
def test_v_columns_match_row_both_directions(exp_map_type, nat, meanpar):
    """BOTH exp-map 'v' directions run on columns (round 4): the analytic
    direction via jvp-projected Jacobians, the solver direction via the
    column sphere-Newton (ops/inverse.py make_sphere_inverse_cols_fn, one
    vjp per iteration).  Values AND gradients pinned against the row path
    in both directions."""
    p = pdf("s2", "v", options_overwrite={"v": {
        "exp_map_type": exp_map_type, "natural_direction": nat,
        "mean_parametrization": meanpar}})
    assert p._cols_ok(0, "density") and p._cols_ok(0, "sample")
    params = p.init_params(seed=0)
    orig = p._cols_ok

    rng = np.random.default_rng(2)
    B = 32
    x = np.stack([rng.uniform(0.2, np.pi - 0.2, B),
                  rng.uniform(0.1, 2 * np.pi - 0.1, B)], axis=1)
    x = jnp.asarray(x)
    z = jax.random.normal(jax.random.PRNGKey(0), (B, 2), dtype=jnp.float64)
    ld0 = jnp.zeros(B, dtype=jnp.float64)

    def density(pp):
        lp, _, _ = p.log_prob(pp, x, force_intrinsic_coordinates=True)
        return lp

    def sampling(pp):
        xf, ld = p.all_layer_forward(pp, z, ld0)
        return xf, ld

    # The solver direction's column and row paths are two EQUIVALENT
    # sphere-Newton implementations, not the same arithmetic: the
    # alignment-based early exit (cos_a >= 1-edge, a ~6e-8 angular band at
    # f64 eps) lets their final iterates differ at the 1e-8 scale, and the
    # implicit gradients inherit that solution error.  The analytic
    # direction is a pure re-expression and stays at roundoff.
    solver_dir = "density" if nat else "sample"
    tols = {"density": (1e-10, 1e-8), "sample": (1e-9, 1e-7)}
    tols[solver_dir] = (5e-8, 1e-6)
    for run, grad_obj, (tol_v, tol_g) in (
            (density, lambda pp: -density(pp).mean(), tols["density"]),
            (lambda pp: sampling(pp)[0],
             lambda pp: (sampling(pp)[0] ** 2).mean()
             + 0.1 * sampling(pp)[1].mean(), tols["sample"])):
        out_col = run(params)
        p._cols_ok = lambda *a, **kw: False
        p._cols_cache = {}
        out_row = run(params)
        p._cols_ok = orig
        p._cols_cache = {}
        np.testing.assert_allclose(np.asarray(out_col), np.asarray(out_row),
                                   atol=tol_v, rtol=0)

        g_col = jax.grad(grad_obj)(params)
        p._cols_ok = lambda *a, **kw: False
        p._cols_cache = {}
        g_row = jax.grad(grad_obj)(params)
        p._cols_ok = orig
        p._cols_cache = {}
        for kk in g_col:
            d = np.abs(np.asarray(g_col[kk]) - np.asarray(g_row[kk])).max()
            assert d < tol_g, (exp_map_type, nat, kk, d)


def test_disable_columns_env_kill_switch(monkeypatch):
    """JAMMY_DISABLE_COLUMNS forces the row path WITHOUT touching private
    cache internals (the purpose-built kill-switch, models/pdf.py _cols_ok)
    - and the two paths agree through the public API."""
    p = pdf("s1", "oo")
    params = p.init_params(seed=0)
    assert p._cols_ok(0, "density")
    x = jnp.asarray(np.random.default_rng(0).uniform(0.1, 6.1, (64, 1)))
    lp_col = p.log_prob(params, x)[0]

    monkeypatch.setenv("JAMMY_DISABLE_COLUMNS", "1")
    p2 = pdf("s1", "oo")
    assert not p2._cols_ok(0, "density")
    lp_row = p2.log_prob(params, x)[0]
    np.testing.assert_allclose(np.asarray(lp_col), np.asarray(lp_row),
                               atol=1e-11, rtol=0)
