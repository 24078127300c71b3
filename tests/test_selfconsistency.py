"""Core correctness oracle: sample -> log_prob roundtrip self-consistency.

Port of the reference's workhorse test strategy
(/root/reference/tests/test_general.py:393-588): for each flow config, draw
samples, evaluate their log-probability, and assert that the log-probs and
base-space positions computed in the two directions agree.  Non-conditional
and conditional variants, float64.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from jammy_flows_tpu import pdf


def roundtrip(p, params, key, cond=None, n=100, tol=1e-7):
    if cond is not None:
        sample_fn = jax.jit(lambda pp, k, ci: p.sample(pp, k, conditional_input=ci))
        logp_fn = jax.jit(lambda pp, xx, ci: p.log_prob(pp, xx, conditional_input=ci))
        x, z, logp_s, logb_s = sample_fn(params, key, cond)
        logp, logb, base = logp_fn(params, x, cond)
    else:
        sample_fn = jax.jit(lambda pp, k: p.sample(pp, k, samplesize=n))
        logp_fn = jax.jit(lambda pp, xx: p.log_prob(pp, xx))
        x, z, logp_s, logb_s = sample_fn(params, key)
        logp, logb, base = logp_fn(params, x)

    assert bool(jnp.isfinite(x).all()), "non-finite samples"
    assert bool(jnp.isfinite(logp).all()), "non-finite log-probs"
    np.testing.assert_allclose(np.asarray(logp_s), np.asarray(logp), atol=tol,
                               err_msg="logp roundtrip mismatch")
    np.testing.assert_allclose(np.asarray(z), np.asarray(base), atol=tol,
                               err_msg="base position roundtrip mismatch")
    np.testing.assert_allclose(np.asarray(logb_s), np.asarray(logb), atol=tol,
                               err_msg="base logp roundtrip mismatch")


# (name, pdf_defs, flow_defs, options)
CONFIGS = [
    ("gf_default", "e2", "gg", {}),
    ("gf_full_pade", "e2", "g", {"g": {"inverse_function_type": "inormal_full_pade"}}),
    ("gf_partly_precise", "e2", "g",
     {"g": {"inverse_function_type": "inormal_partly_precise"}}),
    ("gf_partly_crude", "e2", "g",
     {"g": {"inverse_function_type": "inormal_partly_crude"}}),
    ("gf_rot_angles", "e2", "g", {"g": {"rotation_mode": "angles"}}),
    ("gf_rot_cayley", "e2", "g", {"g": {"rotation_mode": "cayley"}}),
    ("gf_rot_triangular", "e2", "g",
     {"g": {"rotation_mode": "triangular_combination"}}),
    ("gf_rot_none", "e2", "g", {"g": {"rotation_mode": "none"}}),
    ("gf_rq_splines", "e2", "g", {"g": {"nonlinear_stretch_type": "rq_splines"}}),
    ("gf_skewness", "e2", "g", {"g": {"add_skewness": 1}}),
    ("gf_no_norm", "e2", "g", {"g": {"fit_normalization": 0}}),
    ("gf_center_mean", "e2", "g", {"g": {"center_mean": 1}}),
    ("gf_softplus_width", "e2", "g", {"g": {"softplus_for_width": 1}}),
    ("gf_e1", "e1", "gg", {}),
    ("gf_old_h", "e2", "h", {}),
    ("mvn_full", "e4", "t", {"t": {"cov_type": "full"}}),
    ("mvn_diagonal", "e4", "t", {"t": {"cov_type": "diagonal"}}),
    ("mvn_diag_sym", "e4", "t", {"t": {"cov_type": "diagonal_symmetric"}}),
    ("mvn_identity", "e4", "t", {"t": {"cov_type": "identity"}}),
    ("eucl_identity", "e2", "x", {}),
    ("moebius", "s1", "m", {}),
    ("moebius_natural", "s1", "m", {"m": {"natural_direction": 1}}),
    ("moebius_rotation", "s1", "m", {"m": {"add_rotation": 1}}),
    ("circ_spline_smooth", "s1", "o", {}),
    ("circ_spline_nonsmooth", "s1", "oo",
     {"o": {"smooth_second_derivative": 0, "num_basis_functions": 5}}),
    ("circ_spline_fixed_bd", "s1", "o",
     {"o": {"smooth_second_derivative": 0, "num_basis_functions": 4,
            "fix_boundary_derivatives": 1.0}}),
    ("sphere_identity_s1", "s1", "y", {}),
    ("interval_rq", "i1", "r", {}),
    ("interval_rq_bounds", "i1_-1.0_1.0", "rr", {}),
    ("interval_rq_smooth", "i1", "r",
     {"r": {"smooth_second_derivative": 1, "num_basis_functions": 2}}),
    ("interval_rq_reduced", "i1", "r",
     {"r": {"fix_first_width_n_height_to_zero": 1,
            "independent_width_height_parametrization": 1}}),
    ("interval_identity", "i1", "z", {}),
    ("multi_euclidean", "e1+e2+e1", "g+g+g", {}),
    ("joint_e2_s1", "e2+s1", "gg+m", {}),
    ("joint_e2_i1", "e2+i1", "g+r", {}),
    # S2 vMF flow (f) option grid
    ("fvm_basic", "s2", "f", {}),
    ("fvm_stack", "s2", "ff", {}),
    ("fvm_vert_circ", "s2", "f",
     {"f": {"add_vertical_rq_spline_flow": 1, "add_circular_rq_spline_flow": 1,
            "vertical_smooth": 1, "spline_num_basis_functions": -1}}),
    ("fvm_correlated", "s2", "f", {"f": {"add_correlated_rq_spline_flow": 1}}),
    ("fvm_boundary", "s2", "f",
     {"f": {"add_vertical_rq_spline_flow": 1,
            "boundary_cos_theta_identity_region": 0.1}}),
    ("fvm_rot_angles", "s2", "f", {"f": {"rotation_mode": "angles"}}),
    ("fvm_rot_xyz_mu", "s2", "f",
     {"f": {"rotation_mode": "xyz", "kappa_prediction": "mu"}}),
    ("fvm_rot_quat_quatvec", "s2", "f",
     {"f": {"rotation_mode": "quaternion", "kappa_prediction": "quatvec_squared"}}),
    ("fvm_kappa_softplus", "s2", "f",
     {"f": {"kappa_prediction": "softplus_real_bounded"}}),
    ("fvm_extra_rotation", "s2", "f",
     {"f": {"add_extra_rotation_inbetween": 1}}),
    ("sphere_identity_s2", "s2", "y", {}),
    # simplex flows
    ("simplex_w_1d", "a1", "w", {}),
    ("simplex_w_2d", "a2", "w", {}),
    ("simplex_w_3d", "a3", "w", {}),
    ("simplex_u_1d", "a1", "u", {}),
    ("simplex_u_2d", "a2", "u", {}),
    ("simplex_u_3d", "a3", "u", {}),
    # flagship joint
    ("flagship", "e4+s2+e4", "gg+f+gg", {}),
    # manifold CNF (reference tolerance 3e-4; ours converges to ~1e-6)
    ("cnf", "s2", "c", {"c": {"num_charts": 4, "cnf_network_hidden_dims": "32"}}),
]

# exp-map flows are heavier (while_loop + jacfwd in f64); non-conditional only
V_CONFIGS = [
    ("v_exponential", "s2", "v", {"v": {"exp_map_type": "exponential"}}),
    ("v_exponential_nat", "s2", "v",
     {"v": {"exp_map_type": "exponential", "natural_direction": 1}}),
    ("v_linear", "s2", "v", {"v": {"exp_map_type": "linear"}}),
    ("v_quadratic", "s2", "v", {"v": {"exp_map_type": "quadratic"}}),
    ("v_splines", "s2", "v", {"v": {"exp_map_type": "splines"}}),
    ("v_hh_mean", "s2", "v", {"v": {"mean_parametrization": "householder"}}),
]


@pytest.mark.parametrize("name,pdf_defs,flow_defs,opts",
                         V_CONFIGS, ids=[c[0] for c in V_CONFIGS])
def test_roundtrip_expmap(name, pdf_defs, flow_defs, opts):
    p = pdf(pdf_defs, flow_defs, options_overwrite=opts)
    params = p.init_params(seed=44)
    # reference tolerance for `v` is 1e-4 (test_general.py:482-494)
    roundtrip(p, params, jax.random.PRNGKey(2), n=40, tol=1e-4)


@pytest.mark.parametrize("name,pdf_defs,flow_defs,opts",
                         V_CONFIGS, ids=[c[0] for c in V_CONFIGS])
def test_roundtrip_expmap_conditional(name, pdf_defs, flow_defs, opts):
    """Conditional exp-map roundtrips: amortized slabs feed the column
    sphere-Newton solver, exactly where a slicing/transpose bug would hide
    (reference sweeps conditional variants for every config,
    test_general.py:341-352 with conditional at :429)."""
    p = pdf(pdf_defs, flow_defs, options_overwrite=opts,
            conditional_input_dim=2)
    params = p.init_params(seed=45)
    cond = jax.random.normal(jax.random.PRNGKey(9), (40, 2),
                             dtype=jnp.float64) * 100.0
    roundtrip(p, params, jax.random.PRNGKey(3), cond=cond, tol=1e-4)


def _tol_for(name):
    # the CNF uses a numerical ODE solve: reference tolerance is 3e-4
    # (test_general.py:482-494); ours typically reaches ~1e-6
    return 1e-4 if name.startswith("cnf") else 1e-7


@pytest.mark.parametrize("name,pdf_defs,flow_defs,opts",
                         CONFIGS, ids=[c[0] for c in CONFIGS])
def test_roundtrip_nonconditional(name, pdf_defs, flow_defs, opts):
    p = pdf(pdf_defs, flow_defs, options_overwrite=opts)
    params = p.init_params(seed=42)
    roundtrip(p, params, jax.random.PRNGKey(0), tol=_tol_for(name))


@pytest.mark.parametrize("name,pdf_defs,flow_defs,opts",
                         CONFIGS, ids=[c[0] for c in CONFIGS])
def test_roundtrip_conditional(name, pdf_defs, flow_defs, opts):
    p = pdf(pdf_defs, flow_defs, options_overwrite=opts,
            conditional_input_dim=2)
    params = p.init_params(seed=43)
    # scaled conditional inputs stress the MLP path (test_general.py:429)
    cond = jax.random.normal(jax.random.PRNGKey(7), (50, 2),
                             dtype=jnp.float64) * 100.0
    roundtrip(p, params, jax.random.PRNGKey(1), cond=cond, tol=_tol_for(name))


def test_sampling_does_not_mutate_inputs():
    """JAX arrays are immutable by construction; check log_det is fresh."""
    p = pdf("e2", "gg")
    params = p.init_params(seed=0)
    x, z, lp, lb = p.sample(params, jax.random.PRNGKey(0), samplesize=10)
    x2, z2, lp2, lb2 = p.sample(params, jax.random.PRNGKey(0), samplesize=10)
    np.testing.assert_array_equal(np.asarray(x), np.asarray(x2))


def test_param_counts_match_layers():
    p = pdf("e2+s1", "gg+m")
    for k, layers in enumerate(p.layer_list):
        assert sum(p.num_parameter_list[k]) == sum(l.num_params for l in layers)


def test_conditional_multi_encoding():
    p = pdf("e2+s1", "g+m", conditional_input_dim=[3, 2])
    params = p.init_params(seed=0)
    ci = [jax.random.normal(jax.random.PRNGKey(1), (20, 3), dtype=jnp.float64),
          jax.random.normal(jax.random.PRNGKey(2), (20, 2), dtype=jnp.float64)]
    roundtrip(p, params, jax.random.PRNGKey(3), cond=ci)


def test_amortize_everything():
    p = pdf("e2", "gg", amortization_mlp_use_custom_mode=True,
            amortize_everything=True)
    n_am = p.total_number_amortizable_params
    assert n_am == sum(p.num_parameter_list[0])
    amort = jax.random.normal(jax.random.PRNGKey(0), (30, n_am),
                              dtype=jnp.float64) * 0.1
    x, z, lp, lb = p.sample({}, jax.random.PRNGKey(1), samplesize=30,
                            amortization_parameters=amort)
    logp, logb, base = p.log_prob({}, x, amortization_parameters=amort)
    np.testing.assert_allclose(np.asarray(lp), np.asarray(logp), atol=1e-7)


def test_poisson_log_lambda():
    p = pdf("e2", "gg", conditional_input_dim=2, predict_log_normalization=True,
            join_poisson_and_pdf_description=True)
    params = p.init_params(seed=0)
    ci = jax.random.normal(jax.random.PRNGKey(0), (10, 2), dtype=jnp.float64)
    ll = p.log_mean_poisson(params, conditional_input=ci)
    assert ll.shape == (10, 1)
    roundtrip(p, params, jax.random.PRNGKey(1), cond=ci)


def test_fully_amortized():
    from jammy_flows_tpu import fully_amortized_pdf
    p = fully_amortized_pdf("e2", "g", conditional_input_dim=3)
    params = p.init_params(seed=0)
    ci = jax.random.normal(jax.random.PRNGKey(0), (15, 3), dtype=jnp.float64)
    x, z, lp, lb = p.sample(params, jax.random.PRNGKey(1), conditional_input=ci)
    logp, logb, base = p.log_prob(params, x, conditional_input=ci)
    np.testing.assert_allclose(np.asarray(lp), np.asarray(logp), atol=1e-7)
