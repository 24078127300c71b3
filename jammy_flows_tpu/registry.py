"""Flow registry: DSL symbol -> layer class, manifold type, validated options.

TPU-native equivalent of the reference flow_options.py:25-287.  Every symbol
and option key of the reference registry is reproduced; validators are the
same (value lists or predicates).  Layer classes are imported lazily so that
heavyweight modules only load when used.
"""
from __future__ import annotations

import copy


def _positive(x):
    return x > 0


def _pos_or_minus_one(x):
    return (x == -1) or (x > 0)


def _posf_or_minus_one(x):
    return (x == -1.0) or (x > 0.0)


_BOOL = [0, 1]

# symbol -> (manifold_type, module_path, class_name, {opt: (default, validator)})
OPTS = {
    # ----- Euclidean -----
    "g": ("e", "jammy_flows_tpu.layers.euclidean", "GaussianizationFlow", {
        "fit_normalization": (1, _BOOL),
        "num_householder_iter": (-1, _pos_or_minus_one),
        "num_kde": (10, _positive),
        "inverse_function_type": ("isigmoid", ["isigmoid", "inormal_partly_precise",
                                               "inormal_full_pade", "inormal_partly_crude"]),
        "replace_first_sigmoid_with_icdf": (1, _BOOL),
        "skip_model_offset": (0, _BOOL),
        "softplus_for_width": (0, _BOOL),
        "upper_bound_for_widths": (100, _pos_or_minus_one),
        "lower_bound_for_widths": (0.01, _positive),
        "upper_bound_for_norms": (10, _pos_or_minus_one),
        "lower_bound_for_norms": (1, _positive),
        "center_mean": (0, _BOOL),
        "clamp_widths": (0, _BOOL),
        "width_smooth_saturation": (1, _BOOL),
        "regulate_normalization": (1, _BOOL),
        "add_skewness": (0, _BOOL),
        "rotation_mode": ("householder", ["householder", "triangular_combination",
                                          "angles", "cayley", "none"]),
        "nonlinear_stretch_type": ("classic", ["classic", "rq_splines"]),
        # TPU-side extension (no reference counterpart): extra float64
        # Newton steps refining the f32 sampling solve for tail-critical
        # workloads.  Requires jax_enable_x64; see docs/suggested_settings.md.
        "high_precision_tail_newton": (0, lambda x: isinstance(x, int)
                                       and x >= 0),
    }),
    # "h" is the reference's deprecated older GF implementation; regression
    # tests in the reference show g/h equivalence, so both map to the same
    # TPU kernel (flow_options.py:56-73).
    "h": ("e", "jammy_flows_tpu.layers.euclidean", "GaussianizationFlow", {
        "fit_normalization": (1, _BOOL),
        "num_householder_iter": (-1, _pos_or_minus_one),
        "num_kde": (10, _positive),
        "inverse_function_type": ("isigmoid", ["isigmoid", "inormal_partly_precise",
                                               "inormal_full_pade", "inormal_partly_crude"]),
        "replace_first_sigmoid_with_icdf": (1, _BOOL),
        "skip_model_offset": (0, _BOOL),
        "softplus_for_width": (0, _BOOL),
        "upper_bound_for_widths": (100, _pos_or_minus_one),
        "lower_bound_for_widths": (0.01, _positive),
        "clamp_widths": (0, _BOOL),
        "width_smooth_saturation": (1, _BOOL),
        "regulate_normalization": (1, _BOOL),
        "add_skewness": (0, _BOOL),
    }),
    "t": ("e", "jammy_flows_tpu.layers.euclidean", "MultivariateNormal", {
        "skip_model_offset": (0, _BOOL),
        "softplus_for_width": (0, _BOOL),
        "upper_bound_for_widths": (100, _pos_or_minus_one),
        "lower_bound_for_widths": (0.01, _positive),
        "clamp_widths": (0, _BOOL),
        "width_smooth_saturation": (1, _BOOL),
        "cov_type": ("diagonal", ["identity", "diagonal_symmetric", "diagonal", "full"]),
    }),
    "x": ("e", "jammy_flows_tpu.layers.euclidean", "EuclideanIdentity", {
        "add_offset": (0, _BOOL),
    }),
    # ----- S1 -----
    "m": ("s", "jammy_flows_tpu.layers.sphere", "Moebius", {
        "add_rotation": (0, _BOOL),
        "num_basis_functions": (5, _positive),
        "natural_direction": (0, _BOOL),
    }),
    "o": ("s", "jammy_flows_tpu.layers.sphere", "CircularRQSpline", {
        "add_rotation": (1, _BOOL),
        "num_basis_functions": (2, _positive),
        "natural_direction": (1, _BOOL),
        "fix_boundary_derivatives": (-1.0, _posf_or_minus_one),
        "smooth_second_derivative": (1, _BOOL),
        "fix_first_width_n_height_to_zero": (0, _BOOL),
        "also_fix_second_width_to_zero": (0, _BOOL),
        "independent_width_height_parametrization": (0, _BOOL),
        "min_width": (1e-4, _positive),
        "min_height": (1e-4, _positive),
        "min_derivative": (1e-4, _positive),
    }),
    # ----- S2 -----
    "v": ("s", "jammy_flows_tpu.layers.sphere_s2", "ExponentialMapS2", {
        "exp_map_type": ("exponential", ["linear", "quadratic", "splines", "exponential"]),
        "num_components": (10, _positive),
        "natural_direction": (0, _BOOL),
        "add_rotation": (0, _BOOL),
        "max_num_newton_iter": (1000, _positive),
        "mean_parametrization": ("old", ["old", "householder"]),
    }),
    "c": ("s", "jammy_flows_tpu.layers.sphere_cnf", "CNFSphereCharts", {
        "num_charts": (4, _positive),
        "cnf_network_hidden_dims": ("32", lambda x: isinstance(x, str)),
        "cnf_network_highway_mode": (0, [0, 1, 2, 3, 4]),
        "cnf_network_rank": (-1, _pos_or_minus_one),
        "solver": ("dopri5", ["rk4", "dopri5", "dopri8", "bosh3", "fehlberg2",
                              "adaptive_heun", "euler", "midpoint"]),
        "rtol": (1e-7, lambda x: (x > 0) & (x < 1)),
        "atol": (1e-7, lambda x: (x > 0) & (x < 1)),
        "step_size": (1.0 / 32.0, _positive),
    }),
    "f": ("s", "jammy_flows_tpu.layers.sphere_s2", "FisherVonMises2D", {
        "add_vertical_rq_spline_flow": (0, _BOOL),
        "add_circular_rq_spline_flow": (0, _BOOL),
        "add_correlated_rq_spline_flow": (0, _BOOL),
        "circular_flow_defs": ("oo", lambda x: isinstance(x, str)),
        "vertical_flow_defs": ("rr", lambda x: isinstance(x, str)),
        "correlated_max_rank": (3, lambda x: x >= 0),
        "inverse_z_scaling": (1, _BOOL),
        "boundary_cos_theta_identity_region": (0.0, lambda x: (x >= 0) & (x < 1)),
        "spline_num_basis_functions": (5, lambda x: (x > 0) | (x == -1)),
        "vertical_smooth": (0, _BOOL),
        "vertical_restrict_max_min_width_height_ratio": (-1.0, _posf_or_minus_one),
        "vertical_fix_boundary_derivative": (1, _BOOL),
        "vertical_fix_first_width_n_height_to_zero": (0, _BOOL),
        "vertical_also_fix_second_width_to_zero": (0, _BOOL),
        "vertical_independent_width_height_parametrization": (0, _BOOL),
        "circular_add_rotation": (0, _BOOL),
        "min_kappa": (1e-10, _positive),
        "kappa_prediction": ("direct_log_real_bounded",
                             ["direct_log_real_bounded", "softplus_real_bounded",
                              "log_bounded", "mu", "mu_squared", "quatvec",
                              "quatvec_squared"]),
        "add_extra_rotation_inbetween": (0, _BOOL),
        "add_rotation": (1, _BOOL),
        "rotation_mode": ("householder", ["householder", "angles", "xyz", "quaternion"]),
        "kappa_clamping": (0, _BOOL),
        "num_householder_iter": (-1, _pos_or_minus_one),
    }),
    "y": ("s", "jammy_flows_tpu.layers.sphere", "SphericalIdentity", {
        "add_rotation": (0, _BOOL),
    }),
    # ----- Interval -----
    "r": ("i", "jammy_flows_tpu.layers.interval", "RQSplineInterval", {
        "num_basis_functions": (5, _positive),
        "fix_boundary_derivatives": (-1.0, _posf_or_minus_one),
        "smooth_second_derivative": (0, lambda x: isinstance(x, int) and x >= 0),
        "restrict_max_min_width_height_ratio": (-1.0, _posf_or_minus_one),
        "fix_first_width_n_height_to_zero": (0, _BOOL),
        "also_fix_second_width_to_zero": (0, _BOOL),
        "independent_width_height_parametrization": (0, _BOOL),
        "min_width": (1e-4, _positive),
        "min_height": (1e-4, _positive),
        "min_derivative": (1e-4, _positive),
    }),
    "z": ("i", "jammy_flows_tpu.layers.interval", "IntervalIdentity", {}),
    # ----- Simplex -----
    "u": ("a", "jammy_flows_tpu.layers.simplex", "GumbelSoftmax", {}),
    "w": ("a", "jammy_flows_tpu.layers.simplex", "InnerLoopSimplex", {}),
}


def obtain_default_options(flow_abbreviation):
    """Default option dict for a flow symbol (flow_options.py:242-257)."""
    assert flow_abbreviation in OPTS, \
        f"Unknown flow abbreviation for default options: {flow_abbreviation}"
    return {k: v[0] for k, v in OPTS[flow_abbreviation][3].items()}


def check_flow_option(flow_abbreviation, opt_name, opt_val):
    """Validate a configured option (flow_options.py:259-274)."""
    assert flow_abbreviation in OPTS, \
        f"flow abbreviation {flow_abbreviation} not found in options dict"
    opts = OPTS[flow_abbreviation][3]
    assert opt_name in opts, \
        f"option name {opt_name} not found in defined options for flow {flow_abbreviation}"
    validator = opts[opt_name][1]
    if callable(validator):
        assert validator(opt_val), \
            f"Validation of option {opt_name} failed with value {opt_val}"
    else:
        assert opt_val in validator, \
            f"Option {opt_name}={opt_val} not in allowed set {validator}"


def manifold_type(flow_abbreviation):
    return OPTS[flow_abbreviation][0]


def get_layer_class(flow_abbreviation):
    import importlib
    _, module_path, class_name, _ = OPTS[flow_abbreviation]
    mod = importlib.import_module(module_path)
    return getattr(mod, class_name)
