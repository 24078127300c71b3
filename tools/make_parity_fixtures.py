"""One-time generator for frozen reference-parity fixtures.

For a pruned version of the reference's test_general.py:116-391 option grid
(all 14 flow symbols — 13 at 1e-6-to-1e-10 tolerance, `c` at the
reference's own 3e-4 ODE-solver tolerance — and >=4 GF option combos), this
drives the PyTorch reference (/root/reference) at float64, copies its exact
init parameters
into the repo's flat slabs, validates that both frameworks agree pointwise,
and freezes the reference's outputs into tests/fixtures/parity_<name>.npz:

  * x_eval + logprob_ref     — log_prob at the reference's own samples
  * z_base + x_fwd_ref + logpdf_target_ref — the base->target sample map

tests/test_reference_fixtures.py then re-asserts the repo against these
frozen outputs WITHOUT torch, so any numerics regression shows up in CI as
a *reference* deviation, not just a roundtrip failure (SURVEY.md section 4).

Run: PYTHONPATH=/root/repo python tools/make_parity_fixtures.py [name ...]
"""
import json
import os
import pathlib
import sys

import numpy as np

sys.path.insert(0, "/root/reference")
os.environ["JAX_PLATFORMS"] = "cpu"

import torch                                   # noqa: E402

# torchdiffeq is not installed in this image; inject the fixed-grid shim so
# the reference's `c` CNF layer runs (its own chart/divergence/packing code
# unmodified — only the generic time stepper is replaced; see the shim
# docstring for why rk4 is the 3/8 rule there, a DIFFERENT scheme from ours).
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import torchdiffeq_shim                        # noqa: E402
sys.modules.setdefault("torchdiffeq", torchdiffeq_shim)

import jammy_flows                             # noqa: E402  (the reference)

import jax                                     # noqa: E402
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp                        # noqa: E402
from jammy_flows_tpu import pdf as jpdf        # noqa: E402

torch.set_num_threads(4)

FIXTURE_DIR = pathlib.Path(__file__).resolve().parent.parent / "tests" / \
    "fixtures"

N_PTS = 128

# (name, defs, flows, options_overwrite, cond_dim, tolerance)
# tolerance is the frozen-assertion atol on log-probs; iterative-inverse
# flows (m, v, f-default z-inverse) get a little slack over the
# closed-form ones.
VERT_CIRC = {"f": {"add_vertical_rq_spline_flow": 1,
                   "add_circular_rq_spline_flow": 1,
                   "circular_add_rotation": 0,
                   "vertical_fix_first_width_n_height_to_zero": 1}}
CONFIGS = [
    ("e1_g", "e1", "g", {}, None, 1e-8),
    ("e3_gg_angles", "e3", "gg", {"g": {"rotation_mode": "angles"}},
     None, 1e-8),
    ("e2_gg_skew", "e2", "gg", {"g": {"add_skewness": 1}}, None, 1e-8),
    ("e2_g_rqsplines", "e2", "g",
     {"g": {"nonlinear_stretch_type": "rq_splines"}}, None, 1e-8),
    ("e2_g_pade", "e2", "g",
     {"g": {"inverse_function_type": "inormal_full_pade"}}, None, 1e-7),
    ("e2_hh", "e2", "hh", {}, None, 1e-8),
    ("e10_t_full", "e10", "t", {"t": {"cov_type": "full"}}, None, 1e-8),
    ("e4_t_diag", "e4", "t", {"t": {"cov_type": "diagonal"}}, None, 1e-8),
    ("e2_x_offset", "e2", "x", {"x": {"add_offset": 1}}, None, 1e-10),
    ("s1_m", "s1", "m", {}, None, 1e-7),
    ("s1_o", "s1", "o", {}, None, 1e-8),
    ("s1_o_nonsmooth", "s1", "o",
     {"o": {"smooth_second_derivative": 0, "num_basis_functions": 4}},
     None, 1e-8),
    ("s1_y", "s1", "y", {}, None, 1e-10),
    ("s2_v_linear", "s2", "v", {"v": {"exp_map_type": "linear"}},
     None, 1e-6),
    ("s2_v_exponential", "s2", "v",
     {"v": {"exp_map_type": "exponential", "natural_direction": 1}},
     None, 1e-6),
    # conditional `v`: amortized slabs feed the column sphere-Newton solver
    # (VERDICT r4 item 4 - a slicing/transpose bug would hide exactly here)
    ("s2_v_cond_exp", "s2", "v", {"v": {"exp_map_type": "exponential"}},
     2, 1e-6),
    ("s2_v_cond_splines", "s2", "v", {"v": {"exp_map_type": "splines"}},
     2, 1e-6),
    # `c` runs the reference's default fixed-step rk4 (charts hardcoded to 4
    # in its active _forward, cnf_sphere_charts.py:224); the reference steps
    # with the 3/8 rule (torchdiffeq convention, see tools/torchdiffeq_shim
    # .py) while we step classic RK4, so the frozen tolerance is the
    # ODE-solver tolerance of the reference's own `c` test (3e-4,
    # /root/reference/tests/test_general.py:482-494), not 1e-8-class.
    ("s2_c", "s2", "c", {"c": {"solver": "rk4"}}, None, 3e-4),
    ("s2_f_default", "s2", "f", {}, None, 1e-7),
    ("s2_ff_vertcirc", "s2", "ff", VERT_CIRC, None, 1e-7),
    ("s2_f_boundary", "s2", "f",
     {"f": dict(VERT_CIRC["f"], boundary_cos_theta_identity_region=0.4)},
     None, 1e-7),
    ("i1_r", "i1_-1.0_1.0", "r", {}, None, 1e-8),
    ("i1_z", "i1_0.0_1.0", "z", {}, None, 1e-10),
    ("a1_w", "a1", "w", {}, None, 1e-7),
    # NOTE 'u': the torch reference's OWN sample()-returned log-pdf
    # disagrees with its own log_prob at the same points by ~1e2
    # (gumbel_softmax.flow_mapping log_det bug, layers/simplex/
    # gumbel_softmax.py:318-377 - it even leaves a debug print at :304).
    # We freeze log_prob + the forward map, and skip the forward-log-pdf
    # bridge; the repo's forward/inverse consistency is covered by
    # tests/test_selfconsistency.py.
    ("a1_u", "a1", "u", {}, None, 1e-7),
    # higher-dimensional simplex chains: exercise the generic M/M^- basis
    # projection and box/Gumbel chains beyond d=2 (VERDICT r4 item 5;
    # reference simplex_base.py:25-36 is generic in a<n>)
    ("a3_w", "a3", "w", {}, None, 1e-7),
    ("a2_u", "a2", "u", {}, None, 1e-7),
    ("a2_w_cond", "a2", "w", {}, 2, 1e-7),
    ("cond_e1e2", "e1+e2", "gg+g", {}, 3, 1e-8),
    ("joint_e2s1", "e2+s1", "gg+o", {}, None, 1e-8),
    # AmortizableMLP-path fixtures (amortization_mlp_use_custom_mode=1): the
    # packed u/v/b conventions of the custom MLP class vs the reference's
    # (amortizable_mlp.py:251, single packed u_v_b_pars vector).  Grid from
    # the reference's own sweep (/root/reference/tests/test_general.py:
    # 300-337: dims "64-30", ranks "2-10-1000" smart-fallback) plus one
    # highway-mode config the grid leaves at default.
    ("cond_custom_full", "e1+e2+s1", "gg+g+m", {}, 2, 1e-8,
     {"amortization_mlp_use_custom_mode": True,
      "amortization_mlp_dims": "64-30"}),
    ("cond_custom_lowrank", "e1+e2+s1", "gg+g+m", {}, 2, 1e-8,
     {"amortization_mlp_use_custom_mode": True,
      "amortization_mlp_dims": "64-30",
      "amortization_mlp_ranks": "2-10-1000"}),
    ("cond_custom_hw1", "e1+e2", "gg+g", {}, 3, 1e-8,
     {"amortization_mlp_use_custom_mode": True,
      "amortization_mlp_dims": "32",
      "amortization_mlp_highway_mode": 1}),
    # fully_amortized_pdf (reference main/fully_amortized.py:22-278): one
    # outer low-rank MLP (reference default rank 5) predicts the ENTIRE
    # inner amortize_everything parameter vector, inner MLPs highway mode 1.
    ("fa_e2s1", "e2+s1", "gg+o", {}, 3, 1e-8,
     {"__fully_amortized__": True,
      "inner_mlp_dims_sub_pdfs": "16",
      "amortization_mlp_dims": "32"}),
]


# Per-fixture handling of DOCUMENTED reference bugs (verified 2026-08-21,
# /tmp-class scripts reproduced in the commit message; PARITY.md "Known
# deviations"):
#  * forward-log-pdf bridge skipped where the reference's own sample()
#    log-pdf contradicts its own log_prob: the gumbel 'u' flows (log-det
#    axis bug, gumbel_softmax.py:372) and conditional 'w' at d>=2
#    (~O(1) self-inconsistency; the repo's two directions agree to 1e-7 in
#    tests/test_selfconsistency.py).
#  * a3_w logprob shifted by +log(2): the reference's skew-box forward
#    log-det inconsistency (simplex_base.py box_to_skewed_box) becomes a
#    real 2^(d-2) density-normalization error at d>=3 — its a3 'w' density
#    integrates to 0.538 over the simplex while the repo's integrates to
#    0.9990 +- 0.0009 (400k-point MC, uniform Dirichlet).
import math

SKIP_FWD_LOGPDF = {"a1_u", "a2_u", "a2_w_cond", "a3_w"}
LOGPROB_SHIFT = {"a3_w": math.log(2.0)}


def copy_ref_params(p_ref, params):
    """Overwrite the repo's trainable pytree with the torch reference's
    exact init values (tools/parity_check.py:93-123; the flat packing
    conventions mirror the reference's parameter registration order)."""
    params = dict(params)
    if "flow_0" in params:
        vec = np.concatenate(
            [q.detach().numpy().ravel()
             for q in p_ref.layer_list[0].parameters()] or
            [np.zeros(0)])
        assert vec.size == np.asarray(params["flow_0"]).size, \
            (vec.size, np.asarray(params["flow_0"]).size)
        params["flow_0"] = jnp.asarray(vec)
    for k, mlp in enumerate(p_ref.mlp_predictors):
        key = f"mlp_{k}"
        if mlp is None or key not in params:
            continue
        vec = np.concatenate([q.detach().numpy().ravel()
                              for q in mlp.parameters()])
        assert vec.size == np.asarray(params[key]).size, \
            (key, vec.size, np.asarray(params[key]).size)
        params[key] = jnp.asarray(vec)
    return params


def make_fixture(name, defs, flows, opts, cond_dim, tol, pdf_kwargs=None):
    print(f"[{name}] {defs}/{flows} opts={opts} cond={cond_dim} "
          f"pdf_kwargs={pdf_kwargs}", flush=True)
    torch.manual_seed(7)
    pdf_kwargs = dict(pdf_kwargs or {})
    fully_amortized = pdf_kwargs.pop("__fully_amortized__", False)
    kwargs = {"options_overwrite": opts, **pdf_kwargs}
    if cond_dim is not None:
        kwargs["conditional_input_dim"] = cond_dim
    ctor_ref = jammy_flows.fully_amortized_pdf if fully_amortized \
        else jammy_flows.pdf
    p_ref = ctor_ref(defs, flows, **kwargs)
    p_ref.double()

    from jammy_flows_tpu import fully_amortized_pdf as j_fa
    ctor = j_fa if fully_amortized else jpdf
    p = ctor(defs, flows, options_overwrite=opts,
             conditional_input_dim=cond_dim, **pdf_kwargs)
    if fully_amortized:
        # the reference registers exactly ONE parameter tensor: the outer
        # amortization MLP's packed u_v_b vector (fully_amortized.py:108)
        vec = np.concatenate([q.detach().numpy().ravel()
                              for q in p_ref.parameters()])
        params = dict(p.init_params(seed=0))
        assert vec.size == np.asarray(params["outer_mlp"]).size, \
            (vec.size, np.asarray(params["outer_mlp"]).size)
        params["outer_mlp"] = jnp.asarray(vec)
    else:
        params = copy_ref_params(p_ref, p.init_params(seed=0))

    ci_np = None
    ci_t = None
    ci_j = None
    if cond_dim is not None:
        ci_np = np.random.default_rng(3).normal(
            size=(N_PTS, cond_dim)).astype(np.float64)
        ci_t = torch.from_numpy(ci_np)
        ci_j = jnp.asarray(ci_np)

    with torch.no_grad():
        if ci_t is None:
            # dtype/device explicit: parameterless flows (y/z/x) cannot
            # infer them from parameters
            x_ref, z_ref, lp_t_ref, lp_b_ref = p_ref.sample(
                samplesize=N_PTS, seed=11, dtype=torch.float64,
                device=torch.device("cpu"))
        else:
            x_ref, z_ref, lp_t_ref, lp_b_ref = p_ref.sample(
                conditional_input=ci_t, seed=11)
        lp_eval_ref, _, _ = p_ref(x_ref) if ci_t is None else \
            p_ref(x_ref, conditional_input=ci_t)

    x_ref = x_ref.numpy()
    z_ref = z_ref.numpy()
    lp_t_ref = lp_t_ref.numpy()
    lp_b_ref = lp_b_ref.numpy()
    lp_eval_ref = lp_eval_ref.numpy()

    # validate the repo against the reference BEFORE freezing
    lp_ours, _, _ = p.log_prob(params, jnp.asarray(x_ref),
                               conditional_input=ci_j)
    d_lp = np.abs(np.asarray(lp_ours) - lp_eval_ref).max()

    ld0 = jnp.zeros(N_PTS, dtype=jnp.float64)
    x_fwd, ld = p.all_layer_forward(params, jnp.asarray(z_ref), ld0, ci_j)
    d_fwd = np.abs(np.asarray(x_fwd) - x_ref).max()
    # base log-pdf from the reference (normal for e/s/i sub-manifolds,
    # gumbel for 'u' simplex flows - don't assume)
    lp_fwd_ours = lp_b_ref - np.asarray(ld)
    d_lpt = np.abs(lp_fwd_ours - lp_t_ref).max()
    # 'u' (and 'w' at d>=2 conditional): the reference's own sample log-pdf
    # contradicts its own log_prob (see CONFIGS note + the a3_w note below);
    # skip the forward-log-pdf bridge there
    skip_fwd_logpdf = name in SKIP_FWD_LOGPDF
    # documented reference log-det bugs: the frozen values are the
    # reference's outputs SHIFTED by the correction (PARITY.md "Known
    # deviations"); validation asserts the repo matches the corrected value
    shift = LOGPROB_SHIFT.get(name, 0.0)
    if shift:
        lp_eval_ref = lp_eval_ref + shift
        d_lp = np.abs(np.asarray(lp_ours) - lp_eval_ref).max()
    print(f"  |dlogprob|={d_lp:.2e}{' (shifted)' if shift else ''}  "
          f"|dforward|={d_fwd:.2e}  "
          f"|dlogpdf_fwd|={d_lpt:.2e}{' (skipped)' if skip_fwd_logpdf else ''}"
          f"  (tol {tol:.0e})", flush=True)
    assert d_lp < tol and d_fwd < 10 * tol and \
        (skip_fwd_logpdf or d_lpt < tol), \
        f"{name}: reference disagreement above tolerance"

    out = {
        "defs": defs, "flows": flows, "opts_json": json.dumps(opts),
        "pdf_kwargs_json": json.dumps(pdf_kwargs),
        "fully_amortized": fully_amortized,
        "cond_dim": -1 if cond_dim is None else cond_dim, "tol": tol,
        "x_eval": x_ref, "logprob_ref": lp_eval_ref,
        "z_base": z_ref, "x_fwd_ref": x_ref, "logpdf_target_ref": lp_t_ref,
        "logpdf_base_ref": lp_b_ref,
        "skip_fwd_logpdf": skip_fwd_logpdf,
    }
    if ci_np is not None:
        out["conditional_input"] = ci_np
    for key, val in params.items():
        out[f"param_{key}"] = np.asarray(val)
    FIXTURE_DIR.mkdir(parents=True, exist_ok=True)
    np.savez_compressed(FIXTURE_DIR / f"parity_{name}.npz", **out)
    print(f"  wrote tests/fixtures/parity_{name}.npz", flush=True)


def main():
    only = set(sys.argv[1:])
    failures = []
    for cfg in CONFIGS:
        name, defs, flows, opts, cond_dim, tol = cfg[:6]
        pdf_kwargs = cfg[6] if len(cfg) > 6 else None
        if only and name not in only:
            continue
        try:
            make_fixture(name, defs, flows, opts, cond_dim, tol, pdf_kwargs)
        except Exception as e:          # keep going; report at the end
            print(f"  FAILED: {e!r}", flush=True)
            failures.append((name, repr(e)))
    if failures:
        print("\nFAILURES:")
        for name, err in failures:
            print(f"  {name}: {err}")
        sys.exit(1)
    print("\nall fixtures written")


if __name__ == "__main__":
    main()
