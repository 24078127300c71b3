"""Coordinate-system consistency tests.

Port of tests/test_manifold_embedding_consistency.py: the same point
evaluated in intrinsic vs embedding coordinates must give consistent
log-probabilities (differing exactly by the embedding log-det), and the
force_embedding/force_intrinsic flags must agree with set_embedding_flags.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from jammy_flows_tpu import pdf

CONFIGS = [
    ("s1_m", "s1", "m", {}),
    ("s2_f", "s2", "f", {}),
    ("e2_s2", "e2+s2", "gg+f", {}),
    ("e1_s1_e1", "e1+s1+e1", "g+o+g", {}),
    ("a2_w", "a2", "w", {}),
]


@pytest.mark.parametrize("name,pdf_defs,flow_defs,opts",
                         CONFIGS, ids=[c[0] for c in CONFIGS])
def test_force_flags_agree_with_embedding_mode(name, pdf_defs, flow_defs, opts):
    p = pdf(pdf_defs, flow_defs, options_overwrite=opts)
    params = p.init_params(seed=11)
    x_int, z, lp_int, _ = p.sample(params, jax.random.PRNGKey(0),
                                   samplesize=50,
                                   force_intrinsic_coordinates=True)
    x_emb, _, lp_emb, _ = p.sample(params, jax.random.PRNGKey(0),
                                   samplesize=50,
                                   force_embedding_coordinates=True)
    # evaluate each representation with the matching force flag
    lpe_int, _, base_int = p.log_prob(params, x_int,
                                      force_intrinsic_coordinates=True)
    lpe_emb, _, base_emb = p.log_prob(params, x_emb,
                                      force_embedding_coordinates=True)
    np.testing.assert_allclose(np.asarray(lp_int), np.asarray(lpe_int),
                               atol=1e-7)
    np.testing.assert_allclose(np.asarray(lp_emb), np.asarray(lpe_emb),
                               atol=1e-7)
    # base positions identical whichever coordinate system was used
    np.testing.assert_allclose(np.asarray(base_int), np.asarray(base_emb),
                               atol=1e-7)
    # the two densities differ exactly by the embedding transform log-det
    x2, ld = p.transform_target_space(x_int, 0.0, transform_from="intrinsic",
                                      transform_to="embedding")
    np.testing.assert_allclose(np.asarray(x2), np.asarray(x_emb), atol=1e-7)
    np.testing.assert_allclose(np.asarray(lp_int),
                               np.asarray(lp_emb + ld), atol=1e-7)


def test_set_embedding_flags_consistency():
    p = pdf("e2+s2", "gg+f")
    params = p.init_params(seed=0)
    x_emb, _, lp1, _ = p.sample(params, jax.random.PRNGKey(3), samplesize=30,
                                force_embedding_coordinates=True)
    p.set_embedding_flags(True)
    lp2, _, _ = p.log_prob(params, x_emb)
    np.testing.assert_allclose(np.asarray(lp1), np.asarray(lp2), atol=1e-7)
    p.set_embedding_flags(False)


def test_param_structure_totals():
    """obtain_flow_param_structure totals match layer param counts
    (test_general.py:563-588)."""
    p = pdf("e2+s2+i1", "gg+f+r", conditional_input_dim=2)
    params = p.init_params(seed=0)
    ci = jnp.ones((5, 2))
    s = p.obtain_flow_param_structure(params, conditional_input=ci)
    assert len(s) == 4
    for name, v in s.items():
        assert v["params"].shape[-1] == v["num_params"]
        assert sum(t.shape[-1] for t in v["named"].values()) == v["num_params"]


def test_param_structure_names():
    """Named tensors mirror the reference's per-layer parameter names
    (default.py:1119-1298 / gaussianization_flow.py param_dict keys)."""
    p = pdf("e3+s2+i1", "gt+f+r",
            options_overwrite={"g": {"fit_normalization": 1},
                               "t": {"cov_type": "full"}})
    params = p.init_params(seed=0)
    s = p.obtain_flow_param_structure(params)
    g = s["000_gt.000"]["named"]
    assert set(g) >= {"vs", "means", "log_widths", "log_norms"}
    g_layer = p.layer_list[0][0]
    assert g["log_widths"].shape[-1] == g_layer.num_kde * 3   # num_kde * dim
    t = s["000_gt.001"]["named"]
    assert set(t) >= {"log_diagonal", "lower_trinagular_entries", "offset"}
    f = s["001_f.000"]["named"]
    assert "loglike_kappa" in f
    r = s["002_r.000"]["named"]
    assert set(r) == {"widths", "heights", "derivatives"}
