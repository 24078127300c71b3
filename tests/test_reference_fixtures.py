"""Frozen reference-parity fixtures (SURVEY.md section 4).

tools/make_parity_fixtures.py drove the PyTorch reference once at float64,
copied its exact init parameters into the repo's flat slabs, verified
pointwise agreement, and froze the reference outputs into
tests/fixtures/parity_*.npz.  These tests re-assert the repo against the
frozen outputs WITHOUT torch, so a numerics regression surfaces in CI as a
*reference* deviation rather than only a roundtrip failure.

Covered: all 14 flow symbols (g/h/t/x m/o/v/c/f/y r/z w/u + joint/
conditional composition) with >=4 distinct g-option combos (reference
oracle: the option grid of /root/reference/tests/test_general.py:116-391,
pruned).  13 symbols are pinned at 1e-6-to-1e-10 tolerances; `c` (CNF) is
pinned at the reference's own ODE-solver tolerance (3e-4, its rk4 steps
with the 3/8 rule while ours uses classic RK4 — see
tools/torchdiffeq_shim.py).
"""
import glob
import json
import os
import pathlib

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from jammy_flows_tpu import pdf, fully_amortized_pdf

FIXTURE_DIR = pathlib.Path(__file__).resolve().parent / "fixtures"
FIXTURES = sorted(glob.glob(str(FIXTURE_DIR / "parity_*.npz")))


def _ids():
    return [os.path.basename(f)[len("parity_"):-len(".npz")]
            for f in FIXTURES]


def _load(path):
    with np.load(path, allow_pickle=False) as z:
        data = {k: z[k] for k in z.files}
    defs = str(data["defs"])
    flows = str(data["flows"])
    opts = json.loads(str(data["opts_json"]))
    cond_dim = int(data["cond_dim"])
    cond_dim = None if cond_dim < 0 else cond_dim
    pdf_kwargs = json.loads(str(data["pdf_kwargs_json"])) \
        if "pdf_kwargs_json" in data else {}
    ctor = fully_amortized_pdf if bool(data.get("fully_amortized", False)) \
        else pdf
    p = ctor(defs, flows, options_overwrite=opts,
             conditional_input_dim=cond_dim, **pdf_kwargs)
    params = dict(p.init_params(seed=0))
    for k in list(params):
        key = f"param_{k}"
        assert key in data, f"fixture missing {key}"
        assert data[key].shape == np.asarray(params[k]).shape
        params[k] = jnp.asarray(data[key])
    ci = None
    if "conditional_input" in data:
        ci = jnp.asarray(data["conditional_input"])
    return p, params, ci, data


def test_fixtures_exist():
    assert len(FIXTURES) >= 20, \
        "parity fixtures missing - run tools/make_parity_fixtures.py"


@pytest.mark.parametrize("path", FIXTURES, ids=_ids())
def test_log_prob_matches_frozen_reference(path):
    p, params, ci, data = _load(path)
    tol = float(data["tol"])
    lp, _, _ = p.log_prob(params, jnp.asarray(data["x_eval"]),
                          conditional_input=ci)
    d = np.abs(np.asarray(lp) - data["logprob_ref"]).max()
    assert d < tol, f"log_prob deviates from frozen reference by {d:.3e}"


@pytest.mark.parametrize("path", FIXTURES, ids=_ids())
def test_forward_map_matches_frozen_reference(path):
    p, params, ci, data = _load(path)
    tol = float(data["tol"])
    z = jnp.asarray(data["z_base"])
    ld0 = jnp.zeros(z.shape[0], dtype=z.dtype)
    x_fwd, ld = p.all_layer_forward(params, z, ld0, ci)
    d_x = np.abs(np.asarray(x_fwd) - data["x_fwd_ref"]).max()
    assert d_x < 10 * tol, \
        f"forward map deviates from frozen reference by {d_x:.3e}"
    if bool(data.get("skip_fwd_logpdf", False)):
        # 'u': the torch reference's own sample log-pdf contradicts its own
        # log_prob (gumbel_softmax.flow_mapping log_det bug) - only the map
        # itself is frozen; repo-internal consistency is covered by
        # tests/test_selfconsistency.py
        return
    # base log-pdf recorded from the reference (normal for e/s/i
    # sub-manifolds, gumbel for 'u' simplex flows)
    lp_fwd = data["logpdf_base_ref"] - np.asarray(ld)
    d_lp = np.abs(lp_fwd - data["logpdf_target_ref"]).max()
    assert d_lp < tol, \
        f"forward log-pdf deviates from frozen reference by {d_lp:.3e}"
