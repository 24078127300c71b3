"""Opt-in f64 tail refinement of the f32 sampling solve
(high_precision_tail_newton, registry "g" option; TPU-side extension with
no reference counterpart — SURVEY section 7 "f64-grade numerics on TPU").

The refinement targets TRUE-QUANTILE accuracy: each step re-evaluates the
mixture chain in float64 and Newton-updates the f32 iterate, pushing samples
to the f32-nearest root of the exact CDF.  (It intentionally does NOT
improve the f32 sample->log_prob roundtrip residual, which is bounded by
the f32 evaluation noise of log_prob itself, ~2e-4 on hard mixtures;
workloads needing full consistency run dtype=float64 end-to-end — supported
on TPU via emulation and on CPU natively.)

Measured on TPU (BASELINE.md, 2026-08-19): |x - x_true| q999 8.8e-6 ->
1.8e-6 (4.8x) on a hard perturbed e4/gggg mixture, ~5x sampling cost in an
x64 session (where the Pallas kernels gate off — Mosaic rejects x64 traces).
"""
import jax
import jax.numpy as jnp
import numpy as np

from jammy_flows_tpu import pdf


def _hard_params(p, seed=3, spread=0.8):
    params = dict(p.init_params(seed=seed, dtype=jnp.float32))
    v = np.asarray(params["flow_0"]).copy()
    rng = np.random.default_rng(1)
    params["flow_0"] = jnp.asarray(
        v + rng.normal(0, spread, v.size).astype(np.float32), jnp.float32)
    return params


def test_tail_refinement_improves_true_quantiles():
    opts = {"rotation_mode": "none", "skip_model_offset": 1}
    errs = {}
    z_saved = None
    for n_ref in (0, 3):
        p = pdf("e4", "gggg", options_overwrite={
            "g": dict(opts, high_precision_tail_newton=n_ref)})
        params = _hard_params(p)
        x, z, _, _ = jax.jit(lambda pp, k: p.sample(
            pp, k, samplesize=20000, dtype=jnp.float32))(
                params, jax.random.PRNGKey(0))
        if z_saved is None:
            z_saved = np.asarray(z)
        # exact f64 forward map on the same base draws
        p64 = pdf("e4", "gggg", options_overwrite={"g": dict(opts)})
        params64 = {"flow_0": params["flow_0"].astype(jnp.float64)}
        x64, _ = p64.all_layer_forward(
            params64, jnp.asarray(z, jnp.float64),
            jnp.zeros(z.shape[0], jnp.float64))
        err = np.abs(np.asarray(x, np.float64) - np.asarray(x64))
        # ignore plateau outliers (flat CDF regions are location-degenerate)
        errs[n_ref] = np.quantile(err, 0.999)
    # refinement must tighten the q999 true-quantile error by >= 2x
    assert errs[3] < 0.5 * errs[0], errs


def test_tail_refinement_selfconsistency_preserved():
    """With refinement on, the flow still passes the standard roundtrip
    oracle at f32-evaluation-noise tolerances."""
    p = pdf("e2", "gg", options_overwrite={
        "g": {"high_precision_tail_newton": 2}})
    params = p.init_params(seed=0, dtype=jnp.float32)
    x, z, logq, _ = jax.jit(lambda pp, k: p.sample(
        pp, k, samplesize=20000, dtype=jnp.float32))(
            params, jax.random.PRNGKey(1))
    lp, _, _ = jax.jit(lambda pp, xx: p.log_prob(pp, xx))(params, x)
    d = np.abs(np.asarray(lp) - np.asarray(logq))
    assert np.quantile(d, 0.999) < 5e-3, np.quantile(d, 0.999)
    assert np.isfinite(np.asarray(x)).all()
