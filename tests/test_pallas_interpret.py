"""Pallas kernel math in hosted (CPU) CI via interpret mode.

``pallas_call(interpret=True)`` executes the kernel bodies as plain XLA ops:
no TPU, no Mosaic (whose layout verifier is the documented x64 blocker), so
the full kernel math - per-layer forward/sample + both backward bodies and
the whole-block gggg kernels - runs and is asserted against the pure-XLA
formulation on every push, not only on the nightly TPU runner.

The parity assertions mirror the on-chip tests in test_tpu_kernels.py
(same tolerances); inputs are float32 exactly as on TPU, inside the suite's
x64 session.
"""
import numpy as np
import pytest

import jax
import jax.flatten_util
import jax.numpy as jnp

import jammy_flows_tpu.ops.pallas_gf as pg
from jammy_flows_tpu import pdf
from jammy_flows_tpu.models.pdf import PDF as PDFcls


@pytest.fixture(autouse=True, scope="module")
def interpret_mode():
    prev = pg._INTERPRET
    pg._INTERPRET = True
    jax.clear_caches()
    yield
    pg._INTERPRET = prev
    jax.clear_caches()


def _ravel(tree):
    return jax.flatten_util.ravel_pytree(tree)[0]


def _with_pallas_off(fn):
    def wrapped(*a, **k):
        avail = pg.pallas_available
        pg.pallas_available = lambda: False
        try:
            return fn(*a, **k)
        finally:
            pg.pallas_available = avail
    return wrapped


@pytest.mark.parametrize("conditional", [False, True])
def test_per_layer_kernels_match_xla(conditional):
    """Prepared/raw/lazy forward + sample kernels and their backward bodies
    (interpret mode) agree with the XLA path in values and gradients."""
    kwargs = {"conditional_input_dim": 2} if conditional else {}
    p = pdf("e2", "gg", **kwargs)
    params = p.init_params(seed=0, dtype=jnp.float32)
    B = 1024
    ci = jax.random.normal(jax.random.PRNGKey(7), (B, 2),
                           dtype=jnp.float32) if conditional else None
    x = jax.random.normal(jax.random.PRNGKey(1), (B, 2), dtype=jnp.float32)

    def nll(pp):
        return -p.log_prob(pp, x, conditional_input=ci)[0].mean()

    def samp(pp):
        xs, zz, lp, lpb = p.sample(pp, jax.random.PRNGKey(3),
                                   conditional_input=ci, samplesize=B,
                                   dtype=jnp.float32)
        return jnp.mean(xs**2) + jnp.mean(lp)

    assert pg.pallas_available()
    for loss in (nll, samp):
        vk, gk = jax.value_and_grad(loss)(params)
        vx, gx = _with_pallas_off(jax.value_and_grad(loss))(params)
        assert float(jnp.abs(vk - vx)) < 1e-4
        fk, fx = _ravel(gk), _ravel(gx)
        rel = float(jnp.linalg.norm(fk - fx) / jnp.linalg.norm(fx))
        assert rel < 1e-4, rel


@pytest.mark.parametrize("ift", ["inormal_partly_crude",
                                 "inormal_full_pade"])
@pytest.mark.parametrize("conditional", [False, True])
def test_kernels_match_xla_new_ifts(conditional, ift):
    """Round-5 kernel-eligibility extension: the partly_crude / full_pade
    iCDF variants run through the same fused kernels (delegating to the
    shared f32 XLA iCDF formulation in-kernel) and agree with the pure-XLA
    path in values and gradients."""
    kwargs = {"conditional_input_dim": 2} if conditional else {}
    opts = {"g": {"inverse_function_type": ift}}
    p = pdf("e2", "gg", options_overwrite=opts, **kwargs)
    params = p.init_params(seed=0, dtype=jnp.float32)
    B = 1024
    ci = jax.random.normal(jax.random.PRNGKey(7), (B, 2),
                           dtype=jnp.float32) if conditional else None
    x = jax.random.normal(jax.random.PRNGKey(1), (B, 2), dtype=jnp.float32)

    def nll(pp):
        return -p.log_prob(pp, x, conditional_input=ci)[0].mean()

    def samp(pp):
        xs, zz, lp, lpb = p.sample(pp, jax.random.PRNGKey(3),
                                   conditional_input=ci, samplesize=B,
                                   dtype=jnp.float32)
        return jnp.mean(xs**2) + jnp.mean(lp)

    assert pg.pallas_available()
    for loss in (nll, samp):
        vk, gk = jax.value_and_grad(loss)(params)
        vx, gx = _with_pallas_off(jax.value_and_grad(loss))(params)
        assert float(jnp.abs(vk - vx)) < 1e-4
        fk, fx = _ravel(gk), _ravel(gx)
        rel = float(jnp.linalg.norm(fk - fx) / jnp.linalg.norm(fx))
        assert rel < 1e-4, rel


@pytest.mark.parametrize("ift", ["isigmoid", "inormal_partly_precise",
                                 "inormal_partly_crude",
                                 "inormal_full_pade"])
@pytest.mark.parametrize("conditional", [False, True])
def test_kernels_match_xla_skewness(conditional, ift):
    """Round-5 kernel-eligibility extension: add_skewness runs through the
    fused raw/lazy kernels (skew_mixture_logs chain + analytic skewed
    component-quantile bracket) and agrees with the pure-XLA path in values
    and gradients, for every iCDF type."""
    kwargs = {"conditional_input_dim": 2} if conditional else {}
    opts = {"g": {"add_skewness": 1, "inverse_function_type": ift}}
    p = pdf("e2", "gg", options_overwrite=opts, **kwargs)
    params = p.init_params(seed=0, dtype=jnp.float32)
    B = 1024
    ci = jax.random.normal(jax.random.PRNGKey(7), (B, 2),
                           dtype=jnp.float32) if conditional else None
    x = jax.random.normal(jax.random.PRNGKey(1), (B, 2), dtype=jnp.float32)

    def nll(pp):
        return -p.log_prob(pp, x, conditional_input=ci)[0].mean()

    def samp(pp):
        xs, zz, lp, lpb = p.sample(pp, jax.random.PRNGKey(3),
                                   conditional_input=ci, samplesize=B,
                                   dtype=jnp.float32)
        return jnp.mean(xs**2) + jnp.mean(lp)

    assert pg.pallas_available()
    for loss in (nll, samp):
        vk, gk = jax.value_and_grad(loss)(params)
        vx, gx = _with_pallas_off(jax.value_and_grad(loss))(params)
        assert float(jnp.abs(vk - vx)) < 1e-4
        fk, fx = _ravel(gk), _ravel(gx)
        rel = float(jnp.linalg.norm(fk - fx) / jnp.linalg.norm(fx))
        assert rel < 1e-4, rel
    # sample -> log_prob roundtrip through the kernel path itself
    xs, zz, lps, _ = p.sample(params, jax.random.PRNGKey(5),
                              conditional_input=ci, samplesize=B,
                              dtype=jnp.float32)
    lpr = p.log_prob(params, xs, conditional_input=ci)[0]
    assert float(jnp.abs(lps - lpr).max()) < 3e-4


@pytest.mark.parametrize("config", [
    ("e4", "gggg", 3),            # lazy2 fused + analytic cotangents
    ("e4", "gggg", None),         # permanent fused
    ("e4+s2+e4", "gggg+f+gggg", 3),   # fused blocks + AD fallback for f
])
def test_fused_nll_matches_value_and_grad(config):
    """PDF.nll_value_and_grad (single-launch forward+backward with analytic
    NLL cotangents) is mathematically identical to
    jax.value_and_grad(-log_prob().mean())."""
    defs, flows, cond = config
    kwargs = {"conditional_input_dim": cond} if cond else {}
    p = pdf(defs, flows, **kwargs)
    params = p.init_params(seed=0, dtype=jnp.float32)
    B = 1024
    rng = np.random.default_rng(0)
    x = 0.6 * rng.normal(size=(B, p.total_target_dim)).astype(np.float32)
    for k, d in enumerate(p.pdf_defs_list):
        if d == "s2":
            lo, hi = p.target_dim_indices[k]
            x[:, lo] = 1.2 + 0.2 * x[:, lo]
            x[:, lo + 1] = 1.0 + 0.2 * x[:, lo + 1]
    x = jnp.asarray(x)
    ci = None if cond is None else jnp.asarray(
        rng.normal(size=(B, cond)).astype(np.float32))

    l1, g1 = p.nll_value_and_grad(params, x, conditional_input=ci)
    l2, g2 = jax.value_and_grad(
        lambda pp: -p.log_prob(pp, x, conditional_input=ci)[0].mean())(params)
    assert abs(float(l1) - float(l2)) < 1e-4
    for kk in g1:
        d1, d2 = np.asarray(g1[kk]), np.asarray(g2[kk])
        rel = np.linalg.norm(d1 - d2) / (np.linalg.norm(d2) + 1e-30)
        assert rel < 3e-5, (config, kk, rel)


def test_fused_nll_respects_batch_padding():
    """A batch that is NOT a BLK_BWD multiple must give the same loss and
    grads: padded lanes are masked out of the in-kernel cotangents."""
    p = pdf("e4", "gggg", conditional_input_dim=2)
    params = p.init_params(seed=0, dtype=jnp.float32)
    B = 700           # deliberately unaligned
    rng = np.random.default_rng(3)
    x = jnp.asarray(0.5 * rng.normal(size=(B, 4)).astype(np.float32))
    ci = jnp.asarray(rng.normal(size=(B, 2)).astype(np.float32))
    l1, g1 = p.nll_value_and_grad(params, x, conditional_input=ci)
    l2, g2 = jax.value_and_grad(
        lambda pp: -p.log_prob(pp, x, conditional_input=ci)[0].mean())(params)
    assert abs(float(l1) - float(l2)) < 1e-4
    for kk in g1:
        rel = float(jnp.linalg.norm(g1[kk] - g2[kk])
                    / (jnp.linalg.norm(g2[kk]) + 1e-30))
        assert rel < 3e-5, (kk, rel)


def test_block_kernel_matches_xla():
    """Whole-block gggg kernels (in-kernel MLP fusion, rotations, offsets,
    mixture passes/solves + whole-chain vjp) in interpret mode agree with
    the pure-XLA path in both directions, values and gradients."""
    p = pdf("e4", "gggg", conditional_input_dim=3)
    params = p.init_params(seed=0, dtype=jnp.float32)
    assert p._block_info(0) is not None
    B = 1024
    x = 0.8 * jax.random.normal(jax.random.PRNGKey(0),
                                (B, p.total_target_dim), jnp.float32)
    ci = jax.random.normal(jax.random.PRNGKey(1), (B, 3), jnp.float32)

    def lp(pp):
        return p.log_prob(pp, x, conditional_input=ci)[0]

    def samp_obj(pp):
        s, _, logq, _ = p.sample(pp, jax.random.PRNGKey(9), samplesize=B,
                                 conditional_input=ci)
        return (s**2).mean() + 0.1 * logq.mean(), s, logq

    lp1 = lp(params)
    lp2 = _with_pallas_off(lp)(params)
    assert float(jnp.abs(lp1 - lp2).max()) < 3e-4

    g1 = jax.grad(lambda pp: -lp(pp).mean())(params)
    g2 = _with_pallas_off(jax.grad(lambda pp: -lp(pp).mean()))(params)
    f1, f2 = _ravel(g1), _ravel(g2)
    assert float(jnp.linalg.norm(f1 - f2) / jnp.linalg.norm(f2)) < 3e-5

    _, s1, q1 = samp_obj(params)
    _, s2, q2 = _with_pallas_off(samp_obj)(params)
    assert float(jnp.abs(s1 - s2).max()) < 3e-3
    assert float(jnp.abs(q1 - q2).max()) < 3e-3

    sg1 = jax.grad(lambda pp: samp_obj(pp)[0])(params)
    sg2 = _with_pallas_off(jax.grad(lambda pp: samp_obj(pp)[0]))(params)
    fs1, fs2 = _ravel(sg1), _ravel(sg2)
    assert float(jnp.linalg.norm(fs1 - fs2) / jnp.linalg.norm(fs2)) < 3e-4


@pytest.mark.parametrize("ift", ["inormal_partly_crude",
                                 "inormal_full_pade"])
def test_block_kernel_new_ifts(ift):
    """Whole-block gggg kernels cover the crude/full_pade iCDF types too
    (round-5 eligibility extension): values and gradients agree with the
    pure-XLA path in both directions."""
    opts = {"g": {"inverse_function_type": ift}}
    p = pdf("e4", "gggg", conditional_input_dim=3, options_overwrite=opts)
    params = p.init_params(seed=0, dtype=jnp.float32)
    assert p._block_info(0) is not None
    B = 1024
    x = 0.8 * jax.random.normal(jax.random.PRNGKey(0),
                                (B, p.total_target_dim), jnp.float32)
    ci = jax.random.normal(jax.random.PRNGKey(1), (B, 3), jnp.float32)

    def lp(pp):
        return p.log_prob(pp, x, conditional_input=ci)[0]

    lp1 = lp(params)
    lp2 = _with_pallas_off(lp)(params)
    assert float(jnp.abs(lp1 - lp2).max()) < 3e-4

    g1 = jax.grad(lambda pp: -lp(pp).mean())(params)
    g2 = _with_pallas_off(jax.grad(lambda pp: -lp(pp).mean()))(params)
    f1, f2 = _ravel(g1), _ravel(g2)
    assert float(jnp.linalg.norm(f1 - f2) / jnp.linalg.norm(f2)) < 1e-4

    def samp_obj(pp):
        s, _, logq, _ = p.sample(pp, jax.random.PRNGKey(9), samplesize=B,
                                 conditional_input=ci, dtype=jnp.float32)
        return (s**2).mean() + 0.1 * logq.mean(), s, logq

    _, s1, q1 = samp_obj(params)
    _, s2, q2 = _with_pallas_off(samp_obj)(params)
    assert float(jnp.abs(s1 - s2).max()) < 3e-3
    assert float(jnp.abs(q1 - q2).max()) < 3e-3

    sg1 = jax.grad(lambda pp: samp_obj(pp)[0])(params)
    sg2 = _with_pallas_off(jax.grad(lambda pp: samp_obj(pp)[0]))(params)
    fs1, fs2 = _ravel(sg1), _ravel(sg2)
    assert float(jnp.linalg.norm(fs1 - fs2) / jnp.linalg.norm(fs2)) < 3e-4
