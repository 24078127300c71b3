"""Pallas TPU kernel: fused bisection+Newton Gaussianization-flow inverse.

The hot op of the framework (SURVEY.md section 6): sampling a `g` layer
inverts the per-dimension logistic-mixture CDF -> logit chain with ~26
bracketing/Newton iterations.  Under plain XLA every iteration materializes
(K, D, B)-sized mixture intermediates to HBM (measured ~47 ms per layer per
1M samples on v5e - bandwidth-bound).  This kernel runs the ENTIRE solve in
VMEM: the batch is tiled into lane-aligned blocks, mixture parameters sit in
VMEM once, and the 26 iterations touch HBM only for the initial targets and
final outputs.

Supported configuration (the recommended production path): classic stretch,
isigmoid inverse_function_type, no skewness, broadcast (non-amortized)
parameters.  Everything else falls back to the XLA path in layers/euclidean.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import logistic_kde

BLK_B = 512          # batch lanes per block (multiple of 128)
# The initial bracket comes from the mixture-quantile bound (see
# _component_bracket): for a monotone mixture CDF, F^-1(q) lies between the
# min and max component quantiles m_k + s_k*logit(q).  That makes the
# bracket ~unit-width instead of 2e5, so a handful of bisections plus
# bracket-safeguarded Newton iterations reach f32 machine precision --
# 26 mixture evaluations (18 value + 8 value&deriv) drop to 13 (2+3 value +
# 8 value&deriv).
N_BISECT = 3
N_NEWTON = 8
LO, HI = -1e5, 1e5

_SQRT2 = 1.4142135623730951
_LOG_SQRT_2PI = 0.9189385332046727
_PADE_BOUND = logistic_kde.PADE_BOUND
_PADE_A = logistic_kde.PADE_A
_LOG_4 = logistic_kde.LOG_4
_LOG_CENTER_DERIV = logistic_kde.LOG_CENTER_DERIV


import math as _math

_LOG_SEAM = _math.log(4.0 * _PADE_BOUND * (1.0 - _PADE_BOUND))


def _icdf_pass_kernel(log_cdf, log_sf, ift):
    """In-kernel variant of logistic_kde.icdf_pass.

    Identical formulation to the f32 XLA branch of logistic_kde.icdf_pass
    (log-space seam + erfinv-from-ln_fac) so the solve target matches the
    analytic density pass bit-for-bit in structure.
    """
    if ift == "isigmoid":
        return log_cdf - log_sf
    assert ift == "inormal_partly_precise"
    tiny = 1e-37
    ln_fac_raw = log_cdf + log_sf + _LOG_4
    good = ln_fac_raw > _LOG_SEAM
    ln_fac_mid = jnp.where(good, ln_fac_raw, -1.0)
    xx = logistic_kde.erfinv_f32_x_from_logs(log_cdf, log_sf, ln_fac_mid)
    val = _SQRT2 * logistic_kde.erfinv_f32_poly(xx, -ln_fac_mid)
    ln_fac = jnp.where(good, -1.0, ln_fac_raw)
    c = 2.0 / (3.141592653589793 * _PADE_A)
    combined = c + ln_fac / 2.0
    pos_entry = 2.0 * (jnp.sqrt(jnp.maximum(combined**2 - ln_fac / _PADE_A,
                                            tiny)) - combined)
    total_factor = jnp.sqrt(jnp.maximum(pos_entry, tiny))
    right = (~good) & (log_cdf >= log_sf)
    return jnp.where(good, val, jnp.where(right, total_factor, -total_factor))


def _icdf_log_deriv_kernel(log_cdf, log_sf, log_pdf, ift):
    """In-kernel variant of logistic_kde.icdf_log_derivative (f32 branch)."""
    if ift == "isigmoid":
        return jnp.logaddexp(-log_sf, -log_cdf) + log_pdf
    assert ift == "inormal_partly_precise"
    tiny = 1e-37
    ln_fac_raw = log_cdf + log_sf + _LOG_4
    good = ln_fac_raw > _LOG_SEAM
    ln_fac_mid = jnp.where(good, ln_fac_raw, -1.0)
    xx = logistic_kde.erfinv_f32_x_from_logs(log_cdf, log_sf, ln_fac_mid)
    ei = logistic_kde.erfinv_f32_poly(xx, -ln_fac_mid)
    middle = _LOG_SQRT_2PI + ei**2 + log_pdf
    ln_fac = jnp.where(good, -1.0, ln_fac_raw)
    c = 2.0 / (3.141592653589793 * _PADE_A)
    F = ln_fac / 2.0 + c
    F2 = jnp.sqrt(jnp.maximum(F**2 - ln_fac / _PADE_A, tiny))
    log_num = jnp.log(jnp.maximum(-(F - 1.0 / _PADE_A - F2), tiny))
    log_den = (0.5 * 2.0794415416798357
               + 0.5 * jnp.log(jnp.maximum(F2 - F, tiny))
               + jnp.log(jnp.maximum(F2, tiny)))
    cdf = jnp.exp(log_cdf)
    extra = jnp.log(jnp.maximum(jnp.abs(1.0 - 2.0 * cdf), tiny))
    total_factor = log_num - log_den - (ln_fac - _LOG_4) + extra
    return jnp.where(good, middle, total_factor + log_pdf)


def _mixture_value_deriv(x, means, inv_widths, log_norm_w, deriv_mode, ift):
    """Gaussianization value (iCDF pass of the mixture CDF) and derivative.

    x: (D, BLK); means/inv_widths/log_norm_w: (K, D, 1|BLK) with log_norm_w
    already normalized (log softmax over K).  Runs entirely in registers;
    the iCDF pass reuses the elementwise ops from logistic_kde (pure jnp,
    lowers through Mosaic).  deriv_mode: None | "exp" | "log".
    """
    common = (x[None, :, :] - means) * inv_widths          # (K, D, BLK)
    sp = jax.nn.softplus(-common)
    log_cdfs = -sp + log_norm_w
    log_sfs = log_cdfs - common
    # logsumexp over K (axis 0)
    m_c = jnp.max(log_cdfs, axis=0)
    log_cdf = m_c + jnp.log(jnp.sum(jnp.exp(log_cdfs - m_c), axis=0))
    m_s = jnp.max(log_sfs, axis=0)
    log_sf = m_s + jnp.log(jnp.sum(jnp.exp(log_sfs - m_s), axis=0))
    val = _icdf_pass_kernel(log_cdf, log_sf, ift)
    if deriv_mode is None:
        return val, None
    # pdf of logistic mixture: logsumexp_k(-common - log_w - 2 softplus(-common))
    log_pdfs = -common + jnp.log(inv_widths) - 2.0 * sp + log_norm_w
    m_p = jnp.max(log_pdfs, axis=0)
    log_pdf = m_p + jnp.log(jnp.sum(jnp.exp(log_pdfs - m_p), axis=0))
    log_deriv = _icdf_log_deriv_kernel(log_cdf, log_sf, log_pdf, ift)
    if deriv_mode == "log":
        return val, log_deriv
    return val, jnp.exp(log_deriv)


def _logit_phi(x):
    """logit(Phi(x)) for standard normal, f32-stable in both tails
    (Abramowitz&Stegun 26.2.17 tail polynomial; ~1e-7 relative)."""
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + 0.2316419 * ax)
    poly = t * (0.319381530 + t * (-0.356563782 + t * (
        1.781477937 + t * (-1.821255978 + t * 1.330274429))))
    log_tail = -0.5 * ax * ax - _LOG_SQRT_2PI + jnp.log(poly)
    log_head = jnp.log1p(-jnp.exp(log_tail))
    return jnp.where(x >= 0.0, log_head - log_tail, log_tail - log_head)


def _component_bracket(target, means, inv_widths, ift):
    """Exact initial bracket from the mixture-quantile bound.

    The solve target is (a monotone reparametrization of) a quantile level q;
    for a mixture CDF F = sum_k w_k F_k the quantile F^-1(q) always lies in
    [min_k F_k^-1(q), max_k F_k^-1(q)], and each logistic component inverts
    analytically: F_k^-1(q) = m_k + s_k * logit(q).
    """
    if ift == "isigmoid":
        t = target                      # the target IS logit(q)
    else:
        # inormal_partly_precise: target ~= Phi^-1(q)
        t = _logit_phi(target)
    q_k = means + t[None, :, :] / inv_widths          # (K, D, BLK)
    lo = jnp.min(q_k, axis=0)
    hi = jnp.max(q_k, axis=0)
    # margin absorbs the pade-tail mismatch between the kernel's icdf pass
    # and the exact normal quantile used for t
    margin = 0.05 * (hi - lo) + 0.5
    return lo - margin, hi + margin


def _make_kernel(ift, broadcast_params):
    def kernel(target_ref, means_ref, inv_widths_ref, log_norm_ref, out_ref):
        target = target_ref[:]                              # (D, BLK)
        if broadcast_params:
            means = means_ref[:][:, :, None]                # (K, D, 1)
            inv_widths = inv_widths_ref[:][:, :, None]
            log_norm_w = log_norm_ref[:][:, :, None]
        else:
            means = means_ref[:]                            # (K, D, BLK)
            inv_widths = inv_widths_ref[:]
            log_norm_w = log_norm_ref[:]

        lo, hi = _component_bracket(target, means, inv_widths, ift)
        # validity check: where the margin did not cover the approximation
        # error (rare far-tail lanes), fall back to the full bracket
        vlo, _ = _mixture_value_deriv(lo, means, inv_widths, log_norm_w,
                                      None, ift)
        vhi, _ = _mixture_value_deriv(hi, means, inv_widths, log_norm_w,
                                      None, ift)
        good = (vlo <= target) & (vhi >= target)
        lo = jnp.where(good, lo, LO)
        hi = jnp.where(good, hi, HI)

        def bisect(_, carry):
            lo, hi = carry
            mid = 0.5 * (lo + hi)
            val, _ = _mixture_value_deriv(mid, means, inv_widths, log_norm_w,
                                          None, ift)
            right = val < target
            return jnp.where(right, mid, lo), jnp.where(right, hi, mid)

        lo, hi = jax.lax.fori_loop(0, N_BISECT, bisect, (lo, hi))
        x = 0.5 * (lo + hi)

        def newton(_, carry):
            lo, hi, x = carry
            val, deriv = _mixture_value_deriv(x, means, inv_widths,
                                              log_norm_w, "exp", ift)
            right = val < target
            lo = jnp.where(right, x, lo)
            hi = jnp.where(right, hi, x)
            x_new = x - (val - target) / deriv
            # bracket-safeguard: out-of-bracket or non-finite Newton steps
            # take the bisection midpoint instead (keeps the worst-case
            # contraction of bisection with the typical-case speed of Newton)
            bad = (~jnp.isfinite(x_new)) | (x_new < lo) | (x_new > hi)
            x_new = jnp.where(bad, 0.5 * (lo + hi), x_new)
            return lo, hi, x_new

        _, _, x = jax.lax.fori_loop(0, N_NEWTON, newton, (lo, hi, x))
        out_ref[:] = x
    return kernel


@functools.partial(jax.jit, static_argnames=("ift",))
def _gf_inverse_pallas_raw(target_t, means, inv_widths, log_norm_w,
                           ift="isigmoid"):
    """target_t: (D, B) with B a multiple of BLK_B; params (K, D)."""
    d, b = target_t.shape
    grid = (b // BLK_B,)
    return pl.pallas_call(
        _make_kernel(ift, broadcast_params=True),
        out_shape=jax.ShapeDtypeStruct((d, b), target_t.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((d, BLK_B), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(means.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(inv_widths.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(log_norm_w.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((d, BLK_B), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
    )(target_t, means, inv_widths, log_norm_w)


@functools.partial(jax.jit, static_argnames=("ift",))
def _gf_inverse_pallas_amortized_raw(target_t, means, inv_widths, log_norm_w,
                                     ift="isigmoid"):
    """target_t: (D, B); params (K, D, B) per-sample, B multiple of BLK_B."""
    d, b = target_t.shape
    k = means.shape[0]
    grid = (b // BLK_B,)
    p_spec = pl.BlockSpec((k, d, BLK_B), lambda i: (0, 0, i),
                          memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _make_kernel(ift, broadcast_params=False),
        out_shape=jax.ShapeDtypeStruct((d, b), target_t.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((d, BLK_B), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            p_spec, p_spec, p_spec,
        ],
        out_specs=pl.BlockSpec((d, BLK_B), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
    )(target_t, means, inv_widths, log_norm_w)


def gf_inverse_pallas(target, means, log_widths, log_norms,
                      ift="isigmoid"):
    """Solve gaussianization(x) = target for x, fused in VMEM.

    target: (B, D); means/log_widths/log_norms: B-minor (K, D, Bp) with Bp
    in {1, B} (broadcast or per-sample MLP-predicted parameters).  Pads B to
    a BLK_B multiple; returns (B, D).  ift selects the iCDF pass variant.
    """
    b, d = target.shape
    pad = (-b) % BLK_B
    tt = target.T                                            # (D, B)
    if pad:
        tt = jnp.pad(tt, ((0, 0), (0, pad)))

    if means.shape[-1] == 1:
        means2 = means[..., 0]                               # (K, D)
        inv_widths2 = jnp.exp(-log_widths[..., 0])
        log_norm_w2 = log_norms[..., 0] - jax.scipy.special.logsumexp(
            log_norms[..., 0], axis=0, keepdims=True)
        out = _gf_inverse_pallas_raw(tt, means2, inv_widths2, log_norm_w2, ift=ift)
        return out[:, :b].T

    # per-sample params already arrive B-minor (K, D, B)
    inv_widths_t = jnp.exp(-log_widths)
    log_norm_w_t = log_norms - jax.scipy.special.logsumexp(log_norms, axis=0,
                                                           keepdims=True)
    means_t = means
    if pad:
        means_t = jnp.pad(means_t, ((0, 0), (0, 0), (0, pad)))
        inv_widths_t = jnp.pad(inv_widths_t, ((0, 0), (0, 0), (0, pad)),
                               constant_values=1.0)
        log_norm_w_t = jnp.pad(log_norm_w_t, ((0, 0), (0, 0), (0, pad)))
    out = _gf_inverse_pallas_amortized_raw(tt, means_t, inv_widths_t,
                                           log_norm_w_t, ift=ift)
    return out[:, :b].T


def _make_forward_kernel(ift, broadcast_params):
    """Density-direction kernel: (val, log_deriv) of the gaussianization
    pass, all (K, D, BLK) mixture intermediates in VMEM.

    The XLA formulation of the same math (logistic_kde.gaussianize_forward)
    materializes every (K, D, B) intermediate through HBM - measured 134 GB
    accessed per 1M samples on the amortized flagship blocks.
    """
    def kernel(x_ref, means_ref, inv_widths_ref, log_norm_ref,
               val_ref, log_deriv_ref):
        x = x_ref[:]                                        # (D, BLK)
        if broadcast_params:
            means = means_ref[:][:, :, None]                # (K, D, 1)
            inv_widths = inv_widths_ref[:][:, :, None]
            log_norm_w = log_norm_ref[:][:, :, None]
        else:
            means = means_ref[:]                            # (K, D, BLK)
            inv_widths = inv_widths_ref[:]
            log_norm_w = log_norm_ref[:]
        val, log_deriv = _mixture_value_deriv(x, means, inv_widths,
                                              log_norm_w, "log", ift)
        val_ref[:] = val
        log_deriv_ref[:] = log_deriv
    return kernel


@functools.partial(jax.jit, static_argnames=("ift",))
def _gf_forward_pallas_raw(x_t, means, inv_widths, log_norm_w, ift):
    d, b = x_t.shape
    broadcast = means.ndim == 2
    grid = (b // BLK_B,)
    io_spec = pl.BlockSpec((d, BLK_B), lambda i: (0, i),
                           memory_space=pltpu.VMEM)
    if broadcast:
        p_spec = pl.BlockSpec(means.shape, lambda i: (0, 0),
                              memory_space=pltpu.VMEM)
    else:
        k = means.shape[0]
        p_spec = pl.BlockSpec((k, d, BLK_B), lambda i: (0, 0, i),
                              memory_space=pltpu.VMEM)
    out = jax.ShapeDtypeStruct((d, b), x_t.dtype)
    return pl.pallas_call(
        _make_forward_kernel(ift, broadcast_params=broadcast),
        out_shape=[out, out],
        grid=grid,
        in_specs=[io_spec, p_spec, p_spec, p_spec],
        out_specs=[io_spec, io_spec],
    )(x_t, means, inv_widths, log_norm_w)


def _gf_forward_impl(x, means, log_widths, log_norms, ift):
    b, d = x.shape
    pad = (-b) % BLK_B
    xt = x.T
    if pad:
        xt = jnp.pad(xt, ((0, 0), (0, pad)))
    if means.shape[-1] == 1:
        m = means[..., 0]
        iw = jnp.exp(-log_widths[..., 0])
        lnw = log_norms[..., 0] - jax.scipy.special.logsumexp(
            log_norms[..., 0], axis=0, keepdims=True)
    else:
        m = means
        iw = jnp.exp(-log_widths)
        lnw = log_norms - jax.scipy.special.logsumexp(log_norms, axis=0,
                                                      keepdims=True)
        if pad:
            m = jnp.pad(m, ((0, 0), (0, 0), (0, pad)))
            iw = jnp.pad(iw, ((0, 0), (0, 0), (0, pad)), constant_values=1.0)
            lnw = jnp.pad(lnw, ((0, 0), (0, 0), (0, pad)))
    val, log_deriv = _gf_forward_pallas_raw(xt, m, iw, lnw, ift)
    return val[:, :b].T, log_deriv[:, :b].T


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def gf_forward_pallas(x, means, log_widths, log_norms, ift="isigmoid"):
    """Fused density-direction pass: (gaussianize(x), log|d/dx|).

    x: (B, D); params B-minor (K, D, Bp), Bp in {1, B}.  Forward runs in one
    VMEM kernel; the backward pass falls back to jax.vjp of the XLA
    formulation (logistic_kde.gaussianize_forward), so training gradients
    are identical to the non-kernel path.
    """
    return _gf_forward_impl(x, means, log_widths, log_norms, ift)


def _gf_forward_fwd(x, means, log_widths, log_norms, ift):
    out = _gf_forward_impl(x, means, log_widths, log_norms, ift)
    return out, (x, means, log_widths, log_norms)


def _gf_forward_bwd(ift, res, cts):
    x, means, log_widths, log_norms = res
    zeros = jnp.zeros((1, 1, 1), x.dtype)
    ones = jnp.ones((1, 1, 1), x.dtype)
    _, vjp = jax.vjp(
        lambda xx, m, lw, ln: logistic_kde.gaussianize_forward(
            xx, m, lw, ln, zeros, ones, add_skewness=False,
            inverse_function_type=ift),
        x, means, log_widths, log_norms)
    return vjp(cts)


gf_forward_pallas.defvjp(_gf_forward_fwd, _gf_forward_bwd)


def pallas_available():
    try:
        return jax.devices()[0].platform not in ("cpu",)
    except Exception:
        return False


# backwards-compat alias
def gf_inverse_isigmoid_pallas(target, means, log_widths, log_norms):
    return gf_inverse_pallas(target, means, log_widths, log_norms,
                             ift="isigmoid")
