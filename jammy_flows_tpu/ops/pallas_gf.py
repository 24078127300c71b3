"""Pallas TPU kernels: fused Gaussianization-flow passes.

The hot ops of the framework (SURVEY.md section 6):

* sampling a `g` layer inverts the per-dimension logistic-mixture CDF ->
  logit chain with bracketing/Newton iterations.  Under plain XLA every
  iteration materializes (K, D, B)-sized mixture intermediates to HBM
  (measured ~47 ms per layer per 1M samples on v5e - bandwidth-bound).  The
  inverse kernel runs the ENTIRE solve in VMEM: the batch is tiled into
  lane-aligned blocks, mixture parameters sit in VMEM once, and the
  iterations touch HBM only for the initial targets and final outputs.
* the density direction evaluates the same mixture chain once; the forward
  kernel keeps all (K, D, B) intermediates in VMEM (the XLA formulation
  accessed 134 GB of HBM per 1M samples on the amortized flagship blocks).

Two parameter interfaces:

* PREPARED (`gf_forward_pallas` / `gf_inverse_pallas`): width-regulated
  log_widths and norm-regulated log_norms, as produced by
  layers/euclidean._unpack.  Normalization/exp run in XLA.
* RAW (`gf_forward_raw` / `gf_inverse_raw`): the pre-regulator B-minor
  slabs straight out of the MLP-output transpose.  The width/norm
  regulators, weight normalization, and exp all run INSIDE the kernel
  (VMEM, once per block) - in XLA each of those is a full HBM round trip
  over a (K, D, B) array per op on amortized layers.  Callers align the
  batch to a block multiple (models/pdf.py rounds big batches to 8192) so
  no pad-copies of (K, D, B) arrays happen either.

Supported configuration (the recommended production path): classic stretch,
isigmoid / inormal_partly_precise inverse_function_type, no skewness, no
center_mean (raw path).  Everything else falls back to the XLA path in
layers/euclidean.  The mixture evaluation and the iCDF pass use the SAME
formulation as the f32 XLA branch of logistic_kde (linear odds-space
accumulation, logistic_kde.mixture_linear_logs, plus the erfinv-from-
ln_fac pass), so kernel and analytic directions match bit-for-bit in
structure — which is what keeps the f32 sample->log_prob roundtrip at its
rounding-cancellation level on TPU (BASELINE.md item 14).
"""
from __future__ import annotations

import functools
import math as _math
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import logistic_kde

# Interpret mode executes the kernel bodies as plain XLA ops (no Mosaic, no
# TPU needed): hosted CPU CI runs the full kernel math through it
# (tests/test_pallas_interpret.py).  Mosaic's x64 layout-verifier abort does
# not apply - interpret mode never reaches Mosaic.
_INTERPRET = os.environ.get("JAMMY_PALLAS_INTERPRET", "") == "1"


def _pallas_call(kernel, **kwargs):
    return pl.pallas_call(kernel, interpret=_INTERPRET, **kwargs)

BLK_INV = 1024       # batch lanes per inverse-kernel block (multiple of 128;
                     # with the sublane fold 1024 -> (8, 512) blocks,
                     # measured 20.1 -> 16.6 ms/1M on e4/gggg sampling)
BLK_FWD = 1024       # forward kernel: one eval per block -> bigger blocks
                     # amortize grid overhead (measured 4.6 -> 3.2 ms/1M)
# The initial bracket comes from the mixture-quantile bound (see
# _component_bracket): for a monotone mixture CDF, F^-1(q) lies between the
# min and max component quantiles m_k + s_k*logit(q).  That makes the
# bracket ~unit-width instead of 2e5; the two bracket-validity evaluations
# double as a regula-falsi initial iterate (secant through the bracket
# endpoints), so no bisection phase is needed at all before the
# bracket-safeguarded Newton iterations -- 26 mixture evaluations
# (18 value + 8 value&deriv) drop to 6 (2 value + 4 value&deriv).
# N_NEWTON=4 measured IDENTICAL roundtrip error to 8 on both init and
# trained flagship params (q999=2.2e-4, max=7.7e-3 over 200k samples).
N_BISECT = 0
N_NEWTON = 4
LO, HI = -1e5, 1e5
MAX_KERNEL_KD = 512  # VMEM guard: K*D param blocks + temps must fit

_SQRT2 = 1.4142135623730951
_LOG_SQRT_2PI = 0.9189385332046727
_PADE_BOUND = logistic_kde.PADE_BOUND
_PADE_A = logistic_kde.PADE_A
_LOG_4 = logistic_kde.LOG_4
_LOG_SEAM = _math.log(4.0 * _PADE_BOUND * (1.0 - _PADE_BOUND))


def _icdf_pass_kernel(log_cdf, log_sf, ift):
    """In-kernel variant of logistic_kde.icdf_pass.

    Identical formulation to the f32 XLA branch of logistic_kde.icdf_pass
    (log-space seam + erfinv-from-ln_fac) so the solve target matches the
    analytic density pass bit-for-bit in structure.
    """
    if ift == "isigmoid":
        return log_cdf - log_sf
    if ift in ("inormal_partly_crude", "inormal_full_pade"):
        # delegate to the shared f32 XLA formulation (pure jnp, lowers
        # through Mosaic) — expression lockstep with the analytic density
        # pass is then true by construction
        return logistic_kde.icdf_pass(log_cdf, log_sf, ift)
    assert ift == "inormal_partly_precise"
    tiny = 1e-37
    ln_fac_raw = log_cdf + log_sf + _LOG_4
    good = ln_fac_raw > _LOG_SEAM
    ln_fac_mid = jnp.where(good, ln_fac_raw, -1.0)
    xx, ww = logistic_kde.erfinv_f32_args_from_logs(log_cdf, log_sf,
                                                    ln_fac_mid)
    val = _SQRT2 * logistic_kde.erfinv_f32_poly(xx, ww)
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
    if ift in ("inormal_partly_crude", "inormal_full_pade"):
        return logistic_kde.icdf_log_derivative(log_cdf, log_sf, log_pdf,
                                                ift)
    assert ift == "inormal_partly_precise"
    tiny = 1e-37
    ln_fac_raw = log_cdf + log_sf + _LOG_4
    good = ln_fac_raw > _LOG_SEAM
    ln_fac_mid = jnp.where(good, ln_fac_raw, -1.0)
    xx, ww = logistic_kde.erfinv_f32_args_from_logs(log_cdf, log_sf,
                                                    ln_fac_mid)
    ei = logistic_kde.erfinv_f32_poly(xx, ww)
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


def _mixture_value_deriv(x, mix, deriv_mode, ift):
    """Gaussianization value (iCDF pass of the mixture CDF) and derivative.

    x: (D, BLK); mix = (means, inv_widths, log_norm_w, log_skew, signs)
    with (K, D, 1|BLK) slabs, log_norm_w already normalized (log softmax
    over K) and log_skew/signs None for the plain (non-skew) mixture.  Runs
    entirely in registers; the iCDF pass reuses the elementwise ops from
    logistic_kde (pure jnp, lowers through Mosaic).
    deriv_mode: None | "exp" | "log".
    """
    means, inv_widths, log_norm_w, log_skew, signs = mix
    common = (x[None, :, :] - means) * inv_widths          # (K, D, BLK)
    need_pdf = deriv_mode is not None
    if log_skew is not None:
        log_cdf, log_sf, log_pdf = logistic_kde.skew_mixture_logs(
            common, jnp.log(inv_widths), log_norm_w, log_skew, signs,
            need_pdf)
    else:
        # linear odds-space accumulation shared with the f32 XLA branch
        # (logistic_kde.mixture_linear_logs): ~2x cheaper per eval than the
        # softplus + triple-logsumexp chain, and expression-level lockstep
        # keeps kernel vs XLA and sample vs log_prob at shared-rounding
        # parity
        log_cdf, log_sf, log_pdf = logistic_kde.mixture_linear_logs(
            common, jnp.exp(log_norm_w), log_norm_w, inv_widths,
            jnp.log(inv_widths) if need_pdf else None, need_pdf)
    val = _icdf_pass_kernel(log_cdf, log_sf, ift)
    if deriv_mode is None:
        return val, None
    log_deriv = _icdf_log_deriv_kernel(log_cdf, log_sf, log_pdf, ift)
    if deriv_mode == "log":
        return val, log_deriv
    return val, jnp.exp(log_deriv)


def _mixture_value_deriv_solve(x, mix, deriv_mode, ift):
    """Lean solve-side twin of :func:`_mixture_value_deriv`.

    Bracket-bounded solve iterates never take the far-tail fallback branch
    of mixture_linear_logs (at least one component stays within ~25
    width-units), so the where()/max-reduction fallback machinery is
    dropped — the expressions computed here are EXACTLY the selected
    branches of the full variant, so the converged root and its final
    log-det keep bit-level rounding lockstep with the density kernels
    (which is what the f32 sample->log_prob roundtrip cancellation needs).
    The isigmoid Newton derivative additionally takes a linear-space
    shortcut (F + SF == 1 -> d logit(F)/dx = pdf/(F*SF)): the derivative
    only steers convergence, never the converged value, so it needs no
    expression lockstep.

    The skewed mixture has no lean twin: its single log-space formulation
    (skew_mixture_logs) is already the density-direction expression, so the
    solve evaluates exactly it (the isigmoid Newton derivative still takes
    the pdf/(F*SF) shortcut in log space)."""
    means, inv_widths, log_norm_w, log_skew, signs = mix
    if log_skew is not None:
        common = (x[None, :, :] - means) * inv_widths
        need_pdf = deriv_mode is not None
        log_cdf, log_sf, log_pdf = logistic_kde.skew_mixture_logs(
            common, jnp.log(inv_widths), log_norm_w, log_skew, signs,
            need_pdf)
        val = _icdf_pass_kernel(log_cdf, log_sf, ift)
        if deriv_mode is None:
            return val, None
        if deriv_mode == "exp" and ift == "isigmoid":
            return val, jnp.exp(log_pdf - log_cdf - log_sf)
        log_deriv = _icdf_log_deriv_kernel(log_cdf, log_sf, log_pdf, ift)
        if deriv_mode == "log":
            return val, log_deriv
        return val, jnp.exp(log_deriv)
    tiny = 1e-37
    common = (x[None, :, :] - means) * inv_widths          # (K, D, BLK)
    norm_w = jnp.exp(log_norm_w)
    u = jnp.clip(common, -60.0, 60.0)
    e = jnp.exp(u)
    r = 1.0 / (1.0 + e)
    sig = e * r
    F = jnp.sum(norm_w * sig, axis=0)
    SF = jnp.sum(norm_w * r, axis=0)
    log_cdf = jnp.log(jnp.maximum(F, tiny))
    log_sf = jnp.log(jnp.maximum(SF, tiny))
    val = _icdf_pass_kernel(log_cdf, log_sf, ift)
    if deriv_mode is None:
        return val, None
    P = jnp.sum((norm_w * inv_widths) * (sig * r), axis=0)
    if deriv_mode == "exp" and ift == "isigmoid":
        return val, P / jnp.maximum(F * SF, tiny)
    log_pdf = jnp.log(jnp.maximum(P, tiny))
    log_deriv = _icdf_log_deriv_kernel(log_cdf, log_sf, log_pdf, ift)
    if deriv_mode == "log":
        return val, log_deriv
    return val, jnp.exp(log_deriv)


# --------------------------------------------------------------------------
# batch->sublane folding: a (K, D, BLK) mixture layout with D < 8 pads the
# sublane axis to 8 and wastes the VPU (measured 200 ps/elem at D=4 vs
# 112 ps/elem at D=8 for the same element count).  Inside the kernels the
# batch lanes are folded into the unused sublanes: x (D, C) -> (D*f, C/f)
# with row i*D+d holding dimension d of batch chunk i, and the parameter
# slabs folded the same way (broadcast params are tiled), so all mixture
# math runs on full-height (8, lanes) tiles.  Outputs are unfolded before
# the HBM write.  The fold is ordinary slicing+concat, so the in-kernel
# trace-time AD of the backward bodies differentiates straight through it.
# --------------------------------------------------------------------------

def _fold_factor(d, blk):
    """Sublane fold factor: fill 8 sublanes, keep >= 128 folded lanes."""
    if d >= 8:
        return 1
    return max(1, min(8 // d, blk // 128))


def _fold_rows(x, f):
    """(R, f*C) -> (R*f, C): folded[i*R+d, j] = x[d, i*C+j].

    All fold/unfold/tile ops here are reshape->transpose->reshape forms:
    Mosaic compiles those (and their AD transposes, needed by the in-kernel
    backward bodies), while the natural slice+concat forms hit sublane
    offsets inside a tile and crash the Mosaic compiler ("result/input
    offset mismatch on non-concat dimension").
    """
    if f == 1:
        return x
    r, c = x.shape[-2], x.shape[-1] // f
    return x.reshape(r, f, c).transpose(1, 0, 2).reshape(f * r, c)


def _unfold_rows(x, f):
    """Inverse of _fold_rows (2-D only)."""
    if f == 1:
        return x
    r, c = x.shape[-2] // f, x.shape[-1]
    return x.reshape(f, r, c).transpose(1, 0, 2).reshape(r, f * c)


def _fold_param(p, f):
    """Fold a (K, D, 1|f*C) parameter slab to (K, D*f, 1|C), matching the
    _fold_rows row order (row i*D+d = dimension d of batch chunk i)."""
    if f == 1:
        return p
    k, d = p.shape[0], p.shape[1]
    if p.shape[-1] == 1:
        # concat, NOT broadcast_to+reshape: the latter compiles but is
        # silently MIScompiled by Mosaic inside the solve kernels (verified
        # numerically 2026-08-18); the concat and its AD transpose both
        # compile and are correct
        return jnp.concatenate([p] * f, axis=1)
    c = p.shape[-1] // f
    return p.reshape(k, d, f, c).transpose(0, 2, 1, 3).reshape(k, f * d, c)


def _fold_triple(triple, f):
    return tuple(_fold_param(p, f) for p in triple)


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


def _component_bracket(target, mix, ift):
    """Exact initial bracket from the mixture-quantile bound.

    The solve target is (a monotone reparametrization of) a quantile level q;
    for a mixture CDF F = sum_k w_k F_k the quantile F^-1(q) always lies in
    [min_k F_k^-1(q), max_k F_k^-1(q)], and each component inverts
    analytically: plain logistic F_k^-1(q) = m_k + s_k * logit(q); skewed
    logistic (sign +: F_k = sigmoid(c)^a, sign -: F_k = 1 - sigmoid(-c)^a)
    F_k^-1(q) = m_k +- s_k * logit(p) with p = q^(1/a) resp. (1-q)^(1/a).
    Also returns q_k for the weighted-quantile initial iterate.
    """
    means, inv_widths, _, log_skew, signs = mix
    if ift == "isigmoid":
        t = target                      # the target IS logit(q)
    else:
        # inormal_*: target ~= Phi^-1(q)
        t = _logit_phi(target)
    if log_skew is None:
        q_k = means + t[None, :, :] / inv_widths      # (K, D, BLK)
    else:
        pos = signs > 0.0
        log_q = -jax.nn.softplus(-t)[None, :, :]
        log_1mq = -jax.nn.softplus(t)[None, :, :]
        log_p = jnp.where(pos, log_q, log_1mq) / jnp.exp(log_skew)
        # logit(p) = log_p - log(1 - e^log_p), stable as p -> 1 via the
        # series log(1-e^u) = log(-u) + log1p(u/2 + u^2/6 + u^3/24)
        # (Mosaic-safe: no expm1) so extreme-quantile lanes keep an exact
        # bracket instead of falling back to the full [-1e5, 1e5] range
        u = jnp.minimum(log_p, -jnp.finfo(log_p.dtype).tiny)
        us = jnp.where(u > -0.1, u, -0.1)
        series = jnp.log(-us) + jnp.log1p(us * (0.5 + us * (
            1.0 / 6.0 + us * (1.0 / 24.0))))
        ul = jnp.where(u > -0.1, -0.1, u)
        log_1me = jnp.where(u > -0.1, series, jnp.log1p(-jnp.exp(ul)))
        logit_p = log_p - log_1me
        c_q = jnp.where(pos, logit_p, -logit_p)
        q_k = means + c_q / inv_widths
    lo = jnp.min(q_k, axis=0)
    hi = jnp.max(q_k, axis=0)
    if ift == "isigmoid" and log_skew is None:
        # t is EXACTLY logit(q): the bound is mathematically exact, no
        # approximation margin or validity evaluations needed (a hair of
        # slack only for f32 rounding of the endpoint arithmetic)
        margin = 1e-4 * (hi - lo) + 1e-5
    else:
        # margin absorbs the pade-tail mismatch between the kernel's icdf
        # pass and the exact normal quantile used for t (and the floored
        # skew quantiles)
        margin = 0.05 * (hi - lo) + 0.5
    return lo - margin, hi + margin, q_k


def _prep_n_groups(prep, fallback=None):
    """Number of raw mixture parameter groups a prep spec implies:
    means + log_widths [+ log_norms] [+ skew exponents]."""
    if prep is None:
        return fallback
    return 2 + int(bool(prep[2])) + int(len(prep) > 3
                                        and prep[3] is not None)


def _prep_raw_params(slabs, prep):
    """Regulators + mixture-weight normalization on RAW parameter slabs.

    slabs = (means, lw_raw[, ln_raw][, se_raw]) per the prep spec;
    prep = (width_regulator, norm_regulator_or_None, fit_normalization
            [, exponent_regulator_or_None, skew_signs_tuple_or_None]).
    Returns the 5-tuple mix (means, inv_widths, log_norm_w,
    log_skew_or_None, signs_or_None).  Runs inside the kernels (VMEM) for
    the raw path - the XLA formulation of the same ops costs one full HBM
    round trip per (K, D, B) array per op
    (gaussianization_flow.py:261-342 option surface).
    """
    width_reg, norm_reg, fit_norm = prep[0], prep[1], prep[2]
    exp_reg = prep[3] if len(prep) > 3 else None
    signs = prep[4] if len(prep) > 3 else None
    means, lw_raw = slabs[0], slabs[1]
    idx = 2
    lw = width_reg(lw_raw)
    inv_widths = jnp.exp(-lw)
    if fit_norm:
        ln_raw = slabs[idx]
        idx += 1
        ln = norm_reg(ln_raw) if norm_reg is not None else ln_raw
        m = jnp.max(ln, axis=0, keepdims=True)
        log_norm_w = ln - (m + jnp.log(jnp.sum(jnp.exp(ln - m), axis=0,
                                               keepdims=True)))
    else:
        log_norm_w = jnp.full_like(lw, -_math.log(lw.shape[0]))
    if exp_reg is not None:
        log_skew = exp_reg(slabs[idx])
        # synthesize the static +-1 sign pattern in-kernel (Pallas forbids
        # captured array constants): the pattern is +1^n_pos then -1 by
        # construction (layers/euclidean.py), so an iota threshold suffices
        n_pos = sum(1 for s in signs if s > 0)
        assert all((s > 0) == (i < n_pos) for i, s in enumerate(signs)), \
            "skew signs must be a +1-prefix pattern"
        idx_k = jax.lax.broadcasted_iota(jnp.int32, (len(signs), 1, 1), 0)
        signs_arr = jnp.where(idx_k < n_pos, jnp.asarray(1.0, lw.dtype),
                              jnp.asarray(-1.0, lw.dtype))
    else:
        log_skew, signs_arr = None, None
    return means, inv_widths, log_norm_w, log_skew, signs_arr


def _solve(target, mix, ift):
    """Bracket-safeguarded Newton solve in VMEM.

    Plain isigmoid: the component-quantile bracket is EXACT, so the two
    bracket-validity evaluations are skipped entirely and the initial
    iterate is the normalized-weight average of the component quantiles
    (2 of ~9.5 evaluation-units saved per solve).  inormal_* and skewed
    mixtures: validity evaluations + regula-falsi init (the bracket
    endpoints are approximate).
    """
    log_norm_w = mix[2]
    lo, hi, q_k = _component_bracket(target, mix, ift)
    if ift == "isigmoid" and mix[3] is None:
        x = jnp.sum(jnp.exp(log_norm_w) * q_k, axis=0)
        x = jnp.clip(x, lo, hi)
    else:
        # validity check: where the margin did not cover the approximation
        # error (rare far-tail lanes), fall back to the full bracket
        vlo, _ = _mixture_value_deriv_solve(lo, mix, None, ift)
        vhi, _ = _mixture_value_deriv_solve(hi, mix, None, ift)
        good = (vlo <= target) & (vhi >= target)
        # regula-falsi initial iterate from the two bracket-check
        # evaluations (secant through the endpoints); for good lanes t is
        # in [0, 1] by construction so x0 stays inside the bracket
        t = (target - vlo) / jnp.maximum(vhi - vlo, 1e-30)
        x_rf = lo + t * (hi - lo)
        lo = jnp.where(good, lo, LO)
        hi = jnp.where(good, hi, HI)
        x = jnp.where(good, x_rf, 0.0)

    # NOTE: the iteration loops are UNROLLED Python loops, not lax.fori_loop:
    # trip counts are tiny static constants, and under jax_enable_x64 a
    # fori_loop's int64 counter reaching Mosaic crashes its layout checks
    # ("bitwidth_ <= 32"), which would break f32 kernels in x64 sessions
    # (the high_precision_tail_newton workflow).
    for _ in range(N_BISECT):
        mid = 0.5 * (lo + hi)
        val, _ = _mixture_value_deriv_solve(mid, mix, None, ift)
        right = val < target
        lo, hi = jnp.where(right, mid, lo), jnp.where(right, hi, mid)
    if N_BISECT:
        x = jnp.clip(x, lo, hi)

    for _ in range(N_NEWTON):
        val, deriv = _mixture_value_deriv_solve(x, mix, "exp", ift)
        right = val < target
        lo = jnp.where(right, x, lo)
        hi = jnp.where(right, hi, x)
        x_new = x - (val - target) / deriv
        # bracket-safeguard: out-of-bracket or non-finite Newton steps
        # take the bisection midpoint instead (keeps the worst-case
        # contraction of bisection with the typical-case speed of Newton)
        bad = (~jnp.isfinite(x_new)) | (x_new < lo) | (x_new > hi)
        x = jnp.where(bad, 0.5 * (lo + hi), x_new)
    return x


def _lazy_slabs(arrs, lazy_kd, fold=1):
    """Final MLP matmul in VMEM: [hidden (H, BLK), wcat (P, H), bcat (P, 1)]
    -> per-group raw slabs (P = n_groups * K * D).

    This is the lazy-parameter hot path (ops/lazy_params.py): the (B, P)
    parameter tensor the reference materializes per call
    (main/default.py:949-956) never exists in HBM.  All parameter groups
    ride ONE MXU matmul: separate per-group (K*D, H) dots each pad K*D~40
    rows up to the 128-row MXU tile, tripling the matmul work.

    With fold > 1 the matmul runs per batch chunk and the chunk slabs are
    concatenated along the D axis, producing (K, D*fold, BLK/fold) slabs
    directly in the sublane-folded layout -- cheaper than folding the
    (K, D, BLK) matmul output with 4-D transposes afterwards."""
    k, d = lazy_kd
    kd = k * d
    h, wcat, bcat = arrs
    if fold == 1:
        p = jnp.dot(wcat, h, preferred_element_type=h.dtype) + bcat
        return [p[i:i + kd].reshape(k, d, h.shape[-1])
                for i in range(0, wcat.shape[0], kd)]
    c = h.shape[-1] // fold
    chunks = []
    for i in range(fold):
        p = jnp.dot(wcat, h[:, i * c:(i + 1) * c],
                    preferred_element_type=h.dtype) + bcat
        chunks.append([p[o:o + kd].reshape(k, d, c)
                       for o in range(0, wcat.shape[0], kd)])
    return [jnp.concatenate([ch[g] for ch in chunks], axis=1)
            for g in range(len(chunks[0]))]


def _fold_mix(mix, fold):
    """Sublane-fold a prepared 5-tuple mix (signs are (K, 1, 1) and
    broadcast over the folded D axis unchanged)."""
    means, inv_widths, log_norm_w, log_skew, signs = mix
    means, inv_widths, log_norm_w = _fold_triple(
        (means, inv_widths, log_norm_w), fold)
    if log_skew is not None:
        log_skew = _fold_param(log_skew, fold)
    return means, inv_widths, log_norm_w, log_skew, signs


def _read_params(param_refs, broadcast, prep, lazy_kd=None, fold=1):
    """Load, prep, and sublane-fold the mixture parameters of one block."""
    arrs = [r[:] for r in param_refs]
    if lazy_kd is not None:
        # lazy slabs are BORN folded; the elementwise regulators commute
        # with the fold
        slabs = _lazy_slabs(arrs, lazy_kd, fold)
        return _prep_raw_params(slabs, prep)
    if broadcast:
        arrs = [a[:, :, None] for a in arrs]          # (K, D, 1)
    if prep is None:
        mix = tuple(arrs) + (None, None)
    else:
        mix = _prep_raw_params(tuple(arrs), prep)
    return _fold_mix(mix, fold)


def _make_inverse_kernel(ift, broadcast, prep, lazy_kd=None, fold=1):
    def kernel(target_ref, *refs):
        param_refs, out_ref = refs[:-1], refs[-1]
        target = _fold_rows(target_ref[:], fold)      # (D*f, BLK/f)
        mix = _read_params(param_refs, broadcast, prep, lazy_kd, fold)
        out_ref[:] = _unfold_rows(_solve(target, mix, ift), fold)
    return kernel


def _make_forward_kernel(ift, broadcast, prep, lazy_kd=None, fold=1):
    """Density-direction kernel: (val, log_deriv) of the gaussianization
    pass, all (K, D, BLK) mixture intermediates in VMEM."""
    def kernel(x_ref, *refs):
        param_refs, val_ref, ld_ref = refs[:-2], refs[-2], refs[-1]
        x = _fold_rows(x_ref[:], fold)                # (D*f, BLK/f)
        mix = _read_params(param_refs, broadcast, prep, lazy_kd, fold)
        val, log_deriv = _mixture_value_deriv(x, mix, "log", ift)
        val_ref[:] = _unfold_rows(val, fold)
        ld_ref[:] = _unfold_rows(log_deriv, fold)
    return kernel


def _make_sample_kernel(ift, broadcast, prep, lazy_kd=None, fold=1):
    """Fused sampling-direction kernel: Newton solve + final density
    evaluation at the solution, one launch -> (x, log|d/dx| at x).

    Saves the separate forward-kernel launch of the unfused path -- on
    amortized layers that launch re-reads all (K, D, B) parameter slabs
    from HBM."""
    def kernel(target_ref, *refs):
        param_refs, x_ref, ld_ref = refs[:-2], refs[-2], refs[-1]
        target = _fold_rows(target_ref[:], fold)      # (D*f, BLK/f)
        mix = _read_params(param_refs, broadcast, prep, lazy_kd, fold)
        x = _solve(target, mix, ift)
        _, log_deriv = _mixture_value_deriv_solve(x, mix, "log", ift)
        x_ref[:] = _unfold_rows(x, fold)
        ld_ref[:] = _unfold_rows(log_deriv, fold)
    return kernel


BLK_BWD = 1024       # backward kernel block width


def _local_density_fn(ift, broadcast, prep, lazy_kd, fold=1):
    """The in-kernel differentiation target: (val, log_deriv) as a pure
    function of (x, *params) exactly as the forward kernels compute it.
    Takes/returns io-layout (D, BLK) arrays; the sublane fold happens inside
    so trace-time AD differentiates through the slicing/concat for free."""
    def local_f(xx, *ps):
        if lazy_kd is not None:
            slabs = _lazy_slabs(list(ps), lazy_kd, fold)
            mix = _prep_raw_params(slabs, prep)
        else:
            if broadcast:
                ps = [p[:, :, None] for p in ps]
            if prep is None:
                mix = tuple(ps) + (None, None)
            else:
                mix = _prep_raw_params(tuple(ps), prep)
            mix = _fold_mix(mix, fold)
        val, log_deriv = _mixture_value_deriv(
            _fold_rows(xx, fold), mix, "log", ift)
        return _unfold_rows(val, fold), _unfold_rows(log_deriv, fold)
    return local_f


def _write_param_grads(gparam_refs, grads, accum):
    """accum[i]: reduce-and-accumulate across the sequential grid (broadcast
    weights); else write the per-block gradient slice."""
    for gref, g, acc in zip(gparam_refs, grads, accum):
        if acc:
            @pl.when(pl.program_id(0) == 0)
            def _(gref=gref):
                gref[:] = jnp.zeros_like(gref)
            gref[:] += g
        else:
            gref[:] = g


def _forward_bwd_body(ift, broadcast, prep, n_params, lazy_kd, accum,
                      fold=1):
    """Backward of the density pass, entirely in VMEM.

    jax.vjp runs at TRACE time inside the kernel body: it only unrolls the
    chain rule into more elementwise ops, which Mosaic compiles like the
    forward ones - so the backward never materializes a (K, D, B)
    intermediate to HBM (the XLA vjp of the same math measured ~3.6x the
    forward cost on the flagship, HBM-bound).  Gradients are exact vjps of
    the SAME formulation the forward kernel computes.
    """
    def kernel(*refs):
        x_ref = refs[0]
        param_refs = refs[1:1 + n_params]
        gval_ref, gld_ref = refs[1 + n_params], refs[2 + n_params]
        gx_ref = refs[3 + n_params]
        gparam_refs = refs[4 + n_params:]
        local_f = _local_density_fn(ift, broadcast, prep, lazy_kd, fold)
        _, vjp = jax.vjp(local_f, x_ref[:], *[r[:] for r in param_refs])
        grads = vjp((gval_ref[:], gld_ref[:]))
        gx_ref[:] = grads[0]
        _write_param_grads(gparam_refs, grads[1:], accum)
    return kernel


def _sample_bwd_body(ift, broadcast, prep, n_params, lazy_kd, accum,
                     fold=1):
    """Backward of the fused sampling pass (solve + density), in VMEM.

    Implicit-function theorem at the solution x = f^-1(target):
      c = (gx + gld * L_x) / f'   ->   target_bar = c,
      params_bar = vjp_params(f, L)(-c, gld)
    with (f', L_x) from one in-kernel jvp and the vjp also in-kernel (both
    are trace-time transforms that lower to more elementwise Mosaic ops)."""
    def kernel(*refs):
        x_ref = refs[0]
        param_refs = refs[1:1 + n_params]
        gx_ref, gld_ref = refs[1 + n_params], refs[2 + n_params]
        gt_ref = refs[3 + n_params]
        gparam_refs = refs[4 + n_params:]
        x = x_ref[:]
        loaded = [r[:] for r in param_refs]
        local_f = _local_density_fn(ift, broadcast, prep, lazy_kd, fold)

        _, (fp, lx) = jax.jvp(lambda xx: local_f(xx, *loaded), (x,),
                              (jnp.ones_like(x),))
        c = (gx_ref[:] + gld_ref[:] * lx) / fp
        gt_ref[:] = c
        _, vjp = jax.vjp(lambda *ps: local_f(x, *ps), *loaded)
        grads = vjp((-c, gld_ref[:]))
        _write_param_grads(gparam_refs, grads, accum)
    return kernel


def _param_specs(params, d, blk, lazy_kd):
    """BlockSpecs + grid-accumulate flags + per-block param shapes.

    Three parameter interfaces share the kernels:
      broadcast:  (K, D) arrays, revisited each block (accumulate grads)
      per-sample: (K, D, B) slabs, blocked along B (per-block grads)
      lazy:       [hidden (H, B) blocked along B] + concatenated
                  wcat (P, H), bcat (P, 1) broadcast arrays
                  (accumulate w/b grads, per-block hidden)
    """
    if lazy_kd is not None:
        specs = [pl.BlockSpec((params[0].shape[0], blk), lambda i: (0, i),
                              memory_space=pltpu.VMEM)]
        accum = [False]
        for p in params[1:]:
            specs.append(pl.BlockSpec(p.shape, lambda i: (0, 0),
                                      memory_space=pltpu.VMEM))
            accum.append(True)
        return specs, accum
    if params[0].ndim == 2:
        return [pl.BlockSpec(p.shape, lambda i: (0, 0),
                             memory_space=pltpu.VMEM) for p in params], \
            [True] * len(params)
    k = params[0].shape[0]
    return [pl.BlockSpec((k, d, blk), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM)] * len(params), \
        [False] * len(params)


def _grad_out_shapes(params, b, lazy_kd):
    """Gradient output ShapeDtypeStructs matching the params interface."""
    if lazy_kd is not None:
        return [jax.ShapeDtypeStruct((params[0].shape[0], b),
                                     params[0].dtype)] + [
            jax.ShapeDtypeStruct(p.shape, p.dtype) for p in params[1:]]
    return [jax.ShapeDtypeStruct(p.shape, p.dtype) for p in params]


@functools.partial(jax.jit, static_argnames=("ift", "prep", "body",
                                             "lazy_kd"))
def _gf_bwd_call(x_t, params, g1_t, g2_t, ift, prep, body, lazy_kd=None):
    """x_t/g1_t/g2_t: (D, B) with B a multiple of BLK_BWD; params as in
    _gf_kernel_call.  Returns (gx_or_gtarget_t, *gparams) with gparams
    matching the params interface.  body selects the kernel: "forward"
    (density-pass vjp) or "sample" (implicit-gradient solve vjp)."""
    d, b = x_t.shape
    broadcast = params[0].ndim == 2 and lazy_kd is None
    grid = (b // BLK_BWD,)
    io_spec = pl.BlockSpec((d, BLK_BWD), lambda i: (0, i),
                           memory_space=pltpu.VMEM)
    p_specs, accum = _param_specs(params, d, BLK_BWD, lazy_kd)
    out_shapes = [jax.ShapeDtypeStruct((d, b), x_t.dtype)] + \
        _grad_out_shapes(params, b, lazy_kd)
    make_body = (_forward_bwd_body if body == "forward"
                 else _sample_bwd_body)
    return _pallas_call(
        make_body(ift, broadcast, prep, len(params), lazy_kd, tuple(accum),
                  _fold_factor(d, BLK_BWD)),
        out_shape=out_shapes, grid=grid,
        in_specs=[io_spec] + p_specs + [io_spec, io_spec],
        out_specs=[io_spec] + p_specs,
    )(x_t, *params, g1_t, g2_t)


@functools.partial(jax.jit, static_argnames=("ift", "prep", "mode", "blk",
                                             "lazy_kd"))
def _gf_kernel_call(target_t, params, ift, prep, mode, blk, lazy_kd=None):
    """target_t: (D, B) with B a multiple of blk; params: tuple of (K, D)
    [broadcast] or (K, D, B) [per-sample] arrays - prepared triple when
    prep is None, raw slabs otherwise - or the lazy interface
    [hidden (H, B), wcat (P, H), bcat (P, 1)] when lazy_kd=(K, D)."""
    d, b = target_t.shape
    broadcast = params[0].ndim == 2 and lazy_kd is None
    grid = (b // blk,)
    io_spec = pl.BlockSpec((d, blk), lambda i: (0, i),
                           memory_space=pltpu.VMEM)
    p_specs, _ = _param_specs(params, d, blk, lazy_kd)
    out = jax.ShapeDtypeStruct((d, b), target_t.dtype)
    if mode == "forward":
        return _pallas_call(
            _make_forward_kernel(ift, broadcast, prep, lazy_kd,
                                 _fold_factor(d, blk)),
            out_shape=[out, out], grid=grid,
            in_specs=[io_spec] + p_specs, out_specs=[io_spec, io_spec],
        )(target_t, *params)
    if mode == "sample":
        return _pallas_call(
            _make_sample_kernel(ift, broadcast, prep, lazy_kd,
                                _fold_factor(d, blk)),
            out_shape=[out, out], grid=grid,
            in_specs=[io_spec] + p_specs, out_specs=[io_spec, io_spec],
        )(target_t, *params)
    return _pallas_call(
        _make_inverse_kernel(ift, broadcast, prep, lazy_kd,
                             _fold_factor(d, blk)),
        out_shape=out, grid=grid,
        in_specs=[io_spec] + p_specs, out_specs=io_spec,
    )(target_t, *params)


def _pad_call(target, params, ift, prep, mode, blk, lazy_kd=None):
    """Transpose target, pad batch to a blk multiple if needed (callers that
    round their batch to 8192 never pad), run the kernel, slice back."""
    b, d = target.shape
    pad = (-b) % blk
    tt = target.T
    if pad:
        tt = jnp.pad(tt, ((0, 0), (0, pad)))
        if lazy_kd is not None:
            # zero-padded hidden lanes -> params = bias only (benign)
            params = (jnp.pad(params[0], ((0, 0), (0, pad))),) + \
                tuple(params[1:])
        elif params[0].ndim == 3:
            # benign values: padded lanes solve a well-posed unit mixture
            pads = []
            for i, p in enumerate(params):
                cv = 1.0 if (prep is None and i == 1) else 0.0
                pads.append(jnp.pad(p, ((0, 0), (0, 0), (0, pad)),
                                    constant_values=cv))
            params = tuple(pads)
    res = _gf_kernel_call(tt, tuple(params), ift, prep, mode, blk, lazy_kd)
    if mode in ("forward", "sample"):
        return res[0][:, :b].T, res[1][:, :b].T
    return res[:, :b].T


# ---------------------------------------------------------------------------
# PREPARED-parameter API (XLA-side regulators; kept for the non-raw paths)
# ---------------------------------------------------------------------------

def _prepare_xla(means, log_widths, log_norms):
    """exp/normalize prepared params in XLA (squeeze broadcast Bp=1)."""
    if means.shape[-1] == 1:
        means = means[..., 0]
        inv_widths = jnp.exp(-log_widths[..., 0])
        lnw = log_norms[..., 0]
    else:
        inv_widths = jnp.exp(-log_widths)
        lnw = log_norms
    log_norm_w = lnw - jax.scipy.special.logsumexp(lnw, axis=0, keepdims=True)
    return means, inv_widths, log_norm_w


def gf_inverse_pallas(target, means, log_widths, log_norms, ift="isigmoid"):
    """Solve gaussianization(x) = target for x, fused in VMEM.

    target: (B, D); prepared params B-minor (K, D, Bp), Bp in {1, B}."""
    p = _prepare_xla(means, log_widths, log_norms)
    return _pad_call(target, p, ift, None, "inverse", BLK_INV)


def _gf_forward_impl(x, means, log_widths, log_norms, ift):
    p = _prepare_xla(means, log_widths, log_norms)
    return _pad_call(x, p, ift, None, "forward", BLK_FWD)


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


# ---------------------------------------------------------------------------
# RAW-parameter API (regulators fused into the kernels)
# ---------------------------------------------------------------------------

def raw_kernel_eligible(num_kde, d):
    return num_kde * d <= MAX_KERNEL_KD


def _raw_params_tuple(slabs):
    if slabs[0].shape[-1] == 1:
        return tuple(p[..., 0] for p in slabs)
    return tuple(slabs)


def _gf_forward_raw_impl(x, slabs, ift, prep):
    k, d = slabs[0].shape[0], x.shape[1]
    if not raw_kernel_eligible(k, d):
        mix = _prep_raw_params(slabs, prep)
        if mix[3] is not None:
            # skewed + over the VMEM guard: plain XLA formulation (no
            # prepared-kernel interface for the skew chain)
            return _xla_density_fn(ift, prep)(x, slabs)
        return _pad_call(x, _prepare_xla(mix[0], -jnp.log(mix[1]), mix[2]),
                         ift, None, "forward", BLK_FWD)
    return _pad_call(x, _raw_params_tuple(slabs), ift, prep,
                     "forward", BLK_FWD)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def gf_forward_raw(x, slabs, ift, prep):
    """Density-direction pass on RAW parameter slabs (means, lw_raw
    [, ln_raw][, se_raw]): regulators + normalization + mixture + iCDF
    fused in one kernel.  Backward falls back to jax.vjp of the XLA
    formulation (gradients identical to the non-kernel path)."""
    return _gf_forward_raw_impl(x, slabs, ift, prep)


def _gf_forward_raw_fwd(x, slabs, ift, prep):
    out = _gf_forward_raw_impl(x, slabs, ift, prep)
    return out, (x, slabs)


def _pad_call_bwd(x, params, g1, g2, ift, prep, body, lazy_kd=None):
    """Backward-kernel wrapper: transpose, pad (zero cotangents on padded
    lanes contribute zero gradient), call, slice back."""
    b, d = x.shape
    pad = (-b) % BLK_BWD
    xt, g1t, g2t = x.T, g1.T, g2.T
    per_sample = params[0].ndim == 3 and lazy_kd is None
    if pad:
        xt = jnp.pad(xt, ((0, 0), (0, pad)))
        g1t = jnp.pad(g1t, ((0, 0), (0, pad)))
        g2t = jnp.pad(g2t, ((0, 0), (0, pad)))
        if lazy_kd is not None:
            params = (jnp.pad(params[0], ((0, 0), (0, pad))),) + \
                tuple(params[1:])
        elif per_sample:
            pads = []
            for i, p in enumerate(params):
                cv = 1.0 if (prep is None and i == 1) else 0.0
                pads.append(jnp.pad(p, ((0, 0), (0, 0), (0, pad)),
                                    constant_values=cv))
            params = tuple(pads)
    outs = _gf_bwd_call(xt, tuple(params), g1t, g2t, ift, prep, body,
                        lazy_kd)
    gx = outs[0][:, :b].T
    if lazy_kd is not None:
        gparams = [outs[1][:, :b]] + list(outs[2:])
    else:
        gparams = [g[:, :, :b] if per_sample else g for g in outs[1:]]
    return gx, gparams


def _gf_forward_raw_bwd(ift, prep, res, cts):
    x, slabs = res
    k, d = slabs[0].shape[0], x.shape[1]
    if raw_kernel_eligible(k, d) and pallas_available():
        # fused VMEM backward (exact vjp of the kernel formulation)
        ps = _raw_params_tuple(slabs)
        gx, gparams = _pad_call_bwd(x, ps, cts[0], cts[1], ift, prep,
                                    "forward")
        if slabs[0].shape[-1] == 1:
            gparams = [g[..., None] for g in gparams]
        return gx, tuple(gparams)
    f = _xla_density_fn(ift, prep)
    _, vjp = jax.vjp(f, x, slabs)
    return vjp(cts)


gf_forward_raw.defvjp(_gf_forward_raw_fwd, _gf_forward_raw_bwd)


def _xla_density_fn(ift, prep):
    """(val, log_deriv) of the gaussianization pass on raw slabs, XLA
    formulation with the regulators applied -- the differentiation reference
    for the fused kernels' backward passes.  Takes the slab tuple
    (means, lw_raw[, ln_raw][, se_raw]) per the prep spec."""
    width_reg, norm_reg, fit_norm = prep[0], prep[1], prep[2]
    exp_reg = prep[3] if len(prep) > 3 else None
    signs = prep[4] if len(prep) > 3 else None

    def f(xx, slabs):
        lw = width_reg(slabs[1])
        idx = 2
        if fit_norm:
            lnr = slabs[idx]
            idx += 1
            ln = norm_reg(lnr) if norm_reg is not None else lnr
        else:
            ln = jnp.zeros_like(lw)
        if exp_reg is not None:
            log_skew = exp_reg(slabs[idx])
            signs_arr = jnp.asarray(signs, xx.dtype).reshape(-1, 1, 1)
            return logistic_kde.gaussianize_forward(
                xx, slabs[0], lw, ln, log_skew, signs_arr,
                add_skewness=True, inverse_function_type=ift)
        zeros = jnp.zeros((1, 1, 1), xx.dtype)
        ones = jnp.ones((1, 1, 1), xx.dtype)
        return logistic_kde.gaussianize_forward(
            xx, slabs[0], lw, ln, zeros, ones, add_skewness=False,
            inverse_function_type=ift)

    return f


def _gf_sample_raw_impl(target, slabs, ift, prep):
    k, d = slabs[0].shape[0], target.shape[1]
    if not raw_kernel_eligible(k, d):
        mix = _prep_raw_params(slabs, prep)
        assert mix[3] is None, \
            "skewed solve over the VMEM guard: use the XLA row path"
        p = _prepare_xla(mix[0], -jnp.log(mix[1]), mix[2])
        x = _pad_call(target, p, ift, None, "inverse", BLK_INV)
        return _pad_call(x, p, ift, None, "forward", BLK_FWD)
    return _pad_call(target, _raw_params_tuple(slabs), ift,
                     prep, "sample", BLK_INV)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def gf_sample_raw(target, slabs, ift, prep):
    """Fused sampling-direction pass on RAW parameter slabs: Newton solve +
    density evaluation at the solution in ONE kernel launch ->
    (x, log|dgauss/dx| at x).

    Gradients: implicit-function theorem for the solve joint with the chain
    rule for the density output, evaluated against the XLA formulation --
    identical to composing ops.inverse.make_inverse_fn with the forward
    pass's vjp, at one launch less."""
    return _gf_sample_raw_impl(target, slabs, ift, prep)


def _gf_sample_raw_fwd(target, slabs, ift, prep):
    out = _gf_sample_raw_impl(target, slabs, ift, prep)
    return out, (out[0], slabs)


def _gf_sample_raw_bwd(ift, prep, res, cts):
    x, slabs = res
    gx, gld = cts
    k, d = slabs[0].shape[0], x.shape[1]
    if raw_kernel_eligible(k, d) and pallas_available():
        # fused VMEM backward (implicit gradients of the kernel formulation)
        ps = _raw_params_tuple(slabs)
        gt, gparams = _pad_call_bwd(x, ps, gx, gld, ift, prep, "sample")
        if slabs[0].shape[-1] == 1:
            gparams = [g[..., None] for g in gparams]
        return gt, tuple(gparams)
    f = _xla_density_fn(ift, prep)
    # x = f^-1(target, p), ld = L(x, p):
    #   dx/dtarget = 1/f',             dx/dp  = -f_p / f'
    #   dld/dtarget = L_x / f',        dld/dp = L_p - L_x f_p / f'
    # so with c = (gx + gld L_x)/f':
    #   target_bar = c,  p_bar = vjp_p(f, L)(-c, gld)
    _, (fprime, lx) = jax.jvp(
        lambda xx: f(xx, slabs), (x,), (jnp.ones_like(x),))
    c = (gx + gld * lx) / fprime
    _, vjp_fn = jax.vjp(lambda ss: f(x, ss), slabs)
    (gs,) = vjp_fn((-c, gld))
    return c, gs


gf_sample_raw.defvjp(_gf_sample_raw_fwd, _gf_sample_raw_bwd)


def gf_inverse_raw(target, slabs, ift, prep):
    """Sampling-direction solve on RAW parameter slabs.  No custom_vjp: this
    is used as the `solver` inside ops.inverse.make_inverse_fn, which wraps
    the solve in implicit-function gradients."""
    k, d = slabs[0].shape[0], target.shape[1]
    if not raw_kernel_eligible(k, d):
        mix = _prep_raw_params(slabs, prep)
        assert mix[3] is None, \
            "skewed solve over the VMEM guard: use the XLA row path"
        return _pad_call(target, _prepare_xla(mix[0], -jnp.log(mix[1]),
                                              mix[2]), ift,
                         None, "inverse", BLK_INV)
    return _pad_call(target, _raw_params_tuple(slabs), ift,
                     prep, "inverse", BLK_INV)


# ---------------------------------------------------------------------------
# LAZY-parameter API (final MLP matmul fused into the kernels)
# ---------------------------------------------------------------------------

MAX_KERNEL_H = 1024  # VMEM guard for the in-kernel final-matmul hidden dim


def lazy_kernel_eligible(num_kde, d, hidden_dim):
    return num_kde * d <= MAX_KERNEL_KD and hidden_dim <= MAX_KERNEL_H


def _lazy_tuple(hidden, ws, bs):
    """Kernel param list: hidden batch-minor + ONE concatenated (P, H)
    weight / (P, 1) bias pair covering all parameter groups (single MXU
    matmul in-kernel).  XLA CSEs the hidden transpose across the per-layer
    kernel calls."""
    return (hidden.T, jnp.concatenate(list(ws), axis=0),
            jnp.concatenate(list(bs), axis=0)[:, None])


def _split_lazy_grads(gp, ws):
    """Split the concatenated (P, H)/(P, 1) w/b grads back per group."""
    gh, gw, gb = gp[0].T, gp[1], gp[2][:, 0]
    gws, gbs, row = [], [], 0
    for w in ws:
        n = w.shape[0]
        gws.append(gw[row:row + n])
        gbs.append(gb[row:row + n])
        row += n
    return gh, tuple(gws), tuple(gbs)


def _gf_forward_lazy_impl(x, hidden, ws, bs, ift, prep, kd):
    return _pad_call(x, _lazy_tuple(hidden, ws, bs),
                     ift, prep, "forward", BLK_FWD, kd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def gf_forward_lazy(x, hidden, ws, bs, ift, prep, kd):
    """Density-direction pass with the final MLP matmul fused in-kernel:
    (val, log_deriv) from (x, hidden, final weight/bias column groups),
    ws/bs tuples of per-group (P_g, H)/(P_g,) arrays in slab order.

    The (B, P) parameter slab never exists in HBM; backward runs in the
    VMEM backward kernel (in-kernel vjp through the matmul, regulators and
    mixture chain), accumulating w/b gradients across the sequential grid."""
    return _gf_forward_lazy_impl(x, hidden, ws, bs, ift, prep, kd)


def _gf_forward_lazy_fwd(x, hidden, ws, bs, ift, prep, kd):
    out = _gf_forward_lazy_impl(x, hidden, ws, bs, ift, prep, kd)
    return out, (x, hidden, ws, bs)


def _gf_forward_lazy_bwd(ift, prep, kd, res, cts):
    x, hidden, ws, bs = res
    gx, gp = _pad_call_bwd(x, _lazy_tuple(hidden, ws, bs),
                           cts[0], cts[1], ift, prep, "forward", kd)
    return (gx,) + _split_lazy_grads(gp, ws)


gf_forward_lazy.defvjp(_gf_forward_lazy_fwd, _gf_forward_lazy_bwd)


def _gf_sample_lazy_impl(target, hidden, ws, bs, ift, prep, kd):
    return _pad_call(target, _lazy_tuple(hidden, ws, bs),
                     ift, prep, "sample", BLK_INV, kd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def gf_sample_lazy(target, hidden, ws, bs, ift, prep, kd):
    """Fused sampling pass with in-kernel parameter prediction: Newton
    solve + density evaluation, (B, P) slab never in HBM ->
    (x, log|dgauss/dx| at x).  Implicit-gradient backward in VMEM."""
    return _gf_sample_lazy_impl(target, hidden, ws, bs, ift, prep, kd)


def _gf_sample_lazy_fwd(target, hidden, ws, bs, ift, prep, kd):
    out = _gf_sample_lazy_impl(target, hidden, ws, bs, ift, prep, kd)
    return out, (out[0], hidden, ws, bs)


def _gf_sample_lazy_bwd(ift, prep, kd, res, cts):
    x, hidden, ws, bs = res
    gt, gp = _pad_call_bwd(x, _lazy_tuple(hidden, ws, bs),
                           cts[0], cts[1], ift, prep, "sample", kd)
    return (gt,) + _split_lazy_grads(gp, ws)


gf_sample_lazy.defvjp(_gf_sample_lazy_fwd, _gf_sample_lazy_bwd)


def pallas_available():
    # Interpret mode (CPU CI): the kernel bodies execute as plain XLA ops,
    # so neither a TPU nor Mosaic is involved and the x64 gate below does
    # not apply (the abort lives in Mosaic's layout verifier).
    if _INTERPRET:
        return True
    # x64 sessions: Mosaic's layout verifier rejects the 64-bit index types
    # an x64 trace emits — even a trivial copy kernel aborts compilation
    # ("Check failed: bitwidth_ <= 32", minimal repro 2026-08-19).  The XLA
    # formulations are correct under x64 (and are what the
    # high_precision_tail_newton refinement needs), so all kernels gate off.
    if jax.config.jax_enable_x64:
        return False
    try:
        return jax.devices()[0].platform not in ("cpu",)
    except Exception:
        return False


# backwards-compat alias
def gf_inverse_isigmoid_pallas(target, means, log_widths, log_norms):
    return gf_inverse_pallas(target, means, log_widths, log_norms,
                             ift="isigmoid")
