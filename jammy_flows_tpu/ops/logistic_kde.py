"""Logistic-mixture KDE kernels for the Gaussianization flow.

TPU-native reimplementation of the `g` flow's 1-D kernel math
(reference jammy_flows/layers/euclidean/gaussianization_flow.py:389-695):

  * log CDF / log SF / log PDF of a normalized logistic mixture
    (optionally with skewness via per-kernel exponents and +/- signs)
  * four inverse-Gaussian-CDF pass variants that map CDF-space to an
    unbounded "gaussianized" coordinate:
       - isigmoid              : log CDF - log SF  (logit, log-space stable)
       - inormal_partly_precise: exact ndtri in the bulk + pade tails
       - inormal_partly_crude  : exact ndtri in the bulk + crude tails
       - inormal_full_pade     : pade approximation of sqrt(2)*erfinv everywhere
  * log-derivatives of each variant (needed for the flow log-det)

Shapes: x is (B, D); mixture params are in B-MINOR layout (K, D, Bp) with
Bp in {1, B}.  The batch axis must be the minor (lane) dimension on TPU:
(B, K, D) layouts get their last two dims tile-padded to (16, 128) by XLA -
a ~50x memory/bandwidth blowup measured on v5e.  All reductions over the K
axis are logsumexp contractions over axis 0.
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from .special import log_one_plus_exp_x_to_a_minus_1

PADE_BOUND = 0.5e-7
PADE_A = 0.147
SQRT2 = math.sqrt(2.0)
LOG_SQRT_2PI = 0.5 * math.log(2.0 * math.pi)
LOG_4 = math.log(4.0)
# derivative of the pade icdf at cdf=0.5 (numerically unstable there):
LOG_CENTER_DERIV = math.log(2.506628)
# f32 full_pade near-center band (|2c-1| <= this): the pade expressions are
# f32-unstable there -- F2 - F ~ 0.785*|ln_fac| underflows against F^2's ulp
# and the log-derivative amplifies ln_fac's ~6e-8 f32 rounding by 1/|ln_fac|
# (~6e-6 at the 0.1 band edge).  Inside the band the erfinv series with
# the cubic term is ~1e-6-absolute accurate.
FULL_PADE_F32_CENTER = 0.1
SQRT_HALF_PI = math.sqrt(math.pi / 2.0)     # slope of sqrt(2)*erfinv at 0
ERFINV_SLOPE = math.sqrt(math.pi) / 2.0
ERFINV_CUBIC = math.pi / 12.0               # erfinv ~ (sqrt(pi)/2)(x+pi/12 x^3)


def _linear_logs_pdf_primal(common, norm_w, log_norm_w, inv_widths,
                            log_inv_widths):
    tiny = jnp.finfo(common.dtype).tiny
    u = jnp.clip(common, -60.0, 60.0)
    e = jnp.exp(u)
    r = 1.0 / (1.0 + e)
    sig = e * r
    F = jnp.sum(norm_w * sig, axis=0)
    SF = jnp.sum(norm_w * r, axis=0)
    neg_all = jnp.max(common, axis=0) < -55.0
    pos_all = jnp.min(common, axis=0) > 55.0
    mc = jnp.max(log_norm_w + jnp.minimum(common, 0.0), axis=0)
    ms = jnp.max(log_norm_w - jnp.maximum(common, 0.0), axis=0)
    log_cdf = jnp.where(neg_all, mc, jnp.log(jnp.maximum(F, tiny)))
    log_sf = jnp.where(pos_all, ms, jnp.log(jnp.maximum(SF, tiny)))
    P = jnp.sum((norm_w * inv_widths) * (sig * r), axis=0)
    far = jnp.min(jnp.abs(common), axis=0) > 55.0
    mp = jnp.max(log_norm_w + log_inv_widths - jnp.abs(common), axis=0)
    log_pdf = jnp.where(far, mp, jnp.log(jnp.maximum(P, tiny)))
    outs = (log_cdf, log_sf, log_pdf)
    res = (common, norm_w, inv_widths, sig, r, F, SF, P,
           neg_all, pos_all, far)
    return outs, res




@jax.custom_jvp
def _linear_logs_pdf(common, norm_w, log_norm_w, inv_widths,
                     log_inv_widths):
    """(log_cdf, log_sf, log_pdf) with a HAND-WRITTEN jvp rule.

    Trace-time AD of the linear accumulation emits clip/where/max-select
    chains and per-output division trees that measurably slow the fused
    in-kernel NLL backward (e4/gggg Adam step 5.97 -> 7.05 ms at 262k,
    2026-08-20).  The analytic tangent rule below is transcendental-free
    and reuses the forward residuals:

      dF/du_k  =  w_k sig_k r_k          (logistic sigma' = sigma(1-sigma))
      dSF/du_k = -w_k sig_k r_k
      dP/du_k  =  w_k iw_k sig_k r_k (1 - 2 sig_k)

    Written as a custom_jvp (not custom_vjp) on purpose: the Pallas
    backward kernel bodies run trace-time forward-mode AD (jax.jvp)
    through this function for the Newton derivative, and JAX cannot apply
    jvp to a custom_vjp function; reverse mode derives automatically by
    transposing this (tangent-linear) rule, yielding the same analytic
    backward.

    Fallback lanes (every component >55 width-units out) propagate the
    dominant max-term's gradient (a tie-normalized one-hot over K): the
    log-space outputs there are ~log_norm_w - |common|, whose derivative
    w.r.t. the dominant coordinate is O(1/width) — NOT negligible — so an
    outlier sample can still pull the mixture toward itself.
    """
    outs, _ = _linear_logs_pdf_primal(common, norm_w, log_norm_w,
                                      inv_widths, log_inv_widths)
    return outs


@_linear_logs_pdf.defjvp
def _linear_logs_pdf_jvp(primals, tangents):
    common, norm_w, log_norm_w, inv_widths, log_inv_widths = primals
    t_common, t_norm_w, t_log_norm_w, t_inv_widths, t_log_inv_widths = \
        tangents
    outs, res = _linear_logs_pdf_primal(common, norm_w, log_norm_w,
                                        inv_widths, log_inv_widths)
    (common, norm_w, inv_widths, sig, r, F, SF, P,
     neg_all, pos_all, far) = res
    tiny = jnp.finfo(common.dtype).tiny
    sr = sig * r
    # the +-60 clip gates the interior u-tangent
    tu = jnp.where(jnp.abs(common) < 60.0, t_common, 0.0)
    wsr = norm_w * sr
    tF = jnp.sum(t_norm_w * sig + wsr * tu, axis=0)
    tSF = jnp.sum(t_norm_w * r - wsr * tu, axis=0)
    tP = jnp.sum((t_norm_w * inv_widths + norm_w * t_inv_widths) * sr
                 + (wsr * inv_widths) * ((1.0 - 2.0 * sig) * tu), axis=0)
    # Fallback lanes: tangent of the dominant max-term, selected by ONE
    # shared one-hot of the log_pdf max array (lnw + liw - |c|); using it
    # for all three outputs is a deliberate approximation - fallback lanes
    # are themselves max-term approximations of quantile < ~1e-24, and the
    # point of the rule is that an outlier's O(1/width) log-space gradient
    # survives instead of being zeroed.  The three tangents share structure
    # (t_mp = t_mc-part + t_ms-part), so four masked reductions cover all
    # of them; the per-output maxes/tie-normalizations of the naive form
    # measured +4.5 ns/sample (+14%) on the fused e4/gggg train kernel.
    # Uses the UNCLIPPED coordinate tangent (max-term forms use raw common).
    # Only the COORDINATE tangent propagates in fallback lanes: the
    # max-term's d/d(common) is the O(1/width)-in-x gradient the rule must
    # keep (an outlier's pull on the mixture); the log_norm_w /
    # log_inv_widths fallback tangents are deliberately dropped - their
    # transposed cotangent chains (softmax + log vjps over (K, D, B))
    # measured +4.5 ns/sample (+14%) on the fused e4/gggg train kernel for
    # gradients that are secondary there (weight nudges from <1e-24-
    # quantile lanes), and the interior branch carries full weight
    # gradients for every non-fallback lane.
    mvals = log_norm_w + log_inv_widths - jnp.abs(common)
    oh = (mvals >= jnp.max(mvals, axis=0, keepdims=True)).astype(
        common.dtype)
    a = jnp.sum(oh * jnp.where(common < 0.0, t_common, 0.0), axis=0)
    b = jnp.sum(oh * jnp.where(common > 0.0, t_common, 0.0), axis=0)
    t_log_cdf = jnp.where(neg_all, a, tF / jnp.maximum(F, tiny))
    t_log_sf = jnp.where(pos_all, -b, tSF / jnp.maximum(SF, tiny))
    t_log_pdf = jnp.where(far, a - b, tP / jnp.maximum(P, tiny))
    return outs, (t_log_cdf, t_log_sf, t_log_pdf)


def mixture_linear_logs(common, norm_w, log_norm_w, inv_widths,
                        log_inv_widths, need_pdf):
    """(log_cdf, log_sf, log_pdf|None) of a NORMALIZED logistic mixture via
    linear odds-space accumulation — the f32/TPU hot formulation.

    One exp per component (sigma(u) = e/(1+e), its survival = 1/(1+e)) and
    one log per output replace the K-softplus + triple-logsumexp log-space
    chain: on the v5e VPU softplus measures 0.34 Tops/s vs exp 1.32
    (TRANSCENDENTAL.json), making this ~2x cheaper per mixture evaluation.
    Used by BOTH the Pallas kernels and the f32 XLA branch of
    :func:`logistic_mixture_log_quantities` so the two stay in lockstep and
    the sample->log_prob roundtrip keeps its rounding cancellation (TPU
    transcendentals carry smooth ~1e-4-class approximation bias — exp
    4.9e-6, log 9.3e-5 relative, measured 2026-08-20 — which cancels only
    between identical expressions).

    The clip at +-60 is f32-EXACT for saturated components whenever at
    least one component stays inside +-40 (sigma(60) rounds to 1.0;
    sigma(-60)'s represented 8.7e-27 vs true 8.8e-27 is absolutely
    negligible against any component within 40).  Lanes where EVERY
    component sits beyond 55 width-units (true quantile < ~1e-24) fall
    back to the max-term form, which is f32-exact there for a single
    dominant component (log sigma(u) == u exactly below u=-20) and within
    log K when several tie — the f64 log-space branch remains the exact
    path for such extreme evaluations.  In the unguarded boundary band
    where the DOMINANT component sits in (-60, -55] with the others
    clipped at -60, the clipped components' spurious e^-60 terms carry up
    to ~(K-1)*e^(u_dom+60) relative error (~K*e^-5, i.e. ~0.1 in log_cdf
    at K=20, u_dom=-55) — true quantile < ~1e-24 there, acceptable in the
    deep tail.  The solve path never reaches either regime: the
    component-quantile bracket keeps at least one component within
    |logit q| + margin <= ~25 width-units.

    common: (K, D, B) standardized coordinates; norm_w/log_norm_w:
    (K, D, 1|B) normalized mixture weights (linear and log);
    inv_widths/log_inv_widths: (K, D, 1|B) (log_inv_widths may be None when
    need_pdf=False).  Outputs reduce axis 0.
    """
    if need_pdf:
        # hand-written backward (see _linear_logs_pdf): the trace-time AD
        # of this chain measurably slows the fused in-kernel NLL kernels
        return _linear_logs_pdf(common, norm_w, log_norm_w, inv_widths,
                                log_inv_widths)
    tiny = jnp.finfo(common.dtype).tiny
    u = jnp.clip(common, -60.0, 60.0)
    e = jnp.exp(u)
    r = 1.0 / (1.0 + e)
    sig = e * r
    F = jnp.sum(norm_w * sig, axis=0)
    SF = jnp.sum(norm_w * r, axis=0)
    # fallback selection on the coordinate range, NOT the sum value: a
    # lane whose components are ALL clipped would otherwise keep a
    # spuriously-large linear sum (e^-60 per clipped component)
    neg_all = jnp.max(common, axis=0) < -55.0
    pos_all = jnp.min(common, axis=0) > 55.0
    mc = jnp.max(log_norm_w + jnp.minimum(common, 0.0), axis=0)
    ms = jnp.max(log_norm_w - jnp.maximum(common, 0.0), axis=0)
    log_cdf = jnp.where(neg_all, mc, jnp.log(jnp.maximum(F, tiny)))
    log_sf = jnp.where(pos_all, ms, jnp.log(jnp.maximum(SF, tiny)))
    return log_cdf, log_sf, None


def _lse0(v):
    """Max-shifted logsumexp over axis 0 written in primitive jnp ops so it
    also lowers inside Pallas kernel bodies (Mosaic has no scipy logsumexp;
    sharing ONE expression keeps kernel and XLA f32 paths in lockstep)."""
    m = jnp.max(v, axis=0)
    return m + jnp.log(jnp.sum(jnp.exp(v - m[None]), axis=0))


def skew_mixture_logs(common, log_inv_widths, log_norm_w, log_skew, signs,
                      need_pdf):
    """(log_cdf, log_sf, log_pdf|None) of a NORMALIZED skewed-logistic
    mixture: per-kernel exponents a_k = exp(log_skew) and +-1 `signs`
    (gaussianization_flow.py:415-454 math).  The f32/TPU formulation shared
    by the Pallas kernels and the f32 XLA branch of
    :func:`logistic_mixture_log_quantities` — one expression set in both
    directions keeps the sample->log_prob roundtrip at its rounding-
    cancellation level (see mixture_linear_logs).

    common: (K, D, B); log_inv_widths/log_norm_w/log_skew: (K, D, 1|B);
    signs: (K, 1, 1) with entries +-1.  Outputs reduce axis 0.
    """
    a = jnp.exp(log_skew)
    sc = signs * common
    pos = signs > 0.0
    sp_nc = jax.nn.softplus(-common)
    sp_c = jax.nn.softplus(common)
    log_pdf = None
    if need_pdf:
        log_pdfs = (-sc + log_inv_widths + log_skew
                    - (a + 1.0) * jax.nn.softplus(-sc) + log_norm_w)
        log_pdf = _lse0(log_pdfs)
    log_cdfs = jnp.where(
        pos, -a * sp_nc,
        log_one_plus_exp_x_to_a_minus_1(common, a) - a * sp_c) + log_norm_w
    log_sfs = jnp.where(
        pos, log_one_plus_exp_x_to_a_minus_1(-common, a) - a * sp_nc,
        -a * sp_c) + log_norm_w
    return _lse0(log_cdfs), _lse0(log_sfs), log_pdf


def logistic_mixture_log_quantities(x, means, log_widths, log_norms,
                                    log_skew_exponents, skew_signs,
                                    add_skewness=False, calculate_pdf=True):
    """Compute (log_cdf, log_sf, log_pdf) of the logistic mixture at x.

    Mirrors gaussianization_flow.py:389-454.  Params are (K, D, Bp) B-minor;
    `skew_signs` is (K, 1, 1) with entries +-1 (ignored when
    add_skewness=False).  x: (B, D); outputs (B, D).
    """
    xT = x.T[None, :, :]                              # (1, D, B)
    mT, lwT, lnT = means, log_widths, log_norms       # (K, D, Bp)

    common = (xT - mT) * jnp.exp(-lwT)                # (K, D, B)

    individual_normalizers = lnT - jax.scipy.special.logsumexp(
        lnT, axis=0, keepdims=True)

    log_pdf = None
    if add_skewness:
        seT = log_skew_exponents
        ssT = skew_signs
        if x.dtype == jnp.float32:
            # f32 hot path: kernel-shared formulation (see skew_mixture_logs)
            log_cdf, log_sf, log_pdf = skew_mixture_logs(
                common, -lwT, individual_normalizers, seT, ssT,
                calculate_pdf)
            return log_cdf.T, log_sf.T, \
                (log_pdf.T if log_pdf is not None else None)
        skew_exponents = jnp.exp(seT)
        if calculate_pdf:
            log_pdfs = (-ssT * common - lwT + seT
                        - (skew_exponents + 1.0) * jax.nn.softplus(-ssT * common)
                        + individual_normalizers)
            log_pdf = jax.scipy.special.logsumexp(log_pdfs, axis=0).T
        pos = ssT > 0
        log_cdfs_pos = -skew_exponents * jax.nn.softplus(-common)
        log_cdfs_neg = log_one_plus_exp_x_to_a_minus_1(common, skew_exponents) \
            - skew_exponents * jax.nn.softplus(common)
        log_cdfs = jnp.where(pos, log_cdfs_pos, log_cdfs_neg) \
            + individual_normalizers
        log_sfs_pos = log_one_plus_exp_x_to_a_minus_1(-common, skew_exponents) \
            - skew_exponents * jax.nn.softplus(-common)
        log_sfs_neg = -skew_exponents * jax.nn.softplus(common)
        log_sfs = jnp.where(pos, log_sfs_pos, log_sfs_neg) \
            + individual_normalizers
    else:
        if x.dtype == jnp.float32:
            # f32 hot path: linear odds-space accumulation, kept in exact
            # expression-level lockstep with the Pallas kernels (see
            # mixture_linear_logs) so kernel and XLA agree to shared-
            # rounding level on TPU.  f64 keeps the log-space chain below:
            # it is the exact path for arbitrarily extreme evaluations.
            log_cdf, log_sf, log_pdf = mixture_linear_logs(
                common, jnp.exp(individual_normalizers),
                individual_normalizers, jnp.exp(-lwT), -lwT,
                calculate_pdf)
            return log_cdf.T, log_sf.T, \
                (log_pdf.T if log_pdf is not None else None)
        if calculate_pdf:
            log_pdfs = (-common - lwT - 2.0 * jax.nn.softplus(-common)
                        + individual_normalizers)
            log_pdf = jax.scipy.special.logsumexp(log_pdfs, axis=0).T
        log_cdfs = -jax.nn.softplus(-common) + individual_normalizers
        log_sfs = -common - jax.nn.softplus(-common) + individual_normalizers

    log_cdf = jax.scipy.special.logsumexp(log_cdfs, axis=0).T   # (B, D)
    log_sf = jax.scipy.special.logsumexp(log_sfs, axis=0).T
    return log_cdf, log_sf, log_pdf


# Central-region seam for the erfinv argument reconstruction: for
# ln_fac > -1 (|2c-1| <= ~0.795) use the DIFFERENCE form cdf - sf, whose f32
# error is multiplicative (the common logsumexp rounding of log_cdf/log_sf
# cancels); reconstructing from ln_fac there is wrong two ways: the additive
# logsumexp bias of log_cdf+log_sf (measured ~1.5e-4 at K=20) FLOORS
# |2c-1| at sqrt(bias) ~ 0.012, cutting a +-0.016 JUMP into the iCDF at
# c = 0.5 (an unreachable band that broke the Newton solve and roundtrips
# near the mode), and the sqrt has an infinite ln_fac-gradient at c = 0.5
# (the inf * 0 = NaN jnp.where chain-rule trap).  Beyond the seam the
# log-space sqrt form takes over (the difference form dead-zones in the
# tails where 2c-1 rounds to +-1).
LIN_SEAM_LNFAC = -1.0


def erfinv_f32_args_from_logs(log_cdf, log_sf, ln_fac_mid):
    """(x, w) = (2*cdf - 1, -log(1 - x^2)) for the erfinv polynomial,
    f32-stable everywhere (see LIN_SEAM_LNFAC).  Both branches are computed
    on sanitized inputs so reverse-mode stays finite; 1-exp instead of
    -expm1 because Mosaic has no expm1 lowering."""
    near = ln_fac_mid > LIN_SEAM_LNFAC
    sign = jnp.where(log_cdf >= log_sf, 1.0, -1.0)
    u = jnp.where(near, 1.0, 1.0 - jnp.exp(ln_fac_mid))
    x_sqrt = sign * jnp.sqrt(jnp.maximum(u, jnp.finfo(log_cdf.dtype).tiny))
    x_lin = jnp.exp(log_cdf) - jnp.exp(log_sf)
    x = jnp.where(near, x_lin, x_sqrt)
    # w from the accurate central x (immune to the ln_fac bias); from
    # ln_fac outside where x^2 rounds to 1.  The clip only guards the
    # masked-out lane values (in-branch |x| <= 0.795).
    x_c = jnp.clip(x_lin, -0.99, 0.99)
    w = jnp.where(near, -jnp.log(1.0 - x_c * x_c), -ln_fac_mid)
    return x, w


def _lnfac_f32_stable(log_cdf, log_sf, ln_fac_raw, tiny):
    """ln_fac = log(4 c (1-c)) with the central region (ln_fac > -1)
    recomputed from the difference form 2c-1 = cdf - sf, immune to the
    additive logsumexp bias (see LIN_SEAM_LNFAC)."""
    x_lin = jnp.exp(log_cdf) - jnp.exp(log_sf)
    x_c = jnp.clip(x_lin, -0.99, 0.99)
    lf_lin = jnp.log(jnp.maximum(1.0 - x_c * x_c, tiny))
    near = ln_fac_raw > LIN_SEAM_LNFAC
    return jnp.where(near, jnp.minimum(lf_lin, -tiny),
                     jnp.minimum(ln_fac_raw, -tiny))


def erfinv_f32_poly(x, w):
    """Single-precision erfinv(x) with w = -log(1 - x^2) precomputed.
    Giles (2012) polynomial, ~1e-7 accurate; scalar coefficients only so it
    also lowers inside Pallas kernels.
    """
    small = w < 5.0
    ws = jnp.where(small, w - 2.5, jnp.sqrt(jnp.maximum(w, 5.0)) - 3.0)
    p_small = 2.81022636e-08
    for c in (3.43273939e-07, -3.5233877e-06, -4.39150654e-06, 0.00021858087,
              -0.00125372503, -0.00417768164, 0.246640727, 1.50140941):
        p_small = p_small * ws + c
    p_big = -0.000200214257
    for c in (0.000100950558, 0.00134934322, -0.00367342844, 0.00573950773,
              -0.0076224613, 0.00943887047, 1.00167406, 2.83297682):
        p_big = p_big * ws + c
    return jnp.where(small, p_small, p_big) * x


def _pade_total_factor(ln_fac, tiny):
    """|sqrt(2) erfinv(2c-1)| via the Winitzki pade approximation from
    ln_fac = log(4 c (1-c)) <= 0 (gaussianization_flow.py:507-522).

    ln_fac must already be sanitized (bounded away from 0) on entries where
    the result is not used - otherwise sqrt(0) poisons gradients through
    jnp.where.
    """
    c = 2.0 / (math.pi * PADE_A)
    combined = c + ln_fac / 2.0
    pos_entry = 2.0 * (jnp.sqrt(jnp.maximum(combined**2 - ln_fac / PADE_A, tiny))
                       - combined)
    return jnp.sqrt(jnp.maximum(pos_entry, tiny))


def icdf_pass(log_cdf, log_sf, inverse_function_type):
    """Map mixture-CDF space to an unbounded coordinate.

    gaussianization_flow.py:480-559.  All masked branches are computed on
    *sanitized* inputs so that reverse-mode gradients stay finite (the
    "double-where" pattern) - required for f32 TPU training.
    """
    if inverse_function_type == "isigmoid":
        return log_cdf - log_sf

    tiny = jnp.finfo(log_cdf.dtype).tiny
    cdf = jnp.exp(log_cdf)
    ln_fac_raw = log_cdf + log_sf + LOG_4

    if "partly" in inverse_function_type:
        if log_cdf.dtype == jnp.float32:
            # log-space seam classification + erfinv from ln_fac: matches the
            # Pallas kernel formulation exactly and avoids 2*cdf-1 and
            # exp(log_cdf) rounding near the tails
            log_seam = math.log(4.0 * PADE_BOUND * (1.0 - PADE_BOUND))
            good = ln_fac_raw > log_seam
            ln_fac_mid = jnp.where(good, ln_fac_raw, -1.0)
            xx, ww = erfinv_f32_args_from_logs(log_cdf, log_sf, ln_fac_mid)
            val = SQRT2 * erfinv_f32_poly(xx, ww)
            right = (~good) & (log_cdf >= log_sf)
        else:
            # the ln_fac conjunct guards MIXED precision (f32 params under
            # f64 evaluation): f32-normalized weights cap the linear cdf at
            # 1 - ~3e-7 < 1 - PADE_BOUND, so the cdf test alone never exits
            # the bulk branch and ndtri saturates, making far-tail solve
            # targets unreachable; ln_fac = log_cdf + log_sf is log-space
            # and crosses the seam regardless.  For pure-f64 mixtures the
            # two tests agree (4c(1-c) > 4 PB (1-PB) <=> PB < c < 1-PB).
            log_seam = math.log(4.0 * PADE_BOUND * (1.0 - PADE_BOUND))
            good = (cdf > PADE_BOUND) & (cdf < 1.0 - PADE_BOUND) \
                & (ln_fac_raw > log_seam)
            cdf_good = jnp.where(good, cdf, 0.5)
            val = jax.scipy.special.ndtri(cdf_good)
            right = log_cdf >= log_sf

        # tails: sanitize ln_fac on non-tail entries before sqrt/log
        ln_fac = jnp.where(good, -1.0, ln_fac_raw)
        if inverse_function_type == "inormal_partly_crude":
            total_factor = jnp.sqrt(jnp.maximum(-2.0 * (ln_fac - LOG_4), tiny)) - 0.4717
        else:  # inormal_partly_precise
            total_factor = _pade_total_factor(ln_fac, tiny)

        return jnp.where(good, val,
                         jnp.where(right, total_factor, -total_factor))

    # inormal_full_pade: bound ln_fac away from 0 (value error negligible,
    # keeps the sqrt gradient finite at cdf ~ 0.5).  f32: recompute the
    # central ln_fac from the difference form - the additive logsumexp bias
    # otherwise floors |val| and cuts the same jump into the iCDF at c=0.5
    # as the partly_precise case (see LIN_SEAM_LNFAC) - and take the series
    # form inside |2c-1| <= FULL_PADE_F32_CENTER: there log(1 - x^2) rounds
    # toward 0 in f32 and the pade expressions turn into catastrophically
    # input-sensitive garbage (F2 - F underflows against F^2's ulp), while
    # sqrt(2)*erfinv(x) = sqrt(pi/2)*x to O(x^3) ~ 3e-7 absolute.
    if log_cdf.dtype == jnp.float32:
        x_lin = jnp.exp(log_cdf) - jnp.exp(log_sf)
        near = jnp.abs(x_lin) <= FULL_PADE_F32_CENTER
        ln_fac = jnp.where(near, -1.0,
                           _lnfac_f32_stable(log_cdf, log_sf, ln_fac_raw,
                                             tiny))
        total_factor = _pade_total_factor(ln_fac, tiny)
        val = jnp.where(log_cdf >= log_sf, total_factor, -total_factor)
        series = SQRT_HALF_PI * x_lin * (1.0 + ERFINV_CUBIC * x_lin * x_lin)
        return jnp.where(near, series, val)
    ln_fac = jnp.minimum(ln_fac_raw, -tiny)
    sign_right = cdf > 0.5
    total_factor = _pade_total_factor(ln_fac, tiny)
    return jnp.where(sign_right, total_factor, -total_factor)


def icdf_log_derivative(log_cdf, log_sf, log_pdf, inverse_function_type):
    """log |d icdf_pass / dx| including the mixture pdf factor.

    gaussianization_flow.py:568-671, with sanitized masked branches.
    """
    if inverse_function_type == "isigmoid":
        # d/dx (log c - log (1-c)) = pdf*(1/c + 1/(1-c))
        return jnp.logaddexp(-log_sf, -log_cdf) + log_pdf

    tiny = jnp.finfo(log_cdf.dtype).tiny
    cdf = jnp.exp(log_cdf)
    ln_fac_raw = log_cdf + log_sf + LOG_4
    c = 2.0 / (math.pi * PADE_A)

    def pade_log_total(ln_fac):
        """log |d/dc sqrt(2) erfinv(2c-1)|_pade - 'log_total' of the
        reference (gaussianization_flow.py:595-613), on sanitized ln_fac."""
        F = ln_fac / 2.0 + c
        F2 = jnp.sqrt(jnp.maximum(F**2 - ln_fac / PADE_A, tiny))
        log_numerator = jnp.log(jnp.maximum(-(F - 1.0 / PADE_A - F2), tiny))
        log_denominator = (0.5 * math.log(8.0)
                           + 0.5 * jnp.log(jnp.maximum(F2 - F, tiny))
                           + jnp.log(jnp.maximum(F2, tiny)))
        return log_numerator - log_denominator

    if "partly" in inverse_function_type:
        if log_cdf.dtype == jnp.float32:
            log_seam = math.log(4.0 * PADE_BOUND * (1.0 - PADE_BOUND))
            good = ln_fac_raw > log_seam
            ln_fac_mid = jnp.where(good, ln_fac_raw, -1.0)
            xx, ww = erfinv_f32_args_from_logs(log_cdf, log_sf, ln_fac_mid)
            ei = erfinv_f32_poly(xx, ww)
            middle = LOG_SQRT_2PI + ei**2 + log_pdf
        else:
            # same mixed-precision guard as the value pass (see icdf_pass)
            log_seam = math.log(4.0 * PADE_BOUND * (1.0 - PADE_BOUND))
            good = (cdf > PADE_BOUND) & (cdf < 1.0 - PADE_BOUND) \
                & (ln_fac_raw > log_seam)
            cdf_good = jnp.where(good, cdf, 0.5)
            middle = (LOG_SQRT_2PI
                      + jax.scipy.special.erfinv(2.0 * cdf_good - 1.0)**2
                      + log_pdf)

        ln_fac = jnp.where(good, -1.0, ln_fac_raw)
        if inverse_function_type == "inormal_partly_crude":
            total_factor = -0.5 * jnp.log(jnp.maximum(-(ln_fac - LOG_4) * 2.0,
                                                      tiny)) - (ln_fac - LOG_4)
        else:  # inormal_partly_precise
            extra = jnp.log(jnp.maximum(jnp.abs(1.0 - 2.0 * cdf), tiny))
            total_factor = pade_log_total(ln_fac) - (ln_fac - LOG_4) + extra

        tail = total_factor + log_pdf
        return jnp.where(good, middle, tail)

    # inormal_full_pade (f32: difference-form central ln_fac and |2c-1| -
    # same bias-immunity as the value pass, keeping the Newton derivative
    # consistent with the solve target; the near-center band is widened to
    # FULL_PADE_F32_CENTER where the pade expressions are f32-unstable, with
    # the erfinv-series correction term keeping the band edge continuous)
    if log_cdf.dtype == jnp.float32:
        x_lin = jnp.exp(log_cdf) - jnp.exp(log_sf)
        abs_x = jnp.abs(x_lin)
        near_center = abs_x <= FULL_PADE_F32_CENTER
        ln_fac = jnp.where(near_center, -1.0,
                           _lnfac_f32_stable(log_cdf, log_sf, ln_fac_raw,
                                             tiny))
        ei_lin = ERFINV_SLOPE * x_lin * (1.0 + ERFINV_CUBIC * x_lin * x_lin)
        center = LOG_CENTER_DERIV + ei_lin * ei_lin + log_pdf
    else:
        abs_x = jnp.abs(1.0 - 2.0 * cdf)
        near_center = (cdf >= 0.49999) & (cdf <= 0.50001)
        ln_fac = jnp.where(near_center, -1.0, jnp.minimum(ln_fac_raw, -tiny))
        center = LOG_CENTER_DERIV + log_pdf
    extra = jnp.log(jnp.maximum(abs_x, tiny))
    full = pade_log_total(ln_fac) - (ln_fac - LOG_4) + log_pdf + extra
    return jnp.where(near_center, center, full)


def gaussianize_forward(x, means, log_widths, log_norms, log_skew_exponents,
                        skew_signs, add_skewness, inverse_function_type):
    """x -> (icdf_pass(x), log|d/dx|): the analytic (density) direction."""
    log_cdf, log_sf, log_pdf = logistic_mixture_log_quantities(
        x, means, log_widths, log_norms, log_skew_exponents, skew_signs,
        add_skewness=add_skewness, calculate_pdf=True)
    val = icdf_pass(log_cdf, log_sf, inverse_function_type)
    log_deriv = icdf_log_derivative(log_cdf, log_sf, log_pdf,
                                    inverse_function_type)
    return val, log_deriv


def gaussianize_value(x, means, log_widths, log_norms, log_skew_exponents,
                      skew_signs, add_skewness, inverse_function_type):
    """Value-only variant (used inside the Newton iteration)."""
    log_cdf, log_sf, _ = logistic_mixture_log_quantities(
        x, means, log_widths, log_norms, log_skew_exponents, skew_signs,
        add_skewness=add_skewness, calculate_pdf=False)
    return icdf_pass(log_cdf, log_sf, inverse_function_type)
