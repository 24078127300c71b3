"""Rational-quadratic spline kernels (4 variants).

TPU-native, fully vectorized reimplementation of the spline family in the
reference (jammy_flows/layers/spline_fns.py:45,188,361,561):

  * ``rq_spline``                 - standard monotone RQ spline on a box
                                    (arXiv:1906.04032)
  * ``rq_spline_linear_ext``      - RQ spline with linear tails on all of R
                                    (used by the `g` flow's rq_splines mode)
  * ``rq_spline_smooth``          - C^2 variant: only boundary derivatives
                                    free, interior derivatives solved for
                                    second-derivative continuity
  * ``rq_spline_smooth_circular`` - C^2 circular variant on [0, 2pi]

Conventions: ``inputs`` has shape (B, D); unnormalized widths/heights/
derivatives have shape (Bp, D, K) with Bp in {1, B} (broadcast batch).
Returns (outputs (B, D), log_abs_det (B, D)).

All bin-search and gather operations are one-hot contractions / masked sums
so XLA lowers them to dense vector ops (no dynamic shapes, no scatter).
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp

TWO_PI = 2.0 * math.pi

DEFAULT_MIN_BIN_WIDTH = 1e-3
DEFAULT_MIN_BIN_HEIGHT = 1e-3
DEFAULT_MIN_DERIVATIVE = 1e-3


def _restrict_ratio(unnormalized, num_bins, ratio):
    """Squash raw logits into a bounded range so max/min bin ratio <= ratio.

    Mirrors spline_fns.py:80-86.
    """
    if ratio <= 0.0:
        return unnormalized
    ln_max_allowed = (math.log(ratio) - math.log(num_bins - 1)) / 2.0
    assert ln_max_allowed > 0, (
        "Allowed max/min ratio for widths/heights is too small: %.3e" % ratio)
    return 2.0 * jax.nn.sigmoid(unnormalized) * ln_max_allowed - ln_max_allowed


def _bin_positions(unnormalized, num_bins, rel_min, low, high):
    """softmax -> floored widths -> cumulative positions in [low, high].

    Returns (widths, cum) where cum has K+1 edges; low/high may be scalars or
    broadcastable arrays.
    """
    w = jax.nn.softmax(unnormalized, axis=-1)
    w = rel_min + (1.0 - rel_min * num_bins) * w
    cum = jnp.cumsum(w, axis=-1)
    cum = jnp.concatenate([jnp.zeros_like(cum[..., :1]), cum], axis=-1)
    cum = (high - low) * cum + low
    # pin the exact endpoints (cumsum rounding)
    cum = jnp.concatenate(
        [jnp.broadcast_to(jnp.asarray(low, cum.dtype), cum[..., :1].shape),
         cum[..., 1:-1],
         jnp.broadcast_to(jnp.asarray(high, cum.dtype), cum[..., :1].shape)],
        axis=-1)
    widths = cum[..., 1:] - cum[..., :-1]
    return widths, cum


def _searchsorted(edges, x, eps=1e-6):
    """Locate bin index of x given edges (..., K+1): masked-sum search.

    Equivalent to spline_fns.py:13-19 (with its epsilon on the top edge).
    """
    top = edges[..., -1:] + eps
    shifted = jnp.concatenate([edges[..., :-1], top], axis=-1)
    idx = jnp.sum(x[..., None] >= shifted, axis=-1) - 1
    return jnp.clip(idx, 0, edges.shape[-1] - 2)


def _gather(values, idx):
    """values (..., K) gathered at idx (...,) -> (...,).

    One-hot contraction: maps to a dense VPU select+reduce on TPU instead of
    a gather (small K makes this the fast path).
    """
    k = values.shape[-1]
    onehot = jax.nn.one_hot(idx, k, dtype=values.dtype)
    return jnp.sum(values * onehot, axis=-1)


def _rq_core(inputs, idx, cumwidths, widths, cumheights, heights, derivatives,
             inverse):
    """Shared rational-quadratic bin evaluation given located bins."""
    in_cumw = _gather(cumwidths[..., :-1], idx)
    in_w = _gather(widths, idx)
    in_cumh = _gather(cumheights[..., :-1], idx)
    in_h = _gather(heights, idx)
    delta = heights / widths
    in_delta = _gather(delta, idx)
    in_d = _gather(derivatives[..., :-1], idx)
    in_d1 = _gather(derivatives[..., 1:], idx)

    d_sum_term = in_d + in_d1 - 2.0 * in_delta

    if inverse:
        rel = inputs - in_cumh
        a = rel * d_sum_term + in_h * (in_delta - in_d)
        b = in_h * in_d - rel * d_sum_term
        c = -in_delta * rel
        discriminant = b**2 - 4.0 * a * c
        discriminant = jnp.maximum(discriminant, 0.0)
        root = (2.0 * c) / (-b - jnp.sqrt(discriminant))
        outputs = root * in_w + in_cumw
        theta = root
    else:
        theta = (inputs - in_cumw) / in_w
        t1mt = theta * (1.0 - theta)
        numerator = in_h * (in_delta * theta**2 + in_d * t1mt)
        denominator = in_delta + d_sum_term * t1mt
        outputs = in_cumh + numerator / denominator

    t1mt = theta * (1.0 - theta)
    denominator = in_delta + d_sum_term * t1mt
    deriv_numerator = in_delta**2 * (
        in_d1 * theta**2 + 2.0 * in_delta * t1mt + in_d * (1.0 - theta)**2)
    logabsdet = jnp.log(deriv_numerator) - 2.0 * jnp.log(denominator)
    if inverse:
        logabsdet = -logabsdet
    return outputs, logabsdet


def rq_spline(inputs,
              unnormalized_widths,
              unnormalized_heights,
              unnormalized_derivatives,
              inverse=False,
              left=0.0, right=1.0, bottom=0.0, top=1.0,
              rel_min_bin_width=DEFAULT_MIN_BIN_WIDTH,
              rel_min_bin_height=DEFAULT_MIN_BIN_HEIGHT,
              min_derivative=DEFAULT_MIN_DERIVATIVE,
              restrict_max_min_width_height_ratio=-1.0):
    """Standard RQ spline on [left,right] x [bottom,top].

    Reference: spline_fns.py:45-186.  derivatives has K+1 entries.
    """
    num_bins = unnormalized_widths.shape[-1]
    uw = _restrict_ratio(unnormalized_widths, num_bins,
                         restrict_max_min_width_height_ratio)
    uh = _restrict_ratio(unnormalized_heights, num_bins,
                         restrict_max_min_width_height_ratio)

    widths, cumwidths = _bin_positions(uw, num_bins, rel_min_bin_width, left, right)
    heights, cumheights = _bin_positions(uh, num_bins, rel_min_bin_height,
                                         bottom, top)
    derivatives = min_derivative + jax.nn.softplus(unnormalized_derivatives)

    edges = cumheights if inverse else cumwidths
    idx = _searchsorted(edges, inputs)
    return _rq_core(inputs, idx, cumwidths, widths, cumheights, heights,
                    derivatives, inverse)


def rq_spline_linear_ext(inputs,
                         unnormalized_widths,
                         unnormalized_heights,
                         unnormalized_derivatives,
                         left, right, bottom, top,
                         inverse=False,
                         rel_min_bin_width=DEFAULT_MIN_BIN_WIDTH,
                         rel_min_bin_height=DEFAULT_MIN_BIN_HEIGHT,
                         min_derivative=DEFAULT_MIN_DERIVATIVE):
    """RQ spline with linear extensions outside the box -> bijection on R.

    Reference: spline_fns.py:188-358.  left/right/bottom/top are (Bp, D)
    arrays here (per-dimension trainable boundaries).
    """
    num_bins = unnormalized_widths.shape[-1]

    widths, cumwidths = _bin_positions(
        unnormalized_widths, num_bins, rel_min_bin_width,
        left[..., None], right[..., None])
    heights, cumheights = _bin_positions(
        unnormalized_heights, num_bins, rel_min_bin_height,
        bottom[..., None], top[..., None])
    derivatives = min_derivative + jax.nn.softplus(unnormalized_derivatives)

    edges = cumheights if inverse else cumwidths
    idx = _searchsorted(edges, inputs, eps=0.0)
    outputs, logabsdet = _rq_core(inputs, idx, cumwidths, widths, cumheights,
                                  heights, derivatives, inverse)

    d0 = derivatives[..., 0]
    dK = derivatives[..., -1]
    if inverse:
        lo, hi = bottom, top
        left_off = cumwidths[..., 0] - cumheights[..., 0] / d0
        right_off = cumwidths[..., -1] - cumheights[..., -1] / dK
        out_lo = inputs / d0 + left_off
        out_hi = inputs / dK + right_off
        ld_lo, ld_hi = -jnp.log(d0), -jnp.log(dK)
    else:
        lo, hi = left, right
        left_off = cumheights[..., 0] - cumwidths[..., 0] * d0
        right_off = cumheights[..., -1] - cumwidths[..., -1] * dK
        out_lo = inputs * d0 + left_off
        out_hi = inputs * dK + right_off
        ld_lo, ld_hi = jnp.log(d0), jnp.log(dK)

    below = inputs <= lo
    above = inputs >= hi
    outputs = jnp.where(below, out_lo, jnp.where(above, out_hi, outputs))
    logabsdet = jnp.where(below, ld_lo, jnp.where(above, ld_hi, logabsdet))
    return outputs, logabsdet


def _solve_c2_derivatives(widths, heights, boundary_derivatives,
                          solution_index=0):
    """Solve for interior derivatives enforcing C^2 continuity (K<=3 bins).

    Reference: spline_fns.py:429-484.  boundary_derivatives (..., 2) already
    positively transformed.
    """
    k = widths.shape[-1]
    if k == 1:
        return boundary_derivatives
    if k == 2:
        h1, h2 = heights[..., :1], heights[..., 1:]
        w1, w2 = widths[..., :1], widths[..., 1:]
        hsum = h1 + h2
        lower_p = h1 / hsum
        higher_p = h2 / hsum
        neg_p_half = 0.5 * (lower_p * (h2 / w2 - boundary_derivatives[..., 1:])
                            + higher_p * (h1 / w1 - boundary_derivatives[..., :1]))
        q = -(h1 * h2) * (lower_p / w1**2 + higher_p / w2**2)
        disc = jnp.sqrt(jnp.maximum(neg_p_half**2 - q, 0.0))
        res = neg_p_half + disc if solution_index == 0 else neg_p_half - disc
        return jnp.concatenate(
            [boundary_derivatives[..., :1], res, boundary_derivatives[..., 1:]],
            axis=-1)
    if k == 3:
        w1, w2 = widths[..., 0:1], widths[..., 1:2]
        h1, h2 = heights[..., 0:1], heights[..., 1:2]
        common = w1 * w2 * (2.0 * h1 + h2)
        p = h2 * (boundary_derivatives[..., :1] * w1 * w2 - h1 * (w1 + w2)) / common
        q = -h1 * h2 * (h1 * w2**2 + h2 * w1**2) / (common * w1 * w2)
        neg_p_half = -p / 2.0
        res = neg_p_half + jnp.sqrt(jnp.maximum(neg_p_half**2 - q, 0.0))
        return jnp.concatenate(
            [boundary_derivatives[..., :1], res, res,
             boundary_derivatives[..., 1:]], axis=-1)
    raise NotImplementedError("smooth RQ spline supports <=3 bins")


def rq_spline_smooth(inputs,
                     unnormalized_widths,
                     unnormalized_heights,
                     unnormalized_boundary_derivatives,
                     inverse=False,
                     left=0.0, right=1.0, bottom=0.0, top=1.0,
                     rel_min_bin_width=DEFAULT_MIN_BIN_WIDTH,
                     rel_min_bin_height=DEFAULT_MIN_BIN_HEIGHT,
                     min_derivative=DEFAULT_MIN_DERIVATIVE,
                     restrict_max_min_width_height_ratio=-1.0,
                     solution_index=0):
    """C^2-smooth RQ spline: only the two boundary derivatives are free.

    Reference: spline_fns.py:361-558.
    """
    num_bins = unnormalized_widths.shape[-1]
    uw = _restrict_ratio(unnormalized_widths, num_bins,
                         restrict_max_min_width_height_ratio)
    uh = _restrict_ratio(unnormalized_heights, num_bins,
                         restrict_max_min_width_height_ratio)

    widths, cumwidths = _bin_positions(uw, num_bins, rel_min_bin_width, left, right)
    heights, cumheights = _bin_positions(uh, num_bins, rel_min_bin_height,
                                         bottom, top)
    boundary_d = min_derivative + jax.nn.softplus(unnormalized_boundary_derivatives)
    derivatives = _solve_c2_derivatives(widths, heights, boundary_d,
                                        solution_index)

    edges = cumheights if inverse else cumwidths
    idx = _searchsorted(edges, inputs)
    return _rq_core(inputs, idx, cumwidths, widths, cumheights, heights,
                    derivatives, inverse)


def rq_spline_smooth_circular(inputs,
                              unnormalized_widths,
                              unnormalized_heights,
                              inverse=False,
                              rel_min_bin_width=DEFAULT_MIN_BIN_WIDTH,
                              rel_min_bin_height=DEFAULT_MIN_BIN_HEIGHT,
                              restrict_max_min_width_height_ratio=-1.0,
                              shift_to_middle=True):
    """C^2-smooth circular RQ spline on [0, 2pi] with 2 bins.

    All three knot derivatives are equal (solved in closed form), giving a
    circle diffeomorphism with matched value+derivative at the seam.
    Reference: spline_fns.py:561-760.
    """
    num_bins = unnormalized_widths.shape[-1]
    assert num_bins == 2, "circular smooth spline requires exactly 2 bins"
    uw = _restrict_ratio(unnormalized_widths, num_bins,
                         restrict_max_min_width_height_ratio)
    uh = _restrict_ratio(unnormalized_heights, num_bins,
                         restrict_max_min_width_height_ratio)

    widths, cumwidths = _bin_positions(uw, num_bins, rel_min_bin_width, 0.0,
                                       TWO_PI)
    heights, cumheights = _bin_positions(uh, num_bins, rel_min_bin_height, 0.0,
                                         TWO_PI)

    w1, w2 = widths[..., :1], widths[..., 1:]
    h1, h2 = heights[..., :1], heights[..., 1:]
    h_prod = h1 * h2
    w_prod = w1 * w2
    sqrt_fac = jnp.sqrt(
        h_prod * (8.0 * ((h2 * w1)**2 + (h1 * w2)**2)
                  + (9.0 * (w1 + w2)**2 - 16.0 * w_prod) * h_prod))
    denom = 4.0 * (h1 + h2) * w_prod
    res = (h_prod * (w1 + w2) + sqrt_fac) / denom
    derivatives = jnp.concatenate([res, res, res], axis=-1)

    corrective = 0.0
    if shift_to_middle:
        w1mx = -math.pi + w1 / 2.0
        w1mx_p_w2 = w1mx + w2
        nom = h2 * w1mx * (w1mx * h1 - res * w1 * w1mx_p_w2)
        den = h1 * w2**2 + 2.0 * (h1 - res * w1) * w1mx * w1mx_p_w2
        corrective = TWO_PI - (h1 + nom / den)

    used_inputs = inputs
    if shift_to_middle:
        if inverse:
            used_inputs = inputs - corrective[..., 0]
        else:
            used_inputs = inputs - (math.pi - widths[..., 0] / 2.0)
        used_inputs = jnp.where(used_inputs < 0.0, used_inputs + TWO_PI,
                                used_inputs)

    edges = cumheights if inverse else cumwidths
    idx = _searchsorted(edges, used_inputs)
    outputs, logabsdet = _rq_core(used_inputs, idx, cumwidths, widths,
                                  cumheights, heights, derivatives, inverse)

    if shift_to_middle:
        if inverse:
            outputs = outputs + (math.pi - widths[..., 0] / 2.0)
        else:
            outputs = outputs + corrective[..., 0]
        outputs = jnp.where(outputs > TWO_PI, outputs - TWO_PI, outputs)
        outputs = jnp.where(inputs == 0.0, 0.0, outputs)
        outputs = jnp.where(inputs == TWO_PI, TWO_PI, outputs)

    return outputs, logabsdet


# ---------------------------------------------------------------------------
# Column variants: flat (B,) arrays all the way down.
#
# TPU layout note (measured v5e, 2026-08-20): ANY rank-2 array with a tiny
# dimension - (B, 1), (B, 2), even (2, B) - is tile-padded (minormost dim
# to 128 lanes / second-minormost to 8 sublanes) and runs elementwise chains
# ~11x slower than the same math on flat (B,) arrays.  The spherical /
# interval flow stack is built entirely from 1-d coordinates, so these
# column kernels carry every per-sample quantity as a flat (B,) array and
# every spline parameter as a short Python list of (Bp,) columns
# (Bp in {1, B}).  Same math as the row kernels above (parity-tested).
# ---------------------------------------------------------------------------

def _restrict_ratio_col(col, num_bins, ratio):
    if ratio <= 0.0:
        return col
    ln_max_allowed = (math.log(ratio) - math.log(num_bins - 1)) / 2.0
    assert ln_max_allowed > 0, (
        "Allowed max/min ratio for widths/heights is too small: %.3e" % ratio)
    return 2.0 * jax.nn.sigmoid(col) * ln_max_allowed - ln_max_allowed


def _softmax_cols(cols):
    m = cols[0]
    for c in cols[1:]:
        m = jnp.maximum(m, c)
    es = [jnp.exp(c - m) for c in cols]
    s = es[0]
    for e in es[1:]:
        s = s + e
    return [e / s for e in es]


def _bin_positions_cols(cols, rel_min, low, high):
    """Column twin of _bin_positions: softmax -> floored widths -> pinned
    edges.  Returns (widths list K, edges list K+1), entries (Bp,)."""
    k = len(cols)
    w = _softmax_cols(cols)
    w = [rel_min + (1.0 - rel_min * k) * wi for wi in w]
    # raw cumulative positions, then pin the exact endpoints
    edges = [None] * (k + 1)
    cum = None
    raw = []
    for wi in w:
        cum = wi if cum is None else cum + wi
        raw.append(cum)
    zero = jnp.zeros_like(w[0])
    edges[0] = zero + low
    for i in range(1, k):
        edges[i] = (high - low) * raw[i - 1] + low
    edges[k] = zero + high
    widths = [edges[i + 1] - edges[i] for i in range(k)]
    return widths, edges


def _select_bin_cols(values, x, edges):
    """values: list K of (Bp,); pick values[i] for x in [edges[i],
    edges[i+1]) (top bin closed) - where-chain twin of _searchsorted +
    one-hot gather."""
    out = values[0] + jnp.zeros_like(x)
    for i in range(1, len(values)):
        out = jnp.where(x >= edges[i], values[i], out)
    return out


def _rq_core_cols(x, sel, inverse):
    """Column twin of _rq_core.  sel: dict of selected-bin columns."""
    in_cumw, in_w = sel["cumw"], sel["w"]
    in_cumh, in_h = sel["cumh"], sel["h"]
    in_delta, in_d, in_d1 = sel["delta"], sel["d"], sel["d1"]

    d_sum_term = in_d + in_d1 - 2.0 * in_delta

    if inverse:
        rel = x - in_cumh
        a = rel * d_sum_term + in_h * (in_delta - in_d)
        b = in_h * in_d - rel * d_sum_term
        c = -in_delta * rel
        discriminant = jnp.maximum(b**2 - 4.0 * a * c, 0.0)
        root = (2.0 * c) / (-b - jnp.sqrt(discriminant))
        outputs = root * in_w + in_cumw
        theta = root
    else:
        theta = (x - in_cumw) / in_w
        t1mt = theta * (1.0 - theta)
        numerator = in_h * (in_delta * theta**2 + in_d * t1mt)
        denominator = in_delta + d_sum_term * t1mt
        outputs = in_cumh + numerator / denominator

    t1mt = theta * (1.0 - theta)
    denominator = in_delta + d_sum_term * t1mt
    deriv_numerator = in_delta**2 * (
        in_d1 * theta**2 + 2.0 * in_delta * t1mt + in_d * (1.0 - theta)**2)
    logabsdet = jnp.log(deriv_numerator) - 2.0 * jnp.log(denominator)
    if inverse:
        logabsdet = -logabsdet
    return outputs, logabsdet


def _run_rq_cols(x, widths, wedges, heights, hedges, derivs, inverse):
    """Locate bins on columns and evaluate the RQ core.  derivs: list K+1."""
    k = len(widths)
    edges = hedges if inverse else wedges
    deltas = [heights[i] / widths[i] for i in range(k)]
    sel = {
        "cumw": _select_bin_cols(wedges[:-1], x, edges),
        "w": _select_bin_cols(widths, x, edges),
        "cumh": _select_bin_cols(hedges[:-1], x, edges),
        "h": _select_bin_cols(heights, x, edges),
        "delta": _select_bin_cols(deltas, x, edges),
        "d": _select_bin_cols(derivs[:-1], x, edges),
        "d1": _select_bin_cols(derivs[1:], x, edges),
    }
    return _rq_core_cols(x, sel, inverse)


def rq_spline_cols(x, uw_cols, uh_cols, ud_cols, inverse=False,
                   left=0.0, right=1.0, bottom=0.0, top=1.0,
                   rel_min_bin_width=DEFAULT_MIN_BIN_WIDTH,
                   rel_min_bin_height=DEFAULT_MIN_BIN_HEIGHT,
                   min_derivative=DEFAULT_MIN_DERIVATIVE,
                   restrict_max_min_width_height_ratio=-1.0):
    """Column twin of rq_spline: x (B,), params as lists of (Bp,) columns
    (ud_cols has K+1 entries)."""
    k = len(uw_cols)
    uw = [_restrict_ratio_col(c, k, restrict_max_min_width_height_ratio)
          for c in uw_cols]
    uh = [_restrict_ratio_col(c, k, restrict_max_min_width_height_ratio)
          for c in uh_cols]
    widths, wedges = _bin_positions_cols(uw, rel_min_bin_width, left, right)
    heights, hedges = _bin_positions_cols(uh, rel_min_bin_height, bottom, top)
    derivs = [min_derivative + jax.nn.softplus(c) for c in ud_cols]
    return _run_rq_cols(x, widths, wedges, heights, hedges, derivs, inverse)


def _solve_c2_derivatives_cols(widths, heights, bd, solution_index=0):
    """Column twin of _solve_c2_derivatives (K <= 3).  bd: [d_left, d_right]
    already positively transformed.  Returns list K+1."""
    k = len(widths)
    if k == 1:
        return bd
    if k == 2:
        h1, h2 = heights
        w1, w2 = widths
        hsum = h1 + h2
        lower_p = h1 / hsum
        higher_p = h2 / hsum
        neg_p_half = 0.5 * (lower_p * (h2 / w2 - bd[1])
                            + higher_p * (h1 / w1 - bd[0]))
        q = -(h1 * h2) * (lower_p / w1**2 + higher_p / w2**2)
        disc = jnp.sqrt(jnp.maximum(neg_p_half**2 - q, 0.0))
        res = neg_p_half + disc if solution_index == 0 else neg_p_half - disc
        return [bd[0], res, bd[1]]
    if k == 3:
        w1, w2 = widths[0], widths[1]
        h1, h2 = heights[0], heights[1]
        common = w1 * w2 * (2.0 * h1 + h2)
        p = h2 * (bd[0] * w1 * w2 - h1 * (w1 + w2)) / common
        q = -h1 * h2 * (h1 * w2**2 + h2 * w1**2) / (common * w1 * w2)
        neg_p_half = -p / 2.0
        res = neg_p_half + jnp.sqrt(jnp.maximum(neg_p_half**2 - q, 0.0))
        return [bd[0], res, res, bd[1]]
    raise NotImplementedError("smooth RQ spline supports <=3 bins")


def rq_spline_smooth_cols(x, uw_cols, uh_cols, ubd_cols, inverse=False,
                          left=0.0, right=1.0, bottom=0.0, top=1.0,
                          rel_min_bin_width=DEFAULT_MIN_BIN_WIDTH,
                          rel_min_bin_height=DEFAULT_MIN_BIN_HEIGHT,
                          min_derivative=DEFAULT_MIN_DERIVATIVE,
                          restrict_max_min_width_height_ratio=-1.0,
                          solution_index=0):
    """Column twin of rq_spline_smooth.  ubd_cols: [left, right] boundary
    derivative columns."""
    k = len(uw_cols)
    uw = [_restrict_ratio_col(c, k, restrict_max_min_width_height_ratio)
          for c in uw_cols]
    uh = [_restrict_ratio_col(c, k, restrict_max_min_width_height_ratio)
          for c in uh_cols]
    widths, wedges = _bin_positions_cols(uw, rel_min_bin_width, left, right)
    heights, hedges = _bin_positions_cols(uh, rel_min_bin_height, bottom, top)
    bd = [min_derivative + jax.nn.softplus(c) for c in ubd_cols]
    derivs = _solve_c2_derivatives_cols(widths, heights, bd, solution_index)
    return _run_rq_cols(x, widths, wedges, heights, hedges, derivs, inverse)


def rq_spline_smooth_circular_cols(x, uw_cols, uh_cols, inverse=False,
                                   rel_min_bin_width=DEFAULT_MIN_BIN_WIDTH,
                                   rel_min_bin_height=DEFAULT_MIN_BIN_HEIGHT,
                                   restrict_max_min_width_height_ratio=-1.0,
                                   shift_to_middle=True):
    """Column twin of rq_spline_smooth_circular (2 bins on [0, 2pi])."""
    k = len(uw_cols)
    assert k == 2, "circular smooth spline requires exactly 2 bins"
    uw = [_restrict_ratio_col(c, k, restrict_max_min_width_height_ratio)
          for c in uw_cols]
    uh = [_restrict_ratio_col(c, k, restrict_max_min_width_height_ratio)
          for c in uh_cols]
    widths, wedges = _bin_positions_cols(uw, rel_min_bin_width, 0.0, TWO_PI)
    heights, hedges = _bin_positions_cols(uh, rel_min_bin_height, 0.0, TWO_PI)

    w1, w2 = widths
    h1, h2 = heights
    h_prod = h1 * h2
    w_prod = w1 * w2
    sqrt_fac = jnp.sqrt(
        h_prod * (8.0 * ((h2 * w1)**2 + (h1 * w2)**2)
                  + (9.0 * (w1 + w2)**2 - 16.0 * w_prod) * h_prod))
    denom = 4.0 * (h1 + h2) * w_prod
    res = (h_prod * (w1 + w2) + sqrt_fac) / denom
    derivs = [res, res, res]

    corrective = 0.0
    if shift_to_middle:
        w1mx = -math.pi + w1 / 2.0
        w1mx_p_w2 = w1mx + w2
        nom = h2 * w1mx * (w1mx * h1 - res * w1 * w1mx_p_w2)
        den = h1 * w2**2 + 2.0 * (h1 - res * w1) * w1mx * w1mx_p_w2
        corrective = TWO_PI - (h1 + nom / den)

    used = x
    if shift_to_middle:
        used = x - (corrective if inverse else (math.pi - w1 / 2.0))
        used = jnp.where(used < 0.0, used + TWO_PI, used)

    outputs, logabsdet = _run_rq_cols(used, widths, wedges, heights, hedges,
                                      derivs, inverse)

    if shift_to_middle:
        outputs = outputs + ((math.pi - w1 / 2.0) if inverse else corrective)
        outputs = jnp.where(outputs > TWO_PI, outputs - TWO_PI, outputs)
        outputs = jnp.where(x == 0.0, 0.0, outputs)
        outputs = jnp.where(x == TWO_PI, TWO_PI, outputs)
    return outputs, logabsdet
