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
