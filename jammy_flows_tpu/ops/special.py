"""Numerical special functions shared by all flow kernels.

TPU-native reimplementation of the scalar helpers used throughout the
reference (jammy_flows/extra_functions.py, jammy_flows/layers/euclidean/
gaussianization_flow.py:23-47).  Everything is written in log-space-stable
form so that it works in float32 on TPU as well as float64 on CPU.
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp

SQRT2 = math.sqrt(2.0)
LOG_SQRT_2PI = 0.5 * math.log(2.0 * math.pi)
TWO_PI = 2.0 * math.pi


def std_normal_log_prob(x):
    """log N(x; 0, 1), summed over the last axis.

    Mirrors the base-distribution evaluation at reference
    main/default.py:1110-1115.
    """
    return (-0.5 * x**2 - LOG_SQRT_2PI).sum(axis=-1)


@functools.lru_cache(maxsize=None)
def log_bounded_exp_fn(min_val: float, max_val: float, center: bool = False):
    """Return f(x) ~ log of a smooth function bounded in [min_val, max_val].

    Behaves like exp(x) for small x but saturates smoothly at max_val and
    min_val.  Log-space-stable construction mirroring
    gaussianization_flow.py:23-47 (generate_log_function_bounded_in_logspace).
    """
    assert min_val > 0
    ln_max = math.log(max_val)
    ln_min = math.log(min_val)
    center_val = ln_max if center else 0.0

    def f(x):
        # first_term = ln_max - log(1 + exp(-x + center_val))
        first_term = ln_max - jax.nn.softplus(-x + center_val)
        return jnp.logaddexp(first_term, ln_min)

    return f


@functools.lru_cache(maxsize=None)
def width_regulator_fn(softplus_for_width: int,
                       width_smooth_saturation: int,
                       lower_bound: float,
                       upper_bound: float,
                       clamp_widths: int = 0):
    """Build the log-width -> log-width' regulator used by `g`/`t` flows.

    Reproduces the option surface of gaussianization_flow.py:261-318 /
    multivariate_normal.py:114-156: softplus / exponential / smooth-saturating
    transformations of an unconstrained log-width parameter.
    """
    width_min = lower_bound
    width_max = upper_bound if upper_bound > 0 else None
    log_min_clamp = math.log(0.01 * width_min)
    log_max_clamp = math.log(width_max) * 3.0 if width_max is not None else None

    if softplus_for_width:
        if clamp_widths:
            upper_c = math.log(width_max) if width_max is not None else None

            def reg(x):
                xx = jnp.clip(x, log_min_clamp, upper_c)
                return jnp.log(jax.nn.softplus(xx) + width_min)
        else:
            def reg(x):
                return jnp.log(jax.nn.softplus(x) + width_min)
        return reg

    if width_smooth_saturation == 0:
        if clamp_widths:
            upper_c = math.log(width_max) if width_max is not None else None

            def reg(x):
                xx = jnp.clip(x, log_min_clamp, upper_c)
                return jnp.logaddexp(xx, math.log(width_min))
        else:
            def reg(x):
                return jnp.logaddexp(x, math.log(width_min))
        return reg

    # smooth saturation between [width_min, width_max]
    assert width_max is not None, "smooth saturation requires an upper bound"
    base = log_bounded_exp_fn(width_min, width_max, center=True)
    if clamp_widths:
        def reg(x):
            return base(jnp.clip(x, log_min_clamp, log_max_clamp))
        return reg
    return base


def log_one_plus_exp_x_to_a_minus_1(x, a):
    """Numerically stable log( (1+exp(x))^a - 1 ).

    Used by the skewed logistic CDF/SF (reference extra_functions.py:14-61).
    Three regimes:
      x large:        a*softplus(x) + log1p(-(1+exp(x))^-a) ~ a*x
      x small/neg:    log(a) + x region via log(expm1(a*softplus(x)))
    We use: y = a * softplus(x); result = y + log1p(-exp(-y)) for y above a
    threshold, and log(expm1(y)) below.
    """
    y = a * jax.nn.softplus(x)
    if y.dtype == jnp.float32:
        # f32 (TPU/Pallas) variant: Mosaic has no expm1 lowering, so the
        # small-y regime uses the series log(expm1(y)) = log(y) + log1p(
        # y/2 + y^2/6 + y^3/24) (+O(y^4/120): rel err ~8e-7 at y=0.1) and
        # y >= 0.1 uses y + log1p(-exp(-y)) (rel err ~6e-7 at the seam,
        # overflow-free for arbitrarily large y).  Shared by the XLA f32
        # branch AND the kernels so both stay in expression lockstep.
        tiny = jnp.finfo(y.dtype).tiny
        ys = jnp.where(y < 0.1, y, 0.1)
        series = jnp.log(jnp.maximum(ys, tiny)) + jnp.log1p(
            ys * (0.5 + ys * (1.0 / 6.0 + ys * (1.0 / 24.0))))
        yl = jnp.where(y < 0.1, 0.1, y)
        large = yl + jnp.log1p(-jnp.exp(-yl))
        return jnp.where(y < 0.1, series, large)
    # f64: log(exp(y) - 1) = y + log(1 - exp(-y))  (stable for y > ~0.69)
    #                      = log(expm1(y))         (stable for small y)
    safe_small = jnp.log(jnp.expm1(jnp.where(y < 0.69, y, 0.69)))
    safe_large = jnp.where(y > 1e-10, y, 1e-10) + jnp.log1p(
        -jnp.exp(-jnp.where(y > 0.69, y, 0.69)))
    return jnp.where(y < 0.69, safe_small, safe_large)


def expand_batch(p, batch_size):
    """Broadcast a (1, ...) parameter array to (batch_size, ...)."""
    if p.shape[0] == batch_size:
        return p
    return jnp.broadcast_to(p, (batch_size,) + p.shape[1:])
