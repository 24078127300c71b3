"""Grid evaluation helpers (TPU-native equivalent of helper_fns/grid_functions.py).

Percentile-based visualization bounds and batched PDF evaluation on
meshgrids, plus the Lambert azimuthal equal-area projection used by the
spherical plotting helpers.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def percentile_bounds(samples, percentiles=(0.5, 99.5), margin_factor=0.1):
    """Per-dimension [low, high] bounds from sample percentiles
    (grid_functions.py:6-104)."""
    lows = np.percentile(samples, percentiles[0], axis=0)
    highs = np.percentile(samples, percentiles[1], axis=0)
    margin = (highs - lows) * margin_factor
    return np.stack([lows - margin, highs + margin], axis=1)


def make_grid(bounds, npts_per_dim):
    """Flattened meshgrid positions (N, D) + uniform bin volume."""
    axes = [np.linspace(lo, hi, npts_per_dim) for lo, hi in bounds]
    mesh = np.meshgrid(*axes, indexing="ij")
    positions = np.stack([m.ravel() for m in mesh], axis=1)
    widths = [(hi - lo) / (npts_per_dim - 1) for lo, hi in bounds]
    return positions, float(np.prod(widths))


def pdf_on_grid(pdf_obj, params, bounds, npts_per_dim, conditional_input=None,
                chunk_size=20000):
    """Evaluate the PDF on a regular grid (grid_functions.py:106-283).

    Returns (positions (N, D) numpy, log_evals (N,) numpy, bin_volume float).
    """
    positions, bin_volume = make_grid(bounds, npts_per_dim)
    n = positions.shape[0]
    log_evals = []
    dtype = jnp.float64 if positions.dtype == np.float64 else jnp.float32
    for start in range(0, n, chunk_size):
        chunk = jnp.asarray(positions[start:start + chunk_size], dtype=dtype)
        ci = None
        if conditional_input is not None:
            if isinstance(conditional_input, list):
                ci = [jnp.broadcast_to(c, (chunk.shape[0],) + c.shape[1:])
                      for c in conditional_input]
            else:
                ci = jnp.broadcast_to(
                    conditional_input,
                    (chunk.shape[0],) + conditional_input.shape[1:])
        lp, _, _ = pdf_obj.log_prob(params, chunk, conditional_input=ci)
        log_evals.append(np.asarray(lp))
    return positions, np.concatenate(log_evals), bin_volume


def lambert_azimuthal_equal_area(theta, phi, center=(0.0, 0.0)):
    """Lambert azimuthal equal-area projection of (theta, phi) around a
    center direction (grid_functions.py:339-398)."""
    theta0, phi0 = center
    # rotate center to the pole: use spherical trig directly
    cos_c = (np.cos(theta0) * np.cos(theta)
             + np.sin(theta0) * np.sin(theta) * np.cos(phi - phi0))
    k = np.sqrt(2.0 / np.maximum(1.0 + cos_c, 1e-12))
    x = k * np.sin(theta) * np.sin(phi - phi0)
    y = k * (np.sin(theta0) * np.cos(theta)
             - np.cos(theta0) * np.sin(theta) * np.cos(phi - phi0))
    return x, y
