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


def multires_s2_scan(pdf_obj, params, conditional_input=None, n_base=1024,
                     rounds=3, refine_frac=0.25, chunk=20000):
    """Adaptive multiresolution scan of an s2 PDF (healpy-free equivalent of
    plotting/spherical.py:480 get_multiresolution_evals).

    Starts from an equal-area (cos-theta x phi) grid and repeatedly
    subdivides the highest-probability-mass cells into 4.  Returns
    (positions (N,2 theta/phi), log_evals (N,), areas (N,)) covering the
    sphere exactly (sum(exp(log_evals) * areas) ~ 1 for a normalized PDF).
    """
    import jax
    import jax.numpy as jnp

    n_t = max(2, int(np.sqrt(n_base / 2)))
    n_p = 2 * n_t
    z_edges = np.linspace(-1.0, 1.0, n_t + 1)
    p_edges = np.linspace(0.0, 2 * np.pi, n_p + 1)
    cells = []
    for i in range(n_t):
        for j in range(n_p):
            cells.append((z_edges[i], z_edges[i + 1], p_edges[j], p_edges[j + 1]))
    cells = np.asarray(cells)      # (N, 4): z_lo, z_hi, phi_lo, phi_hi

    def eval_cells(cells_arr):
        zc = 0.5 * (cells_arr[:, 0] + cells_arr[:, 1])
        pc = 0.5 * (cells_arr[:, 2] + cells_arr[:, 3])
        theta = np.arccos(np.clip(zc, -1, 1))
        pts = np.stack([theta, pc], axis=1)
        lps = []
        dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
        for s in range(0, len(pts), chunk):
            block = jnp.asarray(pts[s:s + chunk], dtype)
            ci = None
            if conditional_input is not None:
                ci = jnp.broadcast_to(
                    conditional_input,
                    (block.shape[0],) + conditional_input.shape[1:])
            lp, _, _ = pdf_obj.log_prob(params, block, conditional_input=ci,
                                        force_intrinsic_coordinates=True)
            lps.append(np.asarray(lp))
        lp = np.concatenate(lps)
        areas = (cells_arr[:, 1] - cells_arr[:, 0]) * \
            (cells_arr[:, 3] - cells_arr[:, 2])
        return pts, lp, areas

    pts, lp, areas = eval_cells(cells)
    for _ in range(rounds):
        mass = np.exp(lp) * areas
        k = max(1, int(refine_frac * len(cells)))
        refine_idx = np.argsort(mass)[::-1][:k]
        keep_mask = np.ones(len(cells), bool)
        keep_mask[refine_idx] = False
        kept = cells[keep_mask]
        sub = []
        for (zl, zh, pl, ph) in cells[refine_idx]:
            zm, pm = 0.5 * (zl + zh), 0.5 * (pl + ph)
            sub += [(zl, zm, pl, pm), (zl, zm, pm, ph),
                    (zm, zh, pl, pm), (zm, zh, pm, ph)]
        cells = np.concatenate([kept, np.asarray(sub)])
        pts, lp, areas = eval_cells(cells)
    # convert cell areas from (dz * dphi) to solid angle: dz dphi IS the
    # solid angle element on the sphere, and the intrinsic theta/phi density
    # carries the sin(theta) factor -> density per dz dphi = pdf / sin(theta)
    sin_t = np.maximum(np.sin(pts[:, 0]), 1e-12)
    return pts, lp - np.log(sin_t), areas


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
