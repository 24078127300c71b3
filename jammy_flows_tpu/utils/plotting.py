"""Visualization helpers (TPU-native equivalent of helper_fns/plotting/).

Corner-style joint-PDF visualization over mixed manifolds plus S2 map views.
All plotting is host-side matplotlib consuming device arrays; the PDF
evaluations run jitted on the accelerator.
"""
from __future__ import annotations

import math

import numpy as np
import jax
import jax.numpy as jnp

from . import grid as grid_utils
from . import contours as contour_utils


def _eval_chunked(pdf_obj, params, positions, conditional_input=None,
                  force_intrinsic=False, chunk=20000):
    outs = []
    dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    for s in range(0, positions.shape[0], chunk):
        block = jnp.asarray(positions[s:s + chunk], dtype=dtype)
        ci = None
        if conditional_input is not None:
            ci = jnp.broadcast_to(conditional_input,
                                  (block.shape[0],) + conditional_input.shape[1:])
        lp, _, _ = pdf_obj.log_prob(params, block, conditional_input=ci,
                                    force_intrinsic_coordinates=force_intrinsic)
        outs.append(np.asarray(lp))
    return np.concatenate(outs)


def plot_1d_marginal(ax, pdf_obj, params, samples, dim_index,
                     conditional_input=None, npts=200, color="C0"):
    """1-d marginal histogram from samples + overlaid density if total dim 1."""
    s = np.asarray(samples[:, dim_index])
    ax.hist(s, bins=50, density=True, color=color, alpha=0.4)
    ax.set_xlabel(f"dim {dim_index}")


def plot_density_2d(ax, pdf_obj, params, bounds, conditional_input=None,
                    npts=100, probs=(0.68, 0.95), cmap="viridis"):
    """Filled 2-d density + HPD contours for a 2-d Euclidean PDF
    (plotting/general.py:276-664 core path)."""
    positions, bin_volume = grid_utils.make_grid(bounds, npts)
    lp = _eval_chunked(pdf_obj, params, positions, conditional_input)
    zz = lp.reshape(npts, npts)
    xx = positions[:, 0].reshape(npts, npts)
    yy = positions[:, 1].reshape(npts, npts)
    ax.pcolormesh(xx, yy, np.exp(zz), cmap=cmap, shading="auto")
    lines, levels = contour_utils.compute_contours(xx, yy, zz, bin_volume,
                                                   probs=probs)
    for prob, segs in zip(probs, lines):
        for seg in segs:
            ax.plot(seg[:, 0], seg[:, 1], color="white", lw=1.0)
    return levels


def plot_sphere_2d(ax, pdf_obj, params, conditional_input=None, n_theta=100,
                   n_phi=200, probs=(0.68, 0.95), cmap="viridis"):
    """theta-phi map of an s2 PDF with HPD contours
    (plotting/spherical.py equivalent, healpy-free)."""
    thetas = np.linspace(1e-3, math.pi - 1e-3, n_theta)
    phis = np.linspace(1e-3, 2 * math.pi - 1e-3, n_phi)
    tt, pp = np.meshgrid(thetas, phis, indexing="ij")
    pts = np.stack([tt.ravel(), pp.ravel()], axis=1)
    lp = _eval_chunked(pdf_obj, params, pts, conditional_input,
                       force_intrinsic=True)
    zz = lp.reshape(n_theta, n_phi)
    area = (thetas[1] - thetas[0]) * (phis[1] - phis[0])
    ax.pcolormesh(pp, tt, np.exp(zz), cmap=cmap, shading="auto")
    lines, levels = contour_utils.compute_contours(pp, tt, zz, area,
                                                   probs=probs, wrap_phi=True)
    for segs in lines:
        for seg in segs:
            ax.plot(seg[:, 0], seg[:, 1], color="white", lw=1.0)
    ax.set_xlabel("phi")
    ax.set_ylabel("theta")
    ax.invert_yaxis()
    return levels


def plot_sphere_lambert(ax, pdf_obj, params, conditional_input=None, npts=60,
                        true_values=None, rotate_to_true_value=False,
                        probs=(0.68, 0.95), cmap="viridis", draw_gridlines=True):
    """Equal-area Lambert-disk view of a pure-s2 PDF
    (plotting/spherical.py + grid_functions.py:123-236 equivalent).

    Evaluates the PDF on a [-2,2]^2 Lambert grid, converts grid points to
    (theta, phi) — optionally rotated so ``true_values`` sits at the disk
    centre — and subtracts log sin(theta) so the plotted density is per
    Lambert area (the projection is equal-area, so the disk integral is the
    total probability).  Returns the disk integral (should be ~1).
    """
    assert pdf_obj.pdf_defs_list == ["s2"], \
        "plot_sphere_lambert supports pure-s2 PDFs"
    xs = np.linspace(-2.0, 2.0, npts)
    xx, yy = np.meshgrid(xs, xs, indexing="ij")
    pts_l = np.stack([xx.ravel(), yy.ravel()], axis=1)
    r = np.sqrt((pts_l**2).sum(axis=1))
    inside = r < 2.0 - 1e-6

    fix_point = true_values if (rotate_to_true_value
                                and true_values is not None) else None
    sph = grid_utils.cartesian_lambert_to_spherical(pts_l[inside],
                                                    fix_point=fix_point)
    # clamp away from the exact poles (intrinsic parametrization is singular)
    sph[:, 0] = np.clip(sph[:, 0], 1e-5, math.pi - 1e-5)
    lp = _eval_chunked(pdf_obj, params, sph, conditional_input,
                       force_intrinsic=True)
    # theta/phi density -> Lambert-plane density (equal-area: drop sin(theta))
    lp = lp - np.log(np.maximum(np.sin(sph[:, 0]), 1e-12))

    zz = np.full(pts_l.shape[0], -600.0)
    zz[inside] = lp
    zz = zz.reshape(npts, npts)
    vals = np.ma.masked_array(np.exp(zz), mask=~inside.reshape(npts, npts))
    ax.pcolormesh(xx, yy, vals, cmap=cmap, shading="auto")

    cell = (xs[1] - xs[0])**2
    total_integral = float(np.exp(lp).sum() * cell)

    lines, _ = contour_utils.compute_contours(xx, yy, zz, cell, probs=probs)
    for segs in lines:
        for seg in segs:
            ax.plot(seg[:, 0], seg[:, 1], color="white", lw=1.0)

    if draw_gridlines:
        for gl in grid_utils.get_basic_gridlines():
            gxy = grid_utils.spherical_to_cartesian_lambert(gl,
                                                            fix_point=fix_point)
            keep = np.sqrt((gxy**2).sum(axis=1)) < 1.999
            ax.plot(np.where(keep, gxy[:, 0], np.nan),
                    np.where(keep, gxy[:, 1], np.nan),
                    color="gray", lw=0.4, alpha=0.6)
    if true_values is not None:
        txy = grid_utils.spherical_to_cartesian_lambert(
            np.asarray(true_values, dtype=np.float64)[None, :],
            fix_point=fix_point)
        ax.scatter(txy[:, 0], txy[:, 1], color="red", s=20, zorder=5)
    circle = np.linspace(0, 2 * math.pi, 200)
    ax.plot(2 * np.cos(circle), 2 * np.sin(circle), color="black", lw=1.0)
    ax.set_aspect("equal")
    ax.set_xlim(-2.1, 2.1)
    ax.set_ylim(-2.1, 2.1)
    return total_integral


def plot_sphere_mollweide(ax, pdf_obj, params, conditional_input=None,
                          n_base=2048, rounds=3, probs=(0.68, 0.95),
                          cmap="viridis", draw_gridlines=True,
                          true_values=None, scan=None, contour_npts=(80, 160)):
    """Full-sky equal-area Mollweide view rendering the MULTIRESOLUTION scan
    (healpy-free equivalent of plotting/spherical.py:452-550
    plot_multiresolution_healpy).

    Each adaptive cell of utils/grid.py:multires_s2_scan is drawn as a
    projected polygon colored by its density (per solid angle); HPD contour
    lines for ``probs`` are computed on a regular theta-phi grid and
    projected on top.  Returns the scan's total integral (~1 for a
    normalized PDF).  Pass a precomputed ``scan`` (pts, lp, areas, cells) to
    render an existing scan without re-evaluating.
    """
    from matplotlib.collections import PolyCollection
    import matplotlib.pyplot as plt

    if scan is None:
        scan = grid_utils.multires_s2_scan(
            pdf_obj, params, conditional_input=conditional_input,
            n_base=n_base, rounds=rounds, return_cells=True)
    pts, lp, areas, cells = scan
    total_integral = float(np.sum(np.exp(lp) * areas))

    # polygon corners per cell, with edge subdivision for projection curvature
    polys = []
    tsub = np.linspace(0.0, 1.0, 4)
    for (zl, zh, pl, ph) in cells:
        zz = np.concatenate([np.full(4, zl), tsub * (zh - zl) + zl,
                             np.full(4, zh), (1 - tsub) * (zh - zl) + zl])
        pp = np.concatenate([tsub * (ph - pl) + pl, np.full(4, ph),
                             (1 - tsub) * (ph - pl) + pl, np.full(4, pl)])
        th = np.arccos(np.clip(zz, -1.0, 1.0))
        x, y = grid_utils.mollweide_xy(th, pp)
        polys.append(np.stack([x, y], axis=1))
    vals = np.exp(lp)
    norm = plt.Normalize(vmin=0.0, vmax=float(vals.max()))
    coll = PolyCollection(polys, array=vals, cmap=cmap, norm=norm,
                          edgecolors="none")
    ax.add_collection(coll)

    # HPD contour lines from a regular grid, projected
    n_t, n_p = contour_npts
    thetas = np.linspace(1e-3, math.pi - 1e-3, n_t)
    phis = np.linspace(1e-3, 2 * math.pi - 1e-3, n_p)
    tt, pp = np.meshgrid(thetas, phis, indexing="ij")
    grid_pts = np.stack([tt.ravel(), pp.ravel()], axis=1)
    glp = _eval_chunked(pdf_obj, params, grid_pts, conditional_input,
                        force_intrinsic=True)
    zz = glp.reshape(n_t, n_p)
    area = (thetas[1] - thetas[0]) * (phis[1] - phis[0])
    lines, levels = contour_utils.compute_contours(pp, tt, zz, area,
                                                   probs=probs, wrap_phi=True)
    for segs in lines:
        for seg in segs:
            x, y = grid_utils.mollweide_xy(seg[:, 1], seg[:, 0])
            # break segments that jump across the Mollweide seam
            jump = np.abs(np.diff(x)) > 2.0
            x = np.insert(x, np.where(jump)[0] + 1, np.nan)
            y = np.insert(y, np.where(jump)[0] + 1, np.nan)
            ax.plot(x, y, color="white", lw=1.0)

    if draw_gridlines:
        for gl in grid_utils.get_basic_gridlines():
            x, y = grid_utils.mollweide_xy(np.asarray(gl)[:, 0],
                                           np.asarray(gl)[:, 1])
            jump = np.abs(np.diff(x)) > 2.0
            x = np.insert(x, np.where(jump)[0] + 1, np.nan)
            y = np.insert(y, np.where(jump)[0] + 1, np.nan)
            ax.plot(x, y, color="gray", lw=0.4, alpha=0.6)
    if true_values is not None:
        tv = np.asarray(true_values, dtype=np.float64).reshape(-1, 2)
        x, y = grid_utils.mollweide_xy(tv[:, 0], tv[:, 1])
        ax.scatter(x, y, color="red", s=20, zorder=5)

    # outline of the projection ellipse
    t = np.linspace(0, 2 * math.pi, 200)
    ax.plot(2 * math.sqrt(2) * np.cos(t), math.sqrt(2) * np.sin(t),
            color="black", lw=1.0)
    ax.set_aspect("equal")
    ax.set_xlim(-2 * math.sqrt(2) - 0.1, 2 * math.sqrt(2) + 0.1)
    ax.set_ylim(-math.sqrt(2) - 0.1, math.sqrt(2) + 0.1)
    ax.set_axis_off()
    return total_integral


def plot_sphere_zoom(ax, pdf_obj, params, center, zoom_radius_deg=20.0,
                     conditional_input=None, npts=80, probs=(0.68, 0.95),
                     cmap="viridis", draw_gridlines=True, true_values=None):
    """Zoomed equal-area view around ``center`` = (theta, phi)
    (plotting/spherical.py:552-614 zoomed-healpy equivalent).

    A Lambert azimuthal projection rotated so ``center`` sits at the origin,
    restricted to the disk of angular radius ``zoom_radius_deg``.  The
    projection is equal-area, so HPD contours and the disk integral remain
    exact in the zoomed window.
    """
    center = np.asarray(center, dtype=np.float64).ravel()
    r_max = 2.0 * math.sin(math.radians(zoom_radius_deg) / 2.0)
    xs = np.linspace(-r_max, r_max, npts)
    xx, yy = np.meshgrid(xs, xs, indexing="ij")
    pts_l = np.stack([xx.ravel(), yy.ravel()], axis=1)
    inside = np.sqrt((pts_l**2).sum(axis=1)) < r_max - 1e-9

    sph = grid_utils.cartesian_lambert_to_spherical(pts_l[inside],
                                                    fix_point=center)
    sph[:, 0] = np.clip(sph[:, 0], 1e-5, math.pi - 1e-5)
    lp = _eval_chunked(pdf_obj, params, sph, conditional_input,
                       force_intrinsic=True)
    lp = lp - np.log(np.maximum(np.sin(sph[:, 0]), 1e-12))

    zz = np.full(pts_l.shape[0], -600.0)
    zz[inside] = lp
    zz = zz.reshape(npts, npts)
    vals = np.ma.masked_array(np.exp(zz), mask=~inside.reshape(npts, npts))
    ax.pcolormesh(xx, yy, vals, cmap=cmap, shading="auto")

    cell = (xs[1] - xs[0])**2
    window_integral = float(np.exp(lp).sum() * cell)
    lines, _ = contour_utils.compute_contours(xx, yy, zz, cell, probs=probs)
    for segs in lines:
        for seg in segs:
            ax.plot(seg[:, 0], seg[:, 1], color="white", lw=1.0)

    if draw_gridlines:
        for gl in grid_utils.get_basic_gridlines(n_theta=9, n_phi=18,
                                                 npts=400):
            gxy = grid_utils.spherical_to_cartesian_lambert(gl,
                                                            fix_point=center)
            keep = np.sqrt((gxy**2).sum(axis=1)) < r_max
            ax.plot(np.where(keep, gxy[:, 0], np.nan),
                    np.where(keep, gxy[:, 1], np.nan),
                    color="gray", lw=0.4, alpha=0.6)
    if true_values is not None:
        txy = grid_utils.spherical_to_cartesian_lambert(
            np.asarray(true_values, dtype=np.float64)[None, :],
            fix_point=center)
        ax.scatter(txy[:, 0], txy[:, 1], color="red", s=20, zorder=5)
    circle = np.linspace(0, 2 * math.pi, 200)
    ax.plot(r_max * np.cos(circle), r_max * np.sin(circle), color="black",
            lw=1.0)
    ax.set_aspect("equal")
    return window_integral


def visualize_pdf(pdf_obj, params, key=None, conditional_input=None,
                  samplesize=10000, npts=100, fig=None, s2_norm="standard",
                  s2_rotate_to_true_value=False, true_values=None):
    """Corner-style joint visualization over mixed manifolds
    (plotting/general.py:666-840 equivalent).

    Euclidean sub-manifolds get pairwise 2-d density panels + 1-d marginals;
    s2 sub-manifolds get theta-phi maps; s1/intervals get 1-d histograms.
    Returns the matplotlib figure.
    """
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    key = key if key is not None else jax.random.PRNGKey(0)
    ci_one = None
    if conditional_input is not None:
        ci_rep = jnp.repeat(conditional_input[:1], samplesize, axis=0)
        samples, _, _, _ = pdf_obj.sample(params, key,
                                          conditional_input=ci_rep,
                                          force_intrinsic_coordinates=True)
        ci_one = conditional_input[:1]
    else:
        samples, _, _, _ = pdf_obj.sample(params, key, samplesize=samplesize,
                                          force_intrinsic_coordinates=True)
    samples = np.asarray(samples)

    single = len(pdf_obj.pdf_defs_list) == 1
    panels = []
    for k, sub_def in enumerate(pdf_obj.pdf_defs_list):
        # samples above are drawn force_intrinsic, so slice intrinsically
        lo, hi = pdf_obj.target_dim_indices_intrinsic[k]
        if sub_def[0] == "e" and (hi - lo) == 2 and single:
            panels.append(("density2d", k, lo, hi))
        elif sub_def == "s2":
            # density scans need the full joint input; for joint PDFs the
            # s2 marginal panel is sample-based instead
            panels.append(("sphere" if single else "sphere_hist", k, lo, hi))
        else:
            for d in range(lo, hi):
                panels.append(("hist", k, d, d + 1))

    n = max(1, len(panels))
    ncols = min(3, n)
    nrows = (n + ncols - 1) // ncols
    if fig is None:
        fig, axes = plt.subplots(nrows, ncols, figsize=(4 * ncols, 3.5 * nrows),
                                 squeeze=False)
    else:
        axes = np.array(fig.get_axes()).reshape(nrows, ncols)

    for i, panel in enumerate(panels):
        ax = axes[i // ncols][i % ncols]
        kind, k, lo, hi = panel
        if kind == "density2d":
            bounds = grid_utils.percentile_bounds(samples[:, lo:hi])
            plot_density_2d(ax, pdf_obj, params, bounds,
                            conditional_input=ci_one, npts=npts)
            ax.scatter(samples[:500, lo], samples[:500, lo + 1], s=1,
                       color="red", alpha=0.3)
        elif kind == "sphere":
            tv = None
            if true_values is not None:
                tv = np.asarray(true_values).ravel()[lo:hi]
            if s2_norm == "lambert":
                plot_sphere_lambert(
                    ax, pdf_obj, params, conditional_input=ci_one,
                    true_values=tv,
                    rotate_to_true_value=s2_rotate_to_true_value)
            elif s2_norm == "mollweide":
                plot_sphere_mollweide(
                    ax, pdf_obj, params, conditional_input=ci_one,
                    true_values=None if tv is None else tv[None, :])
            elif s2_norm == "zoom":
                center = tv if tv is not None else np.array([0.5 * math.pi,
                                                             math.pi])
                plot_sphere_zoom(ax, pdf_obj, params, center=center,
                                 conditional_input=ci_one, true_values=tv)
            else:
                plot_sphere_2d(ax, pdf_obj, params, conditional_input=ci_one)
        elif kind == "sphere_hist":
            ax.hist2d(samples[:, lo + 1], samples[:, lo], bins=40,
                      range=[[0, 2 * math.pi], [0, math.pi]])
            ax.set_xlabel("phi")
            ax.set_ylabel("theta")
            ax.invert_yaxis()
        else:
            ax.hist(samples[:, lo], bins=50, density=True, alpha=0.5)
            ax.set_xlabel(f"dim {lo}")
    fig.tight_layout()
    return fig


# reference-compatible alias (plotting/general.py:666)
plot_joint_pdf = visualize_pdf
