"""Tests for vMF/Kent approximations, contours, grid, and plotting utils."""
import math

import jax
import jax.numpy as jnp
import numpy as np

from jammy_flows_tpu import pdf
from jammy_flows_tpu.utils import vmf_kent, contours, grid


def test_vmf_coverage_calibrated():
    """Coverage of vMF samples under their own vMF must be uniform."""
    rng = np.random.default_rng(0)
    mu = np.array([0.0, 0.0, 1.0])
    kappa = 10.0
    samples = vmf_kent.sample_vmf_s2(mu, kappa, 5000, rng=rng)
    cov = vmf_kent.vmf_coverage_s2_batch(
        samples, np.tile(mu, (5000, 1)), np.full(5000, kappa))
    # uniform on [0,1]
    assert abs(cov.mean() - 0.5) < 0.03
    assert abs(np.quantile(cov, 0.25) - 0.25) < 0.03


def test_vmf_sampler_moments():
    rng = np.random.default_rng(1)
    mu = np.array([1.0, 0.0, 0.0])
    kappa = 20.0
    s = vmf_kent.sample_vmf_s2(mu, kappa, 20000, rng=rng)
    mean_dir = s.mean(axis=0)
    rbar = np.linalg.norm(mean_dir)
    # A_3(20) = coth(20) - 1/20 = 0.95
    assert abs(rbar - 0.95) < 0.01
    np.testing.assert_allclose(mean_dir / rbar, mu, atol=0.02)


def test_zlpkent_fit_recovers_vmf():
    """Fitting zlp-Kent to vMF samples must recover kappa and u ~ 1."""
    rng = np.random.default_rng(2)
    mu = np.array([0.0, 1.0, 0.0])
    kappa = 15.0
    samples = np.stack([vmf_kent.sample_vmf_s2(mu, kappa, 3000, rng=rng)
                        for _ in range(2)])
    fit = vmf_kent.fit_zlpkent_batch_quat(samples, num_steps=200)
    np.testing.assert_allclose(fit["kappa"], kappa, rtol=0.15)
    np.testing.assert_allclose(np.abs(fit["gamma1"] @ mu), 1.0, atol=0.01)
    np.testing.assert_allclose(fit["u"], 1.0, atol=0.1)


def test_zlpkent_logpdf_normalized():
    """zlp-Kent log-pdf must integrate to 1 on the sphere."""
    g1 = np.array([[0.0, 0.0, 1.0]])
    g2 = np.array([[1.0, 0.0, 0.0]])
    g3 = np.array([[0.0, 1.0, 0.0]])
    kappa, u = np.array([5.0]), np.array([1.3])
    n_t, n_p = 200, 400
    thetas = np.linspace(1e-4, math.pi - 1e-4, n_t)
    phis = np.linspace(0, 2 * math.pi, n_p, endpoint=False)
    tt, pp = np.meshgrid(thetas, phis, indexing="ij")
    xyz = np.stack([np.sin(tt) * np.cos(pp), np.sin(tt) * np.sin(pp),
                    np.cos(tt)], axis=-1).reshape(-1, 3)
    lp = vmf_kent.zlpkent_logpdf_s2_batch(
        xyz, np.tile(g1, (len(xyz), 1)), np.tile(g2, (len(xyz), 1)),
        np.tile(g3, (len(xyz), 1)), np.full(len(xyz), kappa[0]),
        np.full(len(xyz), u[0]))
    area = np.sin(tt).ravel() * (thetas[1] - thetas[0]) * (phis[1] - phis[0])
    norm = np.sum(np.exp(lp) * area)
    assert abs(norm - 1.0) < 2e-2, norm


def test_contour_levels_gaussian():
    """HPD levels of a standard 2-d Gaussian: 68% level = p(r) at chi2 qf."""
    n = 400
    xs = np.linspace(-5, 5, n)
    xx, yy = np.meshgrid(xs, xs, indexing="ij")
    log_evals = -0.5 * (xx**2 + yy**2) - np.log(2 * np.pi)
    area = (xs[1] - xs[0])**2
    levels = contours.find_contour_levels(log_evals.ravel(), area,
                                          probs=[0.68, 0.95])
    # exact: level_p = exp(-0.5 * chi2_ppf(p, 2)) / (2 pi)
    from scipy.stats import chi2
    for lv, p in zip(levels, [0.68, 0.95]):
        exact = math.exp(-0.5 * chi2.ppf(p, 2)) / (2 * math.pi)
        assert abs(lv - exact) / exact < 0.05


def test_compute_contours_runs():
    n = 100
    xs = np.linspace(-4, 4, n)
    xx, yy = np.meshgrid(xs, xs, indexing="ij")
    log_evals = -0.5 * (xx**2 + yy**2) - np.log(2 * np.pi)
    area = (xs[1] - xs[0])**2
    lines, levels = contours.compute_contours(xx, yy, log_evals, area)
    assert len(lines) == 2 and len(lines[0]) >= 1
    # 68% contour of a standard normal is a circle of radius ~1.51
    seg = lines[0][0]
    radii = np.linalg.norm(seg, axis=1)
    np.testing.assert_allclose(radii, 1.509, atol=0.1)


def test_find_1d_contours():
    xs = np.linspace(-6, 6, 2001)
    log_evals = -0.5 * xs**2 - 0.5 * np.log(2 * np.pi)
    intervals = contours.find_1d_contours(xs, log_evals, probs=[0.68])
    (lo, hi), = intervals[0]
    assert abs(lo + 1.0) < 0.05 and abs(hi - 1.0) < 0.05


def test_visualize_pdf_smoke(tmp_path):
    from jammy_flows_tpu.utils import plotting
    p = pdf("e2", "gg")
    params = p.init_params(seed=0)
    fig = plotting.visualize_pdf(p, params, samplesize=2000, npts=40)
    out = tmp_path / "pdf.png"
    fig.savefig(out)
    assert out.exists() and out.stat().st_size > 1000

    p2 = pdf("s2", "f")
    params2 = p2.init_params(seed=1)
    fig2 = plotting.visualize_pdf(p2, params2, samplesize=2000)
    fig2.savefig(tmp_path / "s2.png")


def test_lambert_projection_preserves_area_locally():
    theta = np.array([0.5, 1.0])
    phi = np.array([0.3, 2.0])
    x, y = grid.lambert_azimuthal_equal_area(theta, phi, center=(0.0, 0.0))
    # center maps to origin
    x0, y0 = grid.lambert_azimuthal_equal_area(np.array([0.0]), np.array([0.0]),
                                               center=(0.0, 0.0))
    np.testing.assert_allclose([x0[0], y0[0]], [0.0, 0.0], atol=1e-12)


def test_lambert_cartesian_roundtrip_with_rotation():
    """spherical->lambert->spherical is the identity, incl. fix-point
    rotation (grid_functions.py:339-377 semantics)."""
    rng = np.random.default_rng(0)
    sph = np.stack([rng.uniform(0.05, np.pi - 0.05, 300),
                    rng.uniform(0.0, 2 * np.pi, 300)], axis=1)
    for fp in [None, np.array([0.7, 1.3]), np.array([np.pi - 1e-3, 0.0])]:
        xy = grid.spherical_to_cartesian_lambert(sph, fix_point=fp)
        assert np.all(np.sqrt((xy**2).sum(1)) <= 2.0 + 1e-9)
        back = grid.cartesian_lambert_to_spherical(xy, fix_point=fp)
        np.testing.assert_allclose(back[:, 0], sph[:, 0], atol=1e-9)
        dphi = np.abs((back[:, 1] - sph[:, 1] + np.pi) % (2 * np.pi) - np.pi)
        assert dphi.max() < 1e-7
    # fix point maps to the disk centre
    fp = np.array([0.4, 2.2])
    xy = grid.spherical_to_cartesian_lambert(fp[None, :], fix_point=fp)
    np.testing.assert_allclose(xy, 0.0, atol=1e-9)


def test_plot_sphere_lambert_integral(tmp_path):
    """The Lambert-disk density integrates to ~1 (equal-area projection)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from jammy_flows_tpu.utils import plotting

    p = pdf("s2", "f")
    params = p.init_params(seed=1)
    fig, ax = plt.subplots()
    total = plotting.plot_sphere_lambert(
        ax, p, params, npts=40, true_values=np.array([0.8, 2.0]),
        rotate_to_true_value=True)
    assert abs(total - 1.0) < 0.05
    fig.savefig(tmp_path / "lambert.png")
    plt.close(fig)


def test_mollweide_projection_properties():
    """Mollweide is equal-area: jacobian of (x,y) wrt (z=cos theta, phi) is
    constant = 2*sqrt(2)/pi * sqrt(2) ... checked numerically via patch
    areas; and known points map correctly."""
    from jammy_flows_tpu.utils import grid
    # equator center: theta=pi/2, phi=pi -> (0, 0)
    x, y = grid.mollweide_xy(np.array([np.pi / 2]), np.array([np.pi]))
    assert abs(x[0]) < 1e-12 and abs(y[0]) < 1e-12
    # poles -> y = +-sqrt(2)
    x, y = grid.mollweide_xy(np.array([0.0, np.pi]), np.array([1.0, 1.0]))
    np.testing.assert_allclose(y, [np.sqrt(2), -np.sqrt(2)], atol=1e-9)
    # equal-area: total ellipse area = 4*pi/2 * ... pi*a*b = pi*2sqrt2*sqrt2
    # = 4pi: a small patch (dz x dphi) must map to area dz*dphi (x scale)
    rng = np.random.default_rng(0)
    z = rng.uniform(-0.9, 0.9, 50)
    ph = rng.uniform(0.1, 2 * np.pi - 0.1, 50)
    eps = 1e-4
    th = np.arccos(z)
    th2 = np.arccos(z + eps)
    x1, y1 = grid.mollweide_xy(th, ph)
    x2, y2 = grid.mollweide_xy(th2, ph)
    x3, y3 = grid.mollweide_xy(th, ph + eps)
    # parallelogram area of the projected (dz, dphi) patch; equal-area
    # (sphere 4pi = ellipse pi*2sqrt2*sqrt2) means jacobian wrt (z,phi) = 1
    area = np.abs((x2 - x1) * (y3 - y1) - (y2 - y1) * (x3 - x1))
    np.testing.assert_allclose(area / eps**2, 1.0, rtol=2e-3)


def test_plot_sphere_mollweide_integral(tmp_path):
    """The multires Mollweide render integrates to ~1 and writes a PNG."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from jammy_flows_tpu.utils import plotting

    p = pdf("s2", "f")
    params = p.init_params(seed=1)
    fig, ax = plt.subplots(figsize=(8, 4.5))
    total = plotting.plot_sphere_mollweide(
        ax, p, params, n_base=512, rounds=2,
        true_values=np.array([[0.8, 2.0]]))
    assert abs(total - 1.0) < 0.05, total
    fig.savefig(tmp_path / "mollweide.png")
    plt.close(fig)


def test_plot_sphere_zoom(tmp_path):
    """The zoomed equal-area window integral equals the HPD mass inside it."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from jammy_flows_tpu.utils import plotting

    p = pdf("s2", "f")
    params = p.init_params(seed=1)
    # find the mode region from a quick sample mean
    import jax
    s, _, _, _ = p.sample(params, jax.random.PRNGKey(0), samplesize=500)
    s = np.asarray(s)
    v = np.stack([np.sin(s[:, 0]) * np.cos(s[:, 1]),
                  np.sin(s[:, 0]) * np.sin(s[:, 1]), np.cos(s[:, 0])], 1)
    m = v.mean(0)
    m /= np.linalg.norm(m)
    center = np.array([np.arccos(m[2]),
                       np.mod(np.arctan2(m[1], m[0]), 2 * np.pi)])
    fig, ax = plt.subplots()
    w = plotting.plot_sphere_zoom(ax, p, params, center=center,
                                  zoom_radius_deg=60.0, npts=50)
    assert 0.0 < w <= 1.0 + 1e-6
    fig.savefig(tmp_path / "zoom.png")
    plt.close(fig)


def test_visualize_pdf_mollweide_smoke(tmp_path):
    from jammy_flows_tpu.utils import plotting
    p = pdf("s2", "f")
    params = p.init_params(seed=3)
    fig = plotting.visualize_pdf(p, params, samplesize=500,
                                 s2_norm="mollweide")
    fig.savefig(tmp_path / "viz_mollweide.png")


def test_visualize_pdf_joint_with_sphere(tmp_path):
    """visualize_pdf must handle joint PDFs containing an s2 block
    (sample-based marginal panel)."""
    from jammy_flows_tpu.utils import plotting
    p = pdf("e1+s2", "g+f")
    params = p.init_params(seed=2)
    fig = plotting.visualize_pdf(p, params, samplesize=1500)
    fig.savefig(tmp_path / "joint_s2.png")


def test_corner_plot_e2s2_with_contours(tmp_path):
    """Reference-style corner grid on e2+s2: pairwise hist2d panels with
    labelled HPD sample contours, true-value markers, var_names
    (plotting/general.py:276-640 parity)."""
    import matplotlib.pyplot as plt
    from jammy_flows_tpu.utils import plotting
    p = pdf("e2+s2", "gg+f")
    params = p.init_params(seed=4)
    tv = np.array([0.0, 0.0, 1.2, 3.0])
    fig = plotting.visualize_pdf(
        p, params, samplesize=4000, true_values=tv,
        var_names=["x", "y", "theta", "phi"], show_relative_std=1)
    # 4x4 corner: 4 diagonal + 6 lower-triangle panels
    assert len(fig.get_axes()) >= 10
    out = tmp_path / "corner_e2s2.png"
    fig.savefig(out)
    assert out.exists() and out.stat().st_size > 5000
    plt.close(fig)

    # lambert-transformed s2 columns + plot_only_contours variant
    fig2 = plotting.visualize_pdf(
        p, params, samplesize=4000, s2_norm="lambert",
        plot_only_contours=True, true_values=tv)
    fig2.savefig(tmp_path / "corner_lambert.png")
    plt.close(fig2)


def test_corner_plot_conditional_batch_multiplot(tmp_path):
    """Batched conditional input with multiplot=True: one corner grid per
    batch item."""
    import matplotlib.pyplot as plt
    from jammy_flows_tpu.utils import plotting
    p = pdf("e1+s2", "g+f", conditional_input_dim=2)
    params = p.init_params(seed=5)
    ci = jnp.asarray(np.random.default_rng(0).normal(size=(2, 2)))
    tvs = np.array([[0.0, 1.0, 3.0], [0.5, 2.0, 1.0]])
    fig = plotting.visualize_pdf(p, params, conditional_input=ci,
                                 samplesize=1200, multiplot=True,
                                 true_values=tvs,
                                 var_names=["x", "theta", "phi"])
    # two 3x3 corner grids -> 2 * 6 panels
    assert len(fig.get_axes()) >= 12
    fig.savefig(tmp_path / "multiplot.png")
    plt.close(fig)


def test_plot_joint_pdf_density_2d_integral(tmp_path):
    """dim-2 single panel with density image + labelled HPD contours; the
    density-grid integral must be ~1."""
    import matplotlib.pyplot as plt
    from jammy_flows_tpu.utils import plotting
    p = pdf("e2", "gg")
    params = p.init_params(seed=6)
    fig = plotting.visualize_pdf(p, params, samplesize=3000, npts=60,
                                 true_values=np.array([0.0, 0.0]))
    assert abs(fig._jammy_total_pdf_integral - 1.0) < 0.05
    fig.savefig(tmp_path / "density2d.png")
    plt.close(fig)
