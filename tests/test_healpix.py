"""Healpy-free HEALPix interop validation (utils/healpix.py).

No healpy oracle exists in this environment, so the RING pixelization is
validated structurally: roundtrip identity, analytic ring layout, and
Monte-Carlo equal-area uniformity.
"""
import numpy as np
import jax

from jammy_flows_tpu import pdf
from jammy_flows_tpu.utils import healpix as hpx
from jammy_flows_tpu.utils import grid as grid_utils


def test_pix2ang_ang2pix_roundtrip():
    """ang2pix(pix2ang(p)) == p for every pixel at several nside."""
    for nside in (1, 2, 4, 8, 16):
        theta, phi = hpx.pix2ang_ring(nside)
        back = hpx.ang2pix_ring(nside, theta, phi)
        np.testing.assert_array_equal(back, np.arange(hpx.npix(nside)),
                                      err_msg=f"nside={nside}")


def test_ring_structure():
    """Ring z-levels and per-ring pixel counts match the HEALPix layout."""
    nside = 4
    theta, phi = hpx.pix2ang_ring(nside)
    z = np.cos(theta)
    rings, counts = np.unique(np.round(z, 12), return_counts=True)
    assert len(rings) == 4 * nside - 1
    # cap rings have 4i pixels, equatorial rings 4*nside
    expect = []
    for i in range(1, nside):
        expect.append(4 * i)
    expect += [4 * nside] * (2 * nside + 1)
    for i in range(nside - 1, 0, -1):
        expect.append(4 * i)
    np.testing.assert_array_equal(np.sort(counts), np.sort(expect))
    # cap ring z: 1 - i^2/(3 nside^2); equatorial: 4/3 - 2i/(3 nside)
    assert np.isclose(z.max(), 1 - 1.0 / (3 * nside**2))
    assert np.isclose(np.abs(z).min(), 0.0, atol=1e-12)


def test_equal_area_uniformity():
    """Uniform sphere points land uniformly across pixels (equal area)."""
    rng = np.random.default_rng(0)
    n = 400000
    z = rng.uniform(-1, 1, n)
    phi = rng.uniform(0, 2 * np.pi, n)
    theta = np.arccos(z)
    for nside in (2, 8):
        pix = hpx.ang2pix_ring(nside, theta, phi)
        counts = np.bincount(pix, minlength=hpx.npix(nside))
        expected = n / hpx.npix(nside)
        # Poisson 5-sigma band
        assert (np.abs(counts - expected) < 5 * np.sqrt(expected)).all(), \
            (nside, counts.min(), counts.max(), expected)


def test_export_healpix_map_normalized():
    """A flow exported to a healpix map integrates to ~1."""
    p = pdf("s2", "f")
    params = p.init_params(seed=1)
    nside = 16
    m = hpx.export_healpix_map(p, params, nside)
    assert m.shape == (hpx.npix(nside),)
    total = m.sum() * hpx.pixel_area(nside)
    assert abs(total - 1.0) < 0.05, total


def test_scan_to_healpix_preserves_mass():
    """Rebinned multires scan keeps the total integral exactly."""
    p = pdf("s2", "f")
    params = p.init_params(seed=1)
    pts, lp, areas = grid_utils.multires_s2_scan(p, params, n_base=512,
                                                 rounds=2)
    scan_total = float(np.sum(np.exp(lp) * areas))
    m = hpx.scan_to_healpix(pts, lp, areas, nside=8)
    map_total = float(m.sum() * hpx.pixel_area(8))
    np.testing.assert_allclose(map_total, scan_total, rtol=1e-12)
    assert abs(map_total - 1.0) < 0.05
