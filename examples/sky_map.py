"""Full-sky workflow: fit an S2 density, render it (Mollweide + zoom),
report Kent-fit moments, and export a healpy-compatible map.

Exercises the round-2 diagnostics surface end to end:
multiresolution scan -> plot_sphere_mollweide / plot_sphere_zoom,
marginal_moments(calc_zlp_kent_fit=True), utils.healpix export.

Run: PYTHONPATH=/root/repo python examples/sky_map.py
"""
import os

if __name__ == "__main__" and "JAX_PLATFORMS" not in os.environ:
    os.environ["JAX_PLATFORMS"] = "cpu"

import numpy as np
import jax
import jax.numpy as jnp

from jammy_flows_tpu import pdf, train
from jammy_flows_tpu.utils import plotting, healpix, grid


def make_sky_data(n=4000, seed=0):
    """Two unequal vMF blobs on the sphere."""
    rng = np.random.default_rng(seed)
    mus = np.array([[0.3, 0.2, 0.93], [-0.6, 0.6, -0.52]])
    mus /= np.linalg.norm(mus, axis=1, keepdims=True)
    kappas = [40.0, 12.0]
    pts = []
    for mu, kappa, m in zip(mus, kappas, [int(0.7 * n), n - int(0.7 * n)]):
        v = mu + rng.normal(0, 1.0 / np.sqrt(kappa), (m, 3))
        v /= np.linalg.norm(v, axis=1, keepdims=True)
        pts.append(v)
    v = np.concatenate(pts)
    theta = np.arccos(np.clip(v[:, 2], -1, 1))
    phi = np.mod(np.arctan2(v[:, 1], v[:, 0]), 2 * np.pi)
    return np.stack([theta, phi], 1)


def main():
    jax.config.update("jax_platforms", "cpu")
    data = make_sky_data()

    p = pdf("s2", "fff", options_overwrite={"f": {
        "add_vertical_rq_spline_flow": 1, "vertical_smooth": 1,
        "spline_num_basis_functions": -1,
        "vertical_fix_boundary_derivative": 1}})
    params = p.init_params(seed=0, dtype=jnp.float32)
    params, hist = train.fit(p, params, data.astype(np.float32),
                             num_steps=400, learning_rate=5e-3,
                             clip_norm=10.0)
    print(f"NLL {hist[0]:.3f} -> {hist[-1]:.3f}")

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, axes = plt.subplots(1, 2, figsize=(13, 4.5),
                             gridspec_kw={"width_ratios": [2, 1]})
    total = plotting.plot_sphere_mollweide(axes[0], p, params, n_base=1024,
                                           rounds=3)
    axes[0].set_title(f"full sky (integral {total:.3f})")
    mm = p.marginal_moments(params, jax.random.PRNGKey(1), samplesize=3000,
                            calc_zlp_kent_fit=True)
    center = mm["mean_0_angles"][0]
    w = plotting.plot_sphere_zoom(axes[1], p, params, center=center,
                                  zoom_radius_deg=35.0)
    axes[1].set_title(f"zoom at mode ({w:.2f} of the mass)")
    fig.savefig(os.path.join(os.path.dirname(__file__), "sky_map.png"),
                dpi=110, bbox_inches="tight")
    print("Kent fit:", {k: np.round(np.asarray(v), 3).tolist()
                        for k, v in mm["zlp_kent_pars_0"].items()
                        if k in ("kappa", "u")})

    # healpy interop: RING map consumable by hp.mollview on the user's side
    m = healpix.export_healpix_map(p, params, nside=32)
    print(f"healpix map nside=32: {m.shape[0]} pixels, "
          f"integral {m.sum() * healpix.pixel_area(32):.4f}")
    np.save(os.path.join(os.path.dirname(__file__), "sky_map_healpix.npy"), m)

    # multires scan rebinned into the same pixelization
    pts, lp, areas = grid.multires_s2_scan(p, params, n_base=1024, rounds=3)
    m2 = healpix.scan_to_healpix(pts, lp, areas, nside=32)
    print(f"scan-rebinned map integral "
          f"{m2.sum() * healpix.pixel_area(32):.4f}")


if __name__ == "__main__":
    main()
