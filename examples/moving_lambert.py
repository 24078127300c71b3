"""Rotated Lambert-projection visualization of an S2 flow.

TPU-native analog of reference examples/plot_moving_lambert_projection.py:
for a sweep of "true positions" on the sphere, render the PDF twice -
left: equal-area Lambert disk rotated so the true position sits at the
centre; right: the standard theta/phi map where the red marker moves.
Each panel title shows the numerical PDF integral (should be ~1).

Run: python examples/moving_lambert.py [-num_steps N]  — writes figs/zen_*.png.
CPU by default (set JAMMY_PLATFORM=axon for the TPU chip).
"""
import argparse
import os

os.environ["JAX_PLATFORMS"] = os.environ.get("JAMMY_PLATFORM", "cpu")

import numpy as np
import jax

jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt

from jammy_flows_tpu import pdf
from jammy_flows_tpu.utils import plotting


def main():
    parser = argparse.ArgumentParser("moving_lambert")
    parser.add_argument("-layer_def", type=str, default="f")
    parser.add_argument("-num_steps", type=int, default=5)
    parser.add_argument("-npts", type=int, default=50)
    args = parser.parse_args()

    p = pdf("s2", args.layer_def)
    params = p.init_params(seed=1)

    os.makedirs("figs", exist_ok=True)
    for ind in range(args.num_steps):
        true_zen = 0.001 + ind * (np.pi - 0.002) / args.num_steps
        true_azi = ind * 2 * np.pi / args.num_steps
        tv = np.array([true_zen, true_azi])

        fig, (ax_l, ax_s) = plt.subplots(1, 2, figsize=(9, 4))
        total = plotting.plot_sphere_lambert(
            ax_l, p, params, npts=args.npts, true_values=tv,
            rotate_to_true_value=True)
        ax_l.set_title(f"Lambert (rotated), integral {total:.3f}")

        plotting.plot_sphere_2d(ax_s, p, params, n_theta=args.npts,
                                n_phi=2 * args.npts)
        ax_s.scatter([true_azi], [true_zen], color="red", s=20, zorder=5)
        ax_s.set_title("standard zenith/azimuth")

        fig.tight_layout()
        fig.savefig(f"figs/zen_{true_zen:.3f}_azi_{true_azi:.3f}.png")
        plt.close(fig)
        print(f"step {ind}: integral={total:.4f}")


if __name__ == "__main__":
    main()
