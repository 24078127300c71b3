"""Letter-shaped conditional densities - the TPU analog of the reference's
flagship demo (examples/jammy_flows.py): sample 2-d points shaped like the
letters of a word, fit ONE conditional PDF p(x | one_hot(letter)), and
render the learned per-letter densities side by side.

Letters are rasterized with matplotlib's TextPath (no TTF file needed).
Run: python examples/letters.py [--word TPU] [--steps 600]
Writes examples/letters_fit.png.
"""
import argparse
import os
import sys

import numpy as np

import jax
import jax.numpy as jnp
import optax

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))
from jammy_flows_tpu import pdf  # noqa: E402
from jammy_flows_tpu.utils.plotting import plot_density_2d  # noqa: E402


def sample_letter(char, num_samples, rng, jitter=0.35):
    """Uniform samples from the filled glyph of `char`, normalized to
    roughly [-3, 3]^2 (rasterized via matplotlib TextPath)."""
    from matplotlib.textpath import TextPath
    from matplotlib.font_manager import FontProperties

    path = TextPath((0, 0), char, size=64,
                    prop=FontProperties(weight="bold"))
    (x0, y0), (x1, y1) = path.get_extents().min, path.get_extents().max
    # rasterize on a grid and rejection-sample interior cells
    nx = ny = 96
    xs = np.linspace(x0, x1, nx)
    ys = np.linspace(y0, y1, ny)
    gx, gy = np.meshgrid(xs, ys)
    pts = np.stack([gx.ravel(), gy.ravel()], axis=1)
    inside = path.contains_points(pts)
    cells = pts[inside]
    assert len(cells), f"no interior cells for {char!r}"
    idx = rng.integers(0, len(cells), num_samples)
    cell_w = (x1 - x0) / nx
    cell_h = (y1 - y0) / ny
    out = cells[idx] + rng.normal(0, jitter, (num_samples, 2)) * [cell_w, cell_h]
    # center and scale to ~[-3, 3]
    out -= [(x0 + x1) / 2.0, (y0 + y1) / 2.0]
    out *= 6.0 / max(x1 - x0, y1 - y0)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--word", default="TPU")
    ap.add_argument("--steps", type=int, default=600)
    ap.add_argument("--samples-per-letter", type=int, default=4000)
    ap.add_argument("--out", default=os.path.join(os.path.dirname(__file__),
                                                  "letters_fit.png"))
    args = ap.parse_args()

    rng = np.random.default_rng(0)
    letters = list(args.word)
    n_letters = len(letters)

    data, labels = [], []
    for i, ch in enumerate(letters):
        data.append(sample_letter(ch, args.samples_per_letter, rng))
        one_hot = np.zeros(n_letters)
        one_hot[i] = 1.0
        labels.append(np.tile(one_hot, (args.samples_per_letter, 1)))
    data = jnp.asarray(np.concatenate(data), jnp.float32)
    labels = jnp.asarray(np.concatenate(labels), jnp.float32)

    p = pdf("e2", "ggg", conditional_input_dim=n_letters,
            amortization_mlp_dims="64")
    params = p.init_params(seed=0, dtype=jnp.float32)

    opt = optax.adam(2e-3)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state, batch, cond):
        loss, grads = jax.value_and_grad(
            lambda pp: -p.log_prob(pp, batch,
                                   conditional_input=cond)[0].mean())(params)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    n = data.shape[0]
    perm_key = jax.random.PRNGKey(1)
    batch_size = 2048
    for it in range(args.steps):
        perm_key, k = jax.random.split(perm_key)
        idx = jax.random.randint(k, (batch_size,), 0, n)
        params, opt_state, loss = step(params, opt_state, data[idx], labels[idx])
        if it % 100 == 0:
            print(f"step {it}: NLL {float(loss):.3f}", flush=True)

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, axes = plt.subplots(1, n_letters, figsize=(4 * n_letters, 4))
    axes = np.atleast_1d(axes)
    for i, (ax, ch) in enumerate(zip(axes, letters)):
        one_hot = np.zeros((1, n_letters), np.float32)
        one_hot[0, i] = 1.0
        plot_density_2d(ax, p, params, ((-3.5, 3.5), (-3.5, 3.5)),
                        conditional_input=jnp.asarray(one_hot), npts=80)
        ax.set_title(f"p(x | '{ch}')")
    fig.tight_layout()
    fig.savefig(args.out, dpi=110)
    print("wrote", args.out)


if __name__ == "__main__":
    main()
