"""Build (and optionally execute) examples/examples.ipynb — the TPU-native
analog of the reference examples/examples.ipynb walkthrough."""
import sys

import nbformat as nbf


def md(s):
    return nbf.v4.new_markdown_cell(s)


def code(s):
    return nbf.v4.new_code_cell(s)


nb = nbf.v4.new_notebook()
nb.metadata["kernelspec"] = {"name": "python3", "display_name": "Python 3",
                             "language": "python"}

nb.cells = [
    md("# jammy_flows_tpu — constructing PDFs over manifolds\n"
       "TPU-native analog of the reference `examples/examples.ipynb`: "
       "joint (conditional) normalizing-flow PDFs over products of "
       "Euclidean spaces, spheres, intervals and simplices, built from a "
       "two-string DSL. Densities are pure functions of a parameter "
       "pytree; everything runs jitted."),
    code("import os\n"
         "os.environ['JAX_PLATFORMS'] = os.environ.get('JAMMY_PLATFORM', "
         "'cpu')\n"
         "import numpy as np\n"
         "import jax, jax.numpy as jnp\n"
         "jax.config.update('jax_platforms', os.environ['JAX_PLATFORMS'])\n"
         "import matplotlib\n"
         "matplotlib.use('Agg')\n"
         "import matplotlib.pyplot as plt\n"
         "from jammy_flows_tpu import pdf\n"
         "from jammy_flows_tpu.utils import plotting"),
    md("### 2-d Euclidean PDF (`\"e2\"`) with two Gaussianization-flow "
       "layers (`\"gg\"`)\n"
       "`init_params` returns the trainable pytree; `visualize_pdf` draws "
       "samples and exact density contours."),
    code("p_e2 = pdf('e2', 'gg')\n"
         "params_e2 = p_e2.init_params(seed=0)\n"
         "fig = plotting.visualize_pdf(p_e2, params_e2, samplesize=8000, "
         "npts=60)\n"
         "fig.savefig('_nb_e2.png', dpi=60); plt.close(fig)\n"
         "print('log_prob at origin:', float(p_e2.log_prob(params_e2, "
         "jnp.zeros((1, 2)))[0][0]))"),
    md("### 2-sphere PDF in zenith/azimuth — *intrinsic* coordinates\n"
       "The `f` symbol is the autoregressive vMF+spline S2 flow "
       "(the reference notebook's old `n`)."),
    code("p_s2 = pdf('s2', 'ff')\n"
         "params_s2 = p_s2.init_params(seed=1)\n"
         "fig, ax = plt.subplots(figsize=(7, 4))\n"
         "plotting.plot_sphere_2d(ax, p_s2, params_s2)\n"
         "fig.savefig('_nb_s2.png', dpi=60); plt.close(fig)"),
    md("### The same PDF in an equal-area Lambert projection\n"
       "`rotate_to_true_value` recenters the disk on a point of interest; "
       "the returned integral should be ~1."),
    code("fig, ax = plt.subplots(figsize=(5, 5))\n"
         "total = plotting.plot_sphere_lambert(ax, p_s2, params_s2, "
         "npts=50,\n"
         "    true_values=np.array([0.8, 2.0]), rotate_to_true_value=True)\n"
         "print('disk integral:', round(total, 4))\n"
         "fig.savefig('_nb_lambert.png', dpi=60); plt.close(fig)"),
    md("### Multiresolution equal-area scan (healpy-free)\n"
       "Adaptive cos-θ×φ refinement of high-mass cells; the masses sum "
       "to the total probability."),
    code("from jammy_flows_tpu.utils.grid import multires_s2_scan\n"
         "pts, lp, areas = multires_s2_scan(p_s2, params_s2, n_base=512, "
         "rounds=2)\n"
         "print('cells:', len(pts), ' total mass:', "
         "float((np.exp(lp) * areas).sum()).__round__(4))"),
    md("### 5-d conditional PDF over `s1+s2+e2`\n"
       "One MLP per later sub-manifold maps `[conditional_input, "
       "embeddings of previous samples]` to that block's flow parameters "
       "(autoregressive amortization)."),
    code("p_joint = pdf('s1+s2+e2', 'm+f+gg', conditional_input_dim=2)\n"
         "params_j = p_joint.init_params(seed=2)\n"
         "ci = jnp.asarray(np.random.default_rng(0).normal(0, 1, (4, 2)), "
         "jnp.float32)\n"
         "x, base, lp, lpb = jax.jit(lambda pp, k: p_joint.sample(pp, k, "
         "conditional_input=ci))(params_j, jax.random.PRNGKey(0))\n"
         "print('sample shape', x.shape, ' log-probs', "
         "np.asarray(lp).round(3))"),
    md("### Corner plot of a joint PDF\n"
       "`visualize_pdf` renders joint PDFs as a corner grid: pairwise "
       "2-d sample panels with labelled HPD contours (68/95%), diagonal "
       "1-d marginals, true-value markers and `var_names` "
       "(reference `plot_joint_pdf` parity)."),
    code("fig = plotting.visualize_pdf(\n"
         "    p_joint, params_j, conditional_input=ci[:1],\n"
         "    samplesize=4000, true_values=np.array([3.0, 1.2, 3.0, 0., "
         "0.]),\n"
         "    var_names=['angle', 'theta', 'phi', 'x', 'y'])\n"
         "fig.savefig('_nb_corner.png', dpi=60)\n"
         "fig"),
    md("### 1-d conditional PDF on the interval [-5.5, 10.0]\n"
       "Interval boundaries are part of the DSL token; the `r` symbol is "
       "the rational-quadratic spline flow."),
    code("p_int = pdf('i1_-5.5_10.0', 'r', conditional_input_dim=2)\n"
         "params_i = p_int.init_params(seed=3)\n"
         "xs = jnp.linspace(-5.4, 9.9, 7)[:, None]\n"
         "ci1 = jnp.ones((7, 2), jnp.float32)\n"
         "lp, _, _ = p_int.log_prob(params_i, xs, conditional_input=ci1)\n"
         "print('interval log-probs:', np.asarray(lp).round(3))"),
    md("### Full-sky Mollweide view + healpix export\n"
       "The adaptive multiresolution scan renders as an equal-area "
       "Mollweide full-sky map with HPD contours; `utils.healpix` exports "
       "healpy-compatible RING maps without a healpy dependency."),
    code("from jammy_flows_tpu.utils import healpix\n"
         "fig, ax = plt.subplots(figsize=(9, 4.5))\n"
         "total = plotting.plot_sphere_mollweide(ax, p_s2, params_s2, "
         "n_base=512, rounds=2)\n"
         "print(f'scan integral {total:.4f}')\n"
         "m = healpix.export_healpix_map(p_s2, params_s2, nside=16)\n"
         "print(f'healpix map: {m.shape[0]} pixels, integral "
         "{m.sum() * healpix.pixel_area(16):.4f}')\n"
         "fig"),
    md("### Training\n"
       "Training is plain optax on `-log_prob(...).mean()` — see "
       "`examples/two_moons.py`, `examples/conditional_sphere.py` and "
       "`docs/training.md`. Diagnostics (`entropy`, `marginal_moments`, "
       "`approximate_coverage`) and the inference engine (HMC/NUTS, SMC, "
       "VI in `jammy_flows_tpu.inference`) operate on the same pure "
       "`log_prob`/`sample` functions."),
]

path = "examples/examples.ipynb"
nbf.write(nb, path)
print("wrote", path)

if "--execute" in sys.argv:
    import nbclient
    nb = nbf.read(path, as_version=4)
    client = nbclient.NotebookClient(nb, timeout=1200,
                                     kernel_name="python3")
    client.execute()
    nbf.write(nb, path)
    print("executed", path)
