"""One-time recorded equivalence run: our `h` (aliased to `g`) vs the torch
reference's DISTINCT `gf_block_old` implementation.

The repo aliases flow symbol `h` to the modern `g` Gaussianization-flow
implementation (registry.py).  This script grounds the alias against the
torch `gf_block_old` itself (gaussianization_flow_old.py): the reference pdf
is built with symbol "h", its exact parameter vector is copied into our
`g`-aliased flow, and log_prob values + parameter gradients are compared
pointwise in float64.

Finding (recorded 2026-08-19, see BASELINE.md): at equal parameters the
torch `h` and torch `g` implementations produce IDENTICAL log-probs (<=6e-15)
but their parameter GRADIENTS differ by ~6e-3 relnorm whenever
fit_normalization=1 (the default) — the old block parametrizes the fitted
per-kernel normalization differently as a function of its parameters, the
two coinciding in value at the shared init point.  The reference's own
equivalence test never catches this because its gradient check compares
grad_old against itself (tests/test_old_new_gaussianization_flow.py:124).
Criterion here, therefore: our `h` must match torch-`h` VALUES (<=1e-7) and
torch-`g` GRADIENTS (<=1e-7); the known torch-internal h-vs-g gradient gap
is printed for the record.

Run: PYTHONPATH=/root/repo python tools/h_equivalence_check.py
"""
import os
import sys

import numpy as np

sys.path.insert(0, "/root/reference")
os.environ["JAX_PLATFORMS"] = "cpu"

import torch                                   # noqa: E402
import jammy_flows                             # noqa: E402  (the reference)

import jax                                     # noqa: E402
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp                        # noqa: E402
from jammy_flows_tpu import pdf as jpdf        # noqa: E402


def _flat_params(p_ref):
    return np.concatenate([q.detach().numpy().ravel()
                           for q in p_ref.layer_list[0].parameters()])


def _flat_grad(p_ref, x):
    lp, _, _ = p_ref(torch.from_numpy(x))
    grads = torch.autograd.grad(
        lp.sum(), list(p_ref.layer_list[0].parameters()), allow_unused=True)
    return np.concatenate([g.detach().numpy().ravel()
                           for g in grads if g is not None])


def run_case(dim, opts, n=400):
    torch.manual_seed(7)
    p_h = jammy_flows.pdf(f"e{dim}", "hh", options_overwrite={"h": dict(opts)})
    p_h.double()
    torch.manual_seed(7)
    p_g = jammy_flows.pdf(f"e{dim}", "gg", options_overwrite={"g": dict(opts)})
    p_g.double()
    vec = _flat_params(p_h)
    assert np.abs(vec - _flat_params(p_g)).max() == 0.0, \
        "torch h/g parameter packing diverged"

    p = jpdf(f"e{dim}", "gg", options_overwrite={"g": dict(opts)})
    params = dict(p.init_params(seed=0))
    assert vec.size == np.asarray(params["flow_0"]).size, \
        (vec.size, np.asarray(params["flow_0"]).size)
    params["flow_0"] = jnp.asarray(vec)

    rng = np.random.default_rng(0)
    x = rng.normal(0, 1.5, (n, dim))

    lp_h, _, _ = p_h(torch.from_numpy(x))
    lp_h = lp_h.detach().numpy()
    lp_our = np.asarray(p.log_prob(params, jnp.asarray(x))[0])
    dlp = np.abs(lp_h - lp_our).max()

    g_h = _flat_grad(p_h, x)
    g_g = _flat_grad(p_g, x)
    g_our = np.asarray(jax.grad(
        lambda pp: p.log_prob(pp, jnp.asarray(x))[0].sum())(params)["flow_0"])
    rel_g = np.linalg.norm(g_g - g_our) / np.linalg.norm(g_g)
    rel_hg = np.linalg.norm(g_h - g_g) / np.linalg.norm(g_g)
    ok = dlp < 1e-7 and rel_g < 1e-7
    print(f"e{dim}/hh opts={opts}: max|dlogp| vs torch-h {dlp:.3e}  "
          f"grad relnorm vs torch-g {rel_g:.3e}  "
          f"[torch-internal h-vs-g grad gap {rel_hg:.3e}]  "
          f"({'PASS' if ok else 'FAIL'})")
    return ok


def main():
    ok = True
    for opts in [
        {},
        {"regulate_normalization": 1},
        {"regulate_normalization": 1, "add_skewness": 1},
        {"fit_normalization": 0},
        {"softplus_for_width": 1},
    ]:
        for dim in (1, 3):
            ok &= run_case(dim, opts)
    print("h-equivalence:", "ALL PASS" if ok else "FAILURES")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
