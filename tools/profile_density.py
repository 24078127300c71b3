"""Decompose flagship NLL value+grad (training direction) wall time.

Times (on-device scan, scalar sync) a full Adam step on a 262144-row
conditional batch for nested prefixes of the flagship config and for
ablations that isolate the rotation / MLP / f-layer costs.  Marginal
differences localize the XLA-glue share of the density+backward direction
(BASELINE.md item 9: log_prob is ~75% XLA glue).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/profile_density.py
"""
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      "/tmp/jammy_flows_tpu_jaxcache")
import jax
import jax.numpy as jnp
import optax

from jammy_flows_tpu import pdf

B = 262144
REPS = 80

CONFIGS = [
    ("e4", "gggg", None, "permanent gggg"),
    ("e4", "gggg", {"g": {"rotation_mode": "none"}}, "permanent, no rotation"),
    ("e4", "g", None, "permanent single g"),
    ("e4+e4", "gggg+gggg", None, "adds amortized gggg + MLP"),
    ("e4+s2", "gggg+f", None, "adds f + MLP"),
    ("e4+s2+e4", "gggg+f+gggg", None, "flagship"),
]


def time_step(p, params, cond_dim=3):
    opt = optax.adam(1e-3)

    x = jnp.zeros((B, p.total_target_dim), jnp.float32)
    for k, d in enumerate(p.pdf_defs_list):
        if d == "s2":
            lo, hi = p.target_dim_indices[k]
            x = x.at[:, lo].set(1.0).at[:, lo + 1].set(1.0)
    ci = jnp.ones((B, cond_dim), jnp.float32)

    def body(carry, eps):
        params, opt_state = carry
        xx = x + eps  # defeat loop-invariant hoisting

        def loss(pp):
            return -p.log_prob(pp, xx, conditional_input=ci)[0].mean()

        l, g = jax.value_and_grad(loss)(params)
        u, opt_state = opt.update(g, opt_state)
        return (optax.apply_updates(params, u), opt_state), l

    @jax.jit
    def run(params, key):
        eps = 1e-6 * jax.random.normal(key, (REPS, 1, 1), jnp.float32)
        (params, _), ls = jax.lax.scan(body, (params, opt.init(params)), eps)
        return ls.sum()

    float(run(params, jax.random.PRNGKey(0)))
    t0 = time.time()
    float(run(params, jax.random.PRNGKey(1)))
    dt = (time.time() - t0) / REPS
    return dt * 1e3, B / dt / 1e6


def main():
    results = {}
    for pdefs, fdefs, opts, label in CONFIGS:
        p = pdf(pdefs, fdefs, conditional_input_dim=3,
                options_overwrite=opts or {})
        params = p.init_params(seed=0, dtype=jnp.float32)
        ms, meps = time_step(p, params)
        results[label] = ms
        print(f"{pdefs:10s} {fdefs:14s} [{label:24s}] {ms:8.2f} ms/step "
              f"({meps:.2f}M evals/s)", flush=True)

    def marg(a, b, what):
        if a in results and b in results:
            print(f"marginal {what}: {results[a] - results[b]:.2f} ms")

    marg("permanent gggg", "permanent, no rotation", "rotation x4 (fwd+bwd)")
    marg("adds amortized gggg + MLP", "permanent gggg", "amortized gggg block")
    marg("adds f + MLP", "permanent gggg", "f block + MLP")
    marg("flagship", "adds f + MLP", "2nd (amortized) gggg block")


if __name__ == "__main__":
    main()
