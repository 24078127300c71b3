"""Benchmark the PRODUCTION S2 recipe on-chip (BASELINE.md).

Configs (reference docs/source/usage/suggested_settings.rst:17-77,
reproduced in docs/suggested_settings.md):
  * pdf("s2", "f"*15) with vertical+circular smooth splines — the recipe
    real workloads use;
  * the flagship joint with the production "f" options.

Measures sampling and conditional NLL value+grad throughput with the same
on-device-scan scalar-sync methodology as bench.py.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/bench_production.py
"""
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      "/tmp/jammy_flows_tpu_jaxcache")
import jax
import jax.numpy as jnp
import optax

from jammy_flows_tpu import pdf

PRODUCTION_F = {"f": {
    "add_vertical_rq_spline_flow": 1,
    "add_circular_rq_spline_flow": 1,
    "spline_num_basis_functions": -1,
    "vertical_smooth": 1,
    "vertical_flow_defs": "rr",
    "circular_flow_defs": "oo",
    "vertical_fix_boundary_derivative": 1,
    "vertical_fix_first_width_n_height_to_zero": 1,
    "vertical_also_fix_second_width_to_zero": 1,
    "vertical_independent_width_height_parametrization": 1,
    "circular_add_rotation": 0,
    "kappa_prediction": "direct_log_real_bounded",
    "rotation_mode": "householder",
}}


def time_sampling(p, params, n, reps=80, cond_dim=None):
    """reps must amortize the ~30 ms fixed per-DISPATCH axon-tunnel sync
    (measured 2026-08-20: an empty 10-rep scan reads 3.2 ms/rep, a 640-rep
    one 0.05 ms/rep — the cost is per dispatch, NOT per scan iteration).
    At reps=80 the dispatch adds <2% to ms-level steps.  Min of 3 trials."""
    ci = None if cond_dim is None else jnp.ones((n, cond_dim), jnp.float32)

    @jax.jit
    def run(pp, key):
        keys = jax.random.split(key, reps)
        acc, _ = jax.lax.scan(
            lambda c, k: (c + p.sample(pp, k, samplesize=n,
                                       conditional_input=ci)[0].sum(), None),
            jnp.float32(0.0), keys)
        return acc

    assert jnp.isfinite(jnp.asarray(float(run(params, jax.random.PRNGKey(0)))))
    best = None
    for t in range(3):
        t0 = time.time()
        float(run(params, jax.random.PRNGKey(1 + t)))
        el = time.time() - t0
        best = el if best is None else min(best, el)
    return reps * n / best


def time_train(p, params, batch, cond_dim=None, reps=80):
    opt = optax.adam(1e-3)
    x = jnp.zeros((batch, p.total_target_dim), jnp.float32)
    for k, d in enumerate(p.pdf_defs_list):
        if d == "s2":
            lo, hi = p.target_dim_indices[k]
            x = x.at[:, lo].set(1.0).at[:, lo + 1].set(1.0)
    ci = None if cond_dim is None else jnp.ones((batch, cond_dim), jnp.float32)

    def body(carry, eps):
        params, opt_state = carry
        # the production training objective (train.py uses the same call):
        # fused value+grad for eligible gggg blocks, plain AD otherwise —
        # pinned equal to value_and_grad of -log_prob().mean() by
        # tests/test_pallas_interpret.py
        l, g = p.nll_value_and_grad(params, x + eps, conditional_input=ci)
        u, opt_state = opt.update(g, opt_state)
        return (optax.apply_updates(params, u), opt_state), l

    @jax.jit
    def run(params, key):
        eps = 1e-6 * jax.random.normal(key, (reps, 1, 1), jnp.float32)
        (params, _), ls = jax.lax.scan(body, (params, opt.init(params)), eps)
        return ls.sum()

    assert jnp.isfinite(jnp.asarray(float(run(params, jax.random.PRNGKey(0)))))
    best = None
    for t in range(3):
        t0 = time.time()
        float(run(params, jax.random.PRNGKey(1 + t)))
        el = time.time() - t0
        best = el if best is None else min(best, el)
    return reps * batch / best


def main():
    import json
    import pathlib
    n = 262144
    print("[production s2] pdf('s2', 'f'*15, nested smooth splines)")
    p = pdf("s2", "f" * 15, options_overwrite=PRODUCTION_F)
    params = p.init_params(seed=0, dtype=jnp.float32)
    t0 = time.time()
    sps = time_sampling(p, params, n)
    print(f"  sampling: {sps:,.0f} samples/s  (bench wall {time.time()-t0:.0f}s)",
          flush=True)
    tps = time_train(p, params, n, cond_dim=None)
    print(f"  NLL value+grad (Adam step, {n} batch): {tps:,.0f} evals/s",
          flush=True)

    print("[flagship + production f] pdf('e4+s2+e4','gggg+f+gggg', prod f)")
    p2 = pdf("e4+s2+e4", "gggg+f+gggg", conditional_input_dim=3,
             options_overwrite=PRODUCTION_F)
    params2 = p2.init_params(seed=0, dtype=jnp.float32)
    sps2 = time_sampling(p2, params2, n, cond_dim=3)
    print(f"  sampling: {sps2:,.0f} samples/s", flush=True)
    tps2 = time_train(p2, params2, n, cond_dim=3)
    print(f"  conditional NLL value+grad: {tps2:,.0f} evals/s", flush=True)

    # batch scaling: the production step keeps gaining past 262k
    tps_2m = time_train(p, params, 8 * n, cond_dim=None, reps=40)
    print(f"  NLL value+grad (2M batch): {tps_2m:,.0f} evals/s", flush=True)
    tps2_1m = time_train(p2, params2, 4 * n, cond_dim=3, reps=20)
    print(f"  flagship conditional NLL (1M batch): {tps2_1m:,.0f} evals/s",
          flush=True)

    # record for bench.py's "production" extra field (driver round bench)
    out = {
        "s2_f15_samples_per_s": round(sps, 1),
        "s2_f15_nll_evals_per_s": round(tps, 1),
        "flagship_prodf_samples_per_s": round(sps2, 1),
        "flagship_prodf_nll_evals_per_s": round(tps2, 1),
        "s2_f15_nll_evals_per_s_2m_batch": round(tps_2m, 1),
        "flagship_prodf_nll_evals_per_s_1m_batch": round(tps2_1m, 1),
    }
    path = pathlib.Path(__file__).resolve().parent.parent / \
        "BENCH_PRODUCTION.json"
    path.write_text(json.dumps(out, indent=1))
    print("wrote", path)


if __name__ == "__main__":
    main()
