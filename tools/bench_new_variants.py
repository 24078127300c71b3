"""On-chip kernel-vs-XLA-row-path speedups for the round-5 eligibility
extension (skewness + inormal_partly_crude / inormal_full_pade).

Methodology: BASELINE.md honest-dispatch rules — reps>=20 scanned
on-device in ONE dispatch, gradient consumed inside the scan (SGD update
feeding the next iteration) so XLA cannot DCE the backward, min-of-3
trials, scalar-reduction host sync.  Run on an otherwise idle host.
"""
import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

import jammy_flows_tpu.ops.pallas_gf as pg
from jammy_flows_tpu import pdf


def _sync(x):
    return float(jnp.sum(x))


def bench_train(p, params, x, ci, reps):
    def loss(pp):
        return -p.log_prob(pp, x, conditional_input=ci)[0].mean()

    @jax.jit
    def run(params):
        def body(carry, _):
            pp = carry
            l, g = jax.value_and_grad(loss)(pp)
            pp = jax.tree.map(lambda a, b: a - 1e-6 * b, pp, g)
            return pp, l
        pp, ls = jax.lax.scan(body, params, None, length=reps)
        return ls.sum() + sum(jnp.sum(v) for v in jax.tree.leaves(pp))

    _sync(run(params))
    best = np.inf
    for _ in range(3):
        t0 = time.perf_counter()
        _sync(run(params))
        best = min(best, (time.perf_counter() - t0) / reps)
    return best


def bench_sample(p, params, n, ci, reps):
    @jax.jit
    def run(key):
        def body(k, _):
            k, sub = jax.random.split(k)
            xs, _, lp, _ = p.sample(params, sub, samplesize=n,
                                    conditional_input=ci,
                                    dtype=jnp.float32)
            return k, jnp.sum(xs) + jnp.sum(lp)
        k, outs = jax.lax.scan(body, key, None, length=reps)
        return outs.sum()

    key = jax.random.PRNGKey(0)
    _sync(run(key))
    best = np.inf
    for _ in range(3):
        t0 = time.perf_counter()
        _sync(run(key))
        best = min(best, (time.perf_counter() - t0) / reps)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=262144)
    ap.add_argument("--reps", type=int, default=20)
    args = ap.parse_args()

    configs = [
        ("crude", {"g": {"inverse_function_type": "inormal_partly_crude"}}),
        ("full_pade", {"g": {"inverse_function_type": "inormal_full_pade"}}),
        ("skew_isigmoid", {"g": {"add_skewness": 1}}),
        ("skew_precise", {"g": {"add_skewness": 1,
                                "inverse_function_type":
                                    "inormal_partly_precise"}}),
    ]
    B = args.batch
    out = {}
    for tag, opts in configs:
        p = pdf("e4", "gggg", options_overwrite=opts,
                conditional_input_dim=2)
        params = p.init_params(seed=0, dtype=jnp.float32)
        rng = np.random.default_rng(0)
        x = jnp.asarray(0.6 * rng.normal(size=(B, 4)), jnp.float32)
        ci = jnp.asarray(rng.normal(size=(B, 2)), jnp.float32)

        res = {}
        for mode in ("kernel", "xla"):
            if mode == "xla":
                orig = pg.pallas_available
                pg.pallas_available = lambda: False
            try:
                jax.clear_caches()
                res[mode] = {
                    "train_ms": bench_train(p, params, x, ci, args.reps) * 1e3,
                    "sample_ms": bench_sample(p, params, B, ci,
                                              args.reps) * 1e3,
                }
            finally:
                if mode == "xla":
                    pg.pallas_available = orig
        out[tag] = {
            **{f"{m}_{k}": round(v, 3) for m in res for k, v in
               res[m].items()},
            "train_speedup": round(res["xla"]["train_ms"]
                                   / res["kernel"]["train_ms"], 2),
            "sample_speedup": round(res["xla"]["sample_ms"]
                                    / res["kernel"]["sample_ms"], 2),
        }
        print(tag, json.dumps(out[tag]))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
