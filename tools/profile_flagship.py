"""Decompose flagship sampling wall time by sub-manifold block.

Times (on-device scan, scalar-reduction sync, see bench.py) 1M-sample
sampling for nested prefixes of the flagship config: e4, e4+s2, e4+s2+e4.
Marginal differences give the per-block cost including its amortization MLP.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/profile_flagship.py
"""
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      "/tmp/jammy_flows_tpu_jaxcache")
import jax
import jax.numpy as jnp

from jammy_flows_tpu import pdf

N = 1_000_000
REPS = 80

CONFIGS = [
    ("e4", "gggg"),
    ("e4+s2", "gggg+f"),
    ("e4+s2+e4", "gggg+f+gggg"),
    ("s2", "f"),
    ("e4+e4", "gggg+gggg"),
]


def time_sample(p, params):
    def body(c, k):
        return c + p.sample(params, k, samplesize=N)[0].sum(), None

    @jax.jit
    def run(pp, key):
        keys = jax.random.split(key, REPS)
        acc, _ = jax.lax.scan(body, jnp.float32(0.0), keys)
        return acc

    float(run(params, jax.random.PRNGKey(0)))   # compile
    t0 = time.time()
    float(run(params, jax.random.PRNGKey(1)))
    return (time.time() - t0) / REPS * 1e3      # ms per 1M


def main():
    results = {}
    for pdefs, fdefs in CONFIGS:
        p = pdf(pdefs, fdefs)
        params = p.init_params(seed=0, dtype=jnp.float32)
        ms = time_sample(p, params)
        results[pdefs] = ms
        print(f"{pdefs:12s} {fdefs:16s} {ms:8.2f} ms/1M "
              f"({N / ms * 1e3 / 1e6:.2f}M samples/s)", flush=True)

    if "e4+s2" in results and "e4" in results:
        print(f"marginal s2(f)+MLP block: "
              f"{results['e4+s2'] - results['e4']:.2f} ms/1M")
    if "e4+s2+e4" in results and "e4+s2" in results:
        print(f"marginal 2nd e4(gggg)+MLP block: "
              f"{results['e4+s2+e4'] - results['e4+s2']:.2f} ms/1M")
    if "e4+e4" in results and "e4" in results:
        print(f"marginal amortized e4(gggg) block: "
              f"{results['e4+e4'] - results['e4']:.2f} ms/1M")


if __name__ == "__main__":
    main()
