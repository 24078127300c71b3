"""Decompose flagship (e4+s2+e4 / gggg+f+gggg) sampling time at 1M rows.

Times each sub-pdf config alone with the same on-device scan-reps
methodology as bench.py, so the flagship total can be attributed to
its parts (two e4/gggg blocks, the s2/f layer, and residual glue).
"""
import os
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      "/tmp/jammy_flows_tpu_jaxcache")
import time
import jax
import jax.numpy as jnp
from jammy_flows_tpu import pdf

N = 1_000_000
REPS = 30


def bench_sample(p, params, label):
    @jax.jit
    def run(pp, key):
        keys = jax.random.split(key, REPS)
        acc, _ = jax.lax.scan(
            lambda c, k: (c + p.sample(pp, k, samplesize=N)[0].sum(), None),
            jnp.float32(0.0), keys)
        return acc

    float(run(params, jax.random.PRNGKey(0)))  # compile
    dt = None
    for t in range(3):
        t0 = time.time()
        float(run(params, jax.random.PRNGKey(1 + t)))
        el = time.time() - t0
        dt = el if dt is None else min(dt, el)
    ms = dt / REPS * 1e3
    print(f"{label:28s} {ms:8.2f} ms/1M   {N*REPS/dt/1e6:8.2f} M samples/s")
    return ms


def main():
    rows = []
    for mdims, flows, label in [
        ("e4+s2+e4", "gggg+f+gggg", "flagship"),
        ("e4", "gggg", "e4/gggg alone"),
        ("e4+e4", "gggg+gggg", "e4+e4 (2 blocks)"),
        ("s2", "f", "s2/f alone"),
        ("e4+s2", "gggg+f", "e4+s2"),
    ]:
        p = pdf(mdims, flows)
        params = p.init_params(seed=0, dtype=jnp.float32)
        rows.append((label, bench_sample(p, params, label)))
    total = dict(rows)["flagship"]
    parts = dict(rows)
    est = parts["e4+e4 (2 blocks)"] + parts["s2/f alone"]
    print(f"\nflagship {total:.2f} ms vs e4+e4 + s2/f = {est:.2f} ms "
          f"-> glue/interaction {total-est:+.2f} ms")


if __name__ == "__main__":
    main()
