"""Benchmark: samples/s/chip on the flagship e4+s2+e4 joint PDF.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline: the PyTorch reference (thoglu/jammy_flows @ /root/reference) on the
same config ``pdf("e4+s2+e4", "gggg+f+gggg")`` measures 399.8 samples/s
(float64, CPU, 8 torch threads; measured 2026-08-17 with
tests-style `pdf.sample(samplesize=10000)` loops - see BASELINE.md).
"""
import json
import sys
import time

REFERENCE_SAMPLES_PER_S = 399.8


def main():
    import os
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                          "/tmp/jammy_flows_tpu_jaxcache")
    import jax
    import jax.numpy as jnp
    from jammy_flows_tpu import pdf

    p = pdf("e4+s2+e4", "gggg+f+gggg")
    params = p.init_params(seed=0, dtype=jnp.float32)

    n = 1_000_000
    # reduce to a scalar inside jit; the FINAL host pull of the summed
    # scalars is a genuine end-to-end sync (block_until_ready is unreliable
    # over the axon tunnel).  Reps are dispatched asynchronously so the
    # device pipeline stays full (sustained throughput).
    sample_fn = jax.jit(
        lambda pp, k: p.sample(pp, k, samplesize=n)[0].sum())

    # warmup / compile
    float(sample_fn(params, jax.random.PRNGKey(0)))

    reps = 10
    t0 = time.time()
    outs = [sample_fn(params, jax.random.PRNGKey(i + 1)) for i in range(reps)]
    acc = float(sum(outs))
    dt = time.time() - t0
    samples_per_s = reps * n / dt

    assert jnp.isfinite(acc), "non-finite samples in benchmark"

    print(json.dumps({
        "metric": "samples/s/chip on e4+s2+e4 joint PDF (gggg+f+gggg)",
        "value": round(samples_per_s, 1),
        "unit": "samples/s",
        "vs_baseline": round(samples_per_s / REFERENCE_SAMPLES_PER_S, 2),
    }))


if __name__ == "__main__":
    sys.exit(main())
