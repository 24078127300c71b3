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
    reps = 60
    # One dispatch: scan the reps on-device with fresh keys and reduce to a
    # scalar; the final host pull of that scalar is a genuine end-to-end
    # sync (block_until_ready is unreliable over the axon tunnel, and
    # per-call dispatch costs ~80 ms of tunnel latency that has nothing to
    # do with the TPU - measured: e4/gggg 101 ms/1M dispatched per-rep vs
    # 23 ms/1M device time).  The single dispatch itself carries a fixed
    # ~30 ms tunnel sync (measured 2026-08-20, rep-count sweep on an empty
    # scan body), so reps must be large enough to amortize it: at 60 reps
    # of a ~33 ms body it biases the result by <2%.  Min of 2 trials.
    @jax.jit
    def run(pp, key):
        keys = jax.random.split(key, reps)
        acc, _ = jax.lax.scan(
            lambda c, k: (c + p.sample(pp, k, samplesize=n)[0].sum(), None),
            jnp.float32(0.0), keys)
        return acc

    # warmup / compile
    acc = float(run(params, jax.random.PRNGKey(0)))
    assert jnp.isfinite(acc), "non-finite samples in benchmark"

    dt = None
    for t in range(2):
        t0 = time.time()
        float(run(params, jax.random.PRNGKey(1 + t)))
        el = time.time() - t0
        dt = el if dt is None else min(dt, el)
    samples_per_s = reps * n / dt

    payload = {
        "metric": "samples/s/chip on e4+s2+e4 joint PDF (gggg+f+gggg)",
        "value": round(samples_per_s, 1),
        "unit": "samples/s",
        "vs_baseline": round(samples_per_s / REFERENCE_SAMPLES_PER_S, 2),
    }
    # production-recipe numbers measured separately (tools/bench_production.py
    # writes BENCH_PRODUCTION.json; kept out of the driver run because the
    # 15x-f nested-spline configs take minutes of cold compile)
    try:
        import pathlib
        prod = pathlib.Path(__file__).resolve().parent / \
            "BENCH_PRODUCTION.json"
        payload["production"] = json.loads(prod.read_text())
    except Exception:
        pass
    print(json.dumps(payload))


if __name__ == "__main__":
    sys.exit(main())
