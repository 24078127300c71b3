"""Profiling and throughput measurement (first-class, per SURVEY section 5).

The reference has only ad-hoc time.time() prints; here: jax.profiler trace
contexts plus an honest-sync throughput timer (block_until_ready is not
reliable over remote-device tunnels, so timing forces a scalar host
transfer).
"""
from __future__ import annotations

import contextlib
import time

import jax
import jax.numpy as jnp


@contextlib.contextmanager
def trace(log_dir="/tmp/jammy_flows_tpu_trace"):
    """Capture a jax.profiler trace viewable in TensorBoard/Perfetto."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def throughput(fn, *args, items_per_call, reps=10, warmup=1, **kwargs):
    """Measure items/s of `fn(*args, **kwargs)` with genuine host sync.

    fn must return (a pytree containing) at least one array; a scalar
    reduction of the first leaf is pulled to the host each rep.
    """
    def scalar_sync(out):
        leaf = jax.tree_util.tree_leaves(out)[0]
        return float(jnp.sum(leaf))

    for _ in range(warmup):
        scalar_sync(fn(*args, **kwargs))
    t0 = time.time()
    acc = 0.0
    for _ in range(reps):
        acc += scalar_sync(fn(*args, **kwargs))
    dt = time.time() - t0
    return {"items_per_s": reps * items_per_call / dt,
            "seconds_per_call": dt / reps, "reps": reps, "checksum": acc}


def annotate(name):
    """Named profiler annotation context (shows up in traces)."""
    return jax.profiler.TraceAnnotation(name)
