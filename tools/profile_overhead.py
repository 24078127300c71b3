"""Isolate the per-step fixed overhead of the training step (everything
that is not flow math): base-normal logprob, coordinate bookkeeping, loss
reduction, backward of those, Adam, and scan-iteration overhead.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/profile_overhead.py
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


def timed(run, *args):
    float(run(*args))
    t0 = time.time()
    float(run(*args))
    return (time.time() - t0) / REPS * 1e3


def step_timer(p, params, dim, cond_dim=None):
    opt = optax.adam(1e-3)
    x = jnp.zeros((B, dim), jnp.float32)
    ci = None if cond_dim is None else jnp.ones((B, cond_dim), jnp.float32)

    def body(carry, eps):
        params, opt_state = carry
        xx = x + eps

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

    return timed(run, params, jax.random.PRNGKey(1))


def main():
    # empty scan body baseline (measurement-loop overhead)
    @jax.jit
    def empty(key):
        eps = 1e-6 * jax.random.normal(key, (REPS, 1, 1), jnp.float32)

        def body(c, e):
            return c + e.sum(), None
        acc, _ = jax.lax.scan(body, jnp.float32(0), eps)
        return acc
    print(f"empty scan body: {timed(empty, jax.random.PRNGKey(0)):.2f} ms")

    # raw base-normal logprob value+grad on (B, 11)
    @jax.jit
    def base_lp(key):
        eps = 1e-6 * jax.random.normal(key, (REPS, 1, 1), jnp.float32)
        x = jnp.zeros((B, 11), jnp.float32)

        def body(c, e):
            def loss(xx):
                return jnp.mean(jnp.sum(-0.5 * xx**2 - 0.918938, axis=-1))
            l, g = jax.value_and_grad(loss)(x + e)
            return c + l + g.sum(), None
        acc, _ = jax.lax.scan(body, jnp.float32(0), eps)
        return acc
    print(f"base logprob v+g (B,11): {timed(base_lp, jax.random.PRNGKey(0)):.2f} ms")

    for pdefs, fdefs, cond in [
        ("e4", "x", None),
        ("e4", "x", 3),
        ("e4+s2+e4", "x+y+x", 3),
        ("e4", "g", None),
    ]:
        opts = {"g": {"rotation_mode": "none"}} if fdefs == "g" else {}
        p = pdf(pdefs, fdefs, conditional_input_dim=cond,
                options_overwrite=opts)
        params = p.init_params(seed=0, dtype=jnp.float32)
        ms = step_timer(p, params, p.total_target_dim, cond)
        print(f"{pdefs:10s} {fdefs:8s} cond={cond}: {ms:8.2f} ms/step",
              flush=True)


if __name__ == "__main__":
    main()
