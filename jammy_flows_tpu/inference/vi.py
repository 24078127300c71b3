"""Stochastic variational inference with a jammy_flows_tpu PDF as posterior.

NEW capability vs the reference.  The flow IS the variational family: the
reparameterized ELBO uses differentiable ancestral samples (the iterative
inverses carry implicit-function gradients, so sampling is differentiable
end-to-end) and the exact flow log-prob:

    ELBO(params) = E_{x ~ q_params} [ log p_target(x) - log q_params(x) ]

Sample axes shard trivially over a mesh (data parallel ELBO).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import optax


def elbo(pdf_obj, params, key, target_logprob_fn, num_samples=256,
         conditional_input=None):
    """Monte-Carlo reparameterized ELBO (higher is better)."""
    x, z, logq, _ = pdf_obj.sample(params, key, samplesize=num_samples,
                                   conditional_input=conditional_input)
    return jnp.mean(target_logprob_fn(x) - logq)


def fit_vi(pdf_obj, params, key, target_logprob_fn, num_steps=1000,
           num_samples=256, learning_rate=1e-3, optimizer=None,
           conditional_input=None, minibatch_size=None):
    """Maximize the ELBO.  Returns (params, elbo_history).

    The whole optimization is ONE ``lax.scan`` under jit — one device
    dispatch for all ``num_steps`` (each eager dispatch costs ~80 ms of
    tunnel latency in this environment; a Python loop over steps would be
    pure overhead).

    Conditional/amortized VI: with ``conditional_input`` of shape (B, d),
    each step draws one posterior sample per row and ``target_logprob_fn``
    is called as ``target_logprob_fn(x, ci)``.  With ``minibatch_size=m``
    a random row subset of size m is redrawn every step (doubly-stochastic
    ELBO), so B can far exceed what fits in one step.
    """
    opt = optimizer or optax.adam(learning_rate)
    opt_state = opt.init(params)
    use_cond = conditional_input is not None
    if use_cond:
        conditional_input = jnp.asarray(conditional_input)
    use_mb = use_cond and minibatch_size is not None

    def step(carry, skey):
        params, opt_state = carry
        if use_mb:
            ksample, kidx = jax.random.split(skey)
            idx = jax.random.choice(kidx, conditional_input.shape[0],
                                    (minibatch_size,), replace=False)
            ci = conditional_input[idx]
        else:
            ksample, ci = skey, conditional_input

        def loss(pp):
            x, _, logq, _ = pdf_obj.sample(pp, ksample,
                                           samplesize=num_samples,
                                           conditional_input=ci)
            lp = target_logprob_fn(x, ci) if use_cond else target_logprob_fn(x)
            return -jnp.mean(lp - logq)

        l, g = jax.value_and_grad(loss)(params)
        updates, opt_state = opt.update(g, opt_state)
        return (optax.apply_updates(params, updates), opt_state), -l

    @jax.jit
    def run(params, opt_state, key):
        keys = jax.random.split(key, num_steps)
        (params, opt_state), history = jax.lax.scan(
            step, (params, opt_state), keys)
        return params, history

    return run(params, opt_state, key)
