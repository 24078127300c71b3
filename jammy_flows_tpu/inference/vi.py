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
           conditional_input=None):
    """Maximize the ELBO.  Returns (params, elbo_history)."""
    opt = optimizer or optax.adam(learning_rate)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state, key):
        def loss(pp):
            return -elbo(pdf_obj, pp, key, target_logprob_fn,
                         num_samples=num_samples,
                         conditional_input=conditional_input)
        l, g = jax.value_and_grad(loss)(params)
        updates, opt_state = opt.update(g, opt_state)
        return optax.apply_updates(params, updates), opt_state, -l

    history = []
    for i in range(num_steps):
        key, sub = jax.random.split(key)
        params, opt_state, e = step(params, opt_state, sub)
        history.append(e)
    return params, jnp.stack(history)
