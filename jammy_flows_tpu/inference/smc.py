"""Sequential Monte Carlo with systematic resampling and HMC mutation.

NEW capability vs the reference.  Anneals from an initial distribution
(defaults to the standard normal) to the target through a tempered path,
with particle weights normalized by global reductions (psums when the
particle axis is sharded over a mesh) and systematic resampling.
"""
from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from .hmc import HMCState, hmc_step, init_chain_state


class SMCState(NamedTuple):
    particles: jnp.ndarray     # (N, D)
    log_weights: jnp.ndarray   # (N,) normalized
    log_z: jnp.ndarray         # running log normalizing-constant estimate


def effective_sample_size(log_weights):
    lw = log_weights - jax.scipy.special.logsumexp(log_weights)
    return jnp.exp(-jax.scipy.special.logsumexp(2.0 * lw))


def systematic_resample(key, particles, log_weights):
    """Systematic resampling: one uniform, N stratified points.

    Implemented as a searchsorted over the normalized CDF - a single
    all-gather-style contraction when sharded.
    """
    n = particles.shape[0]
    lw = log_weights - jax.scipy.special.logsumexp(log_weights)
    w = jnp.exp(lw)
    cdf = jnp.cumsum(w)
    u0 = jax.random.uniform(key, (), dtype=particles.dtype)
    pts = (u0 + jnp.arange(n, dtype=particles.dtype)) / n
    idx = jnp.clip(jnp.searchsorted(cdf, pts), 0, n - 1)
    return particles[idx], jnp.zeros(n, dtype=particles.dtype)


def run_smc(target_logprob_fn, key, num_particles, dim,
            initial_logprob_fn=None, initial_sampler=None,
            num_temps=20, mutation_steps=3, hmc_step_size=0.2,
            hmc_num_leapfrog=8, ess_threshold=0.5, dtype=jnp.float32,
            initial_particles=None):
    """Tempered SMC from rho_0 to the target.

    target_logprob_fn: batched (N, D) -> (N,).
    Returns (particles, log_weights, log_z_estimate, ess_history).

    Pass ``initial_particles`` (N, D) to start from an existing (possibly
    mesh-sharded) particle array — the sharding propagates through the whole
    run and the weight/CDF reductions (logsumexp, cumsum, searchsorted)
    become global collectives over the particle axis.
    """
    if initial_logprob_fn is None:
        def initial_logprob_fn(x):
            return jnp.sum(-0.5 * x**2 - 0.9189385332046727, axis=-1)
    if initial_sampler is None:
        def initial_sampler(k, n):
            return jax.random.normal(k, (n, dim), dtype=dtype)

    betas = jnp.linspace(0.0, 1.0, num_temps + 1)[1:]

    key, init_key = jax.random.split(key)
    if initial_particles is not None:
        particles = jnp.asarray(initial_particles, dtype=dtype)
        num_particles = particles.shape[0]
    else:
        particles = initial_sampler(init_key, num_particles)
    log_weights = jnp.zeros(num_particles, dtype=dtype)
    log_z = jnp.zeros((), dtype=dtype)

    def tempered(beta):
        def lp(x):
            return (1.0 - beta) * initial_logprob_fn(x) + \
                beta * target_logprob_fn(x)
        return lp

    def step(carry, beta_pair):
        particles, log_weights, log_z, key = carry
        beta_prev, beta = beta_pair
        # incremental weights
        delta = (target_logprob_fn(particles) - initial_logprob_fn(particles)) \
            * (beta - beta_prev)
        log_weights = log_weights + delta
        # logZ increment (global logsumexp -> psum when sharded)
        n = particles.shape[0]
        log_z = log_z + jax.scipy.special.logsumexp(log_weights) \
            - jnp.log(jnp.asarray(n, dtype)) \
            - (jax.scipy.special.logsumexp(log_weights - delta)
               - jnp.log(jnp.asarray(n, dtype)))
        ess = effective_sample_size(log_weights)

        key, rs_key = jax.random.split(key)
        do_resample = ess < ess_threshold * n
        res_particles, res_weights = systematic_resample(rs_key, particles,
                                                         log_weights)
        particles = jnp.where(do_resample, res_particles, particles)
        log_weights = jnp.where(do_resample, res_weights, log_weights)

        # HMC mutation at the current temperature
        lp_fn = tempered(beta)
        state = init_chain_state(lp_fn, particles)
        inv_mass = jnp.ones(particles.shape[-1], dtype)

        def mutate(carry, _):
            state, key = carry
            key, sub = jax.random.split(key)
            state, _, _ = hmc_step(lp_fn, sub, state,
                                   jnp.asarray(hmc_step_size, dtype), inv_mass,
                                   hmc_num_leapfrog)
            return (state, key), None

        key, mut_key = jax.random.split(key)
        (state, _), _ = jax.lax.scan(mutate, (state, mut_key), None,
                                     length=mutation_steps)
        return (state.position, log_weights, log_z, key), ess

    beta_pairs = jnp.stack([jnp.concatenate([jnp.zeros(1), betas[:-1]]), betas],
                           axis=1)
    (particles, log_weights, log_z, _), ess_hist = jax.lax.scan(
        step, (particles, log_weights, log_z, key), beta_pairs)
    return particles, log_weights, log_z, ess_hist
