"""MCMC/SMC quality metrics with cross-device aggregation.

Structured observability for the inference engine (SURVEY section 5: the
reference has print() only).  All metrics are pure jnp: under jit with a
sharded chain axis the reductions lower to psums.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def potential_scale_reduction(samples):
    """Split-R-hat (Gelman-Rubin) per dimension.

    samples: (S, C, D) -> (D,).  Values near 1 indicate convergence.
    """
    s, c, d = samples.shape
    half = s // 2
    chains = jnp.concatenate([samples[:half], samples[half:2 * half]], axis=1)
    n, m = chains.shape[0], chains.shape[1]
    chain_means = jnp.mean(chains, axis=0)             # (2C, D)
    chain_vars = jnp.var(chains, axis=0, ddof=1)       # (2C, D)
    grand_mean = jnp.mean(chain_means, axis=0)
    b = n * jnp.var(chain_means, axis=0, ddof=1)
    w = jnp.mean(chain_vars, axis=0)
    var_plus = (n - 1) / n * w + b / n
    return jnp.sqrt(var_plus / w)


def effective_sample_size(samples, max_lag=None):
    """ESS per dimension via Geyer initial-monotone autocorrelation sums.

    samples: (S, C, D) -> (D,).
    """
    s, c, d = samples.shape
    # window: enough overlap (s - max_lag samples) for stable acf estimates
    max_lag = max_lag or max(2, min(s // 4, 512))
    centered = samples - jnp.mean(samples, axis=0, keepdims=True)
    var = jnp.mean(jnp.var(samples, axis=0, ddof=1), axis=0)  # (D,)

    def acov(lag):
        prod = centered[:s - lag] * centered[lag:]
        return jnp.mean(prod, axis=(0, 1))             # (D,)

    lags = jnp.arange(max_lag)
    acfs = jax.vmap(lambda l: jax.lax.dynamic_slice_in_dim(
        centered, 0, s - max_lag, axis=0)
        * jax.lax.dynamic_slice_in_dim(centered, l, s - max_lag, axis=0))(lags)
    rho = jnp.mean(acfs, axis=(1, 2)) / jnp.maximum(var, 1e-30)   # (L, D)

    # Geyer: sum pairs until a pair sum goes negative
    pairs = rho[0::2][: (max_lag // 2)] + rho[1::2][: (max_lag // 2)]
    positive = jnp.cumprod(pairs > 0.0, axis=0).astype(rho.dtype)
    tau = -1.0 + 2.0 * jnp.sum(pairs * positive, axis=0)
    tau = jnp.maximum(tau, 1.0 / (s * c))
    return s * c / tau


def smc_effective_sample_size(log_weights):
    """ESS of normalized SMC weights (global reduction)."""
    lw = log_weights - jax.scipy.special.logsumexp(log_weights)
    return jnp.exp(-jax.scipy.special.logsumexp(2.0 * lw))


def summarize_mcmc(samples, stats=None):
    """Host-side summary dict: moments, R-hat, ESS, acceptance/divergences."""
    import numpy as np
    out = {
        "mean": np.asarray(jnp.mean(samples, axis=(0, 1))),
        "std": np.asarray(jnp.std(samples, axis=(0, 1))),
        "rhat": np.asarray(potential_scale_reduction(samples)),
        "ess": np.asarray(effective_sample_size(samples)),
    }
    if stats:
        if "mean_accept" in stats:
            out["mean_accept"] = float(stats["mean_accept"])
        if "divergences" in stats:
            # per-chain counts (C,); report both the total and the counts
            div = np.asarray(stats["divergences"])
            out["divergences"] = int(div.sum())
            out["divergences_per_chain"] = div.reshape(-1)
        if "step_size" in stats:
            out["step_size"] = float(stats["step_size"])
    return out
