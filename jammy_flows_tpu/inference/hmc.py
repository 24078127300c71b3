"""Hamiltonian Monte Carlo + NUTS, designed for chain-parallel TPU execution.

This is a NEW capability vs the reference (which has no sampler beyond
ancestral flow sampling - SURVEY.md "north-star context"): gradient-based
MCMC over any differentiable log-density, in particular the flow log_prob of
a jammy_flows_tpu PDF.

Design:
  * all kernels are pure jax functions of (key, state) -> state, vectorized
    over a leading chain axis; under jit with a sharded chain axis the work
    distributes over the mesh and the (rare) cross-chain reductions used in
    adaptation lower to psums over ICI (see parallel/mesh.py);
  * warmup follows the Stan scheme: dual-averaging step size + windowed
    Welford diagonal mass-matrix estimation;
  * NUTS is the iterative multinomial variant with a fixed maximum tree
    depth (static trip counts; no recursion).
"""
from __future__ import annotations

import math
from functools import partial
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp


class HMCState(NamedTuple):
    position: jnp.ndarray      # (C, D)
    log_prob: jnp.ndarray      # (C,)
    grad: jnp.ndarray          # (C, D)


class DualAveragingState(NamedTuple):
    log_step: jnp.ndarray
    log_step_avg: jnp.ndarray
    h_avg: jnp.ndarray
    mu: jnp.ndarray
    count: jnp.ndarray


class WelfordState(NamedTuple):
    mean: jnp.ndarray
    m2: jnp.ndarray
    count: jnp.ndarray


def _value_and_grad_batched(logprob_fn):
    """(C, D) -> ((C,), (C, D)) via vmapped value_and_grad."""
    vg = jax.value_and_grad(lambda q: logprob_fn(q[None, :])[0])
    return jax.vmap(vg)


def init_chain_state(logprob_fn, positions):
    lp, grad = _value_and_grad_batched(logprob_fn)(positions)
    return HMCState(positions, lp, grad)


def leapfrog(logprob_fn, state, momentum, step_size, inv_mass, num_steps):
    """num_steps leapfrog steps; step_size (C,1) or scalar, inv_mass (D,)."""
    vg = _value_and_grad_batched(logprob_fn)

    def body(_, carry):
        q, p, lp, g = carry
        p = p + 0.5 * step_size * g
        q = q + step_size * inv_mass * p
        lp, g = vg(q)
        p = p + 0.5 * step_size * g
        return (q, p, lp, g)

    q, p, lp, g = jax.lax.fori_loop(
        0, num_steps, body, (state.position, momentum, state.log_prob, state.grad))
    return HMCState(q, lp, g), p


def _kinetic(p, inv_mass):
    return 0.5 * jnp.sum(p * inv_mass * p, axis=-1)


def hmc_step(logprob_fn, key, state, step_size, inv_mass, num_leapfrog):
    """One Metropolis-corrected HMC transition for all chains."""
    c, d = state.position.shape
    key_mom, key_acc = jax.random.split(key)
    # momentum ~ N(0, M); M = 1/inv_mass (diagonal)
    p0 = jax.random.normal(key_mom, (c, d), dtype=state.position.dtype) \
        / jnp.sqrt(inv_mass)
    new_state, p_new = leapfrog(logprob_fn, state, p0, step_size, inv_mass,
                                num_leapfrog)
    h0 = -state.log_prob + _kinetic(p0, inv_mass)
    h1 = -new_state.log_prob + _kinetic(p_new, inv_mass)
    log_accept = jnp.minimum(0.0, h0 - h1)
    log_accept = jnp.where(jnp.isfinite(log_accept), log_accept, -jnp.inf)
    accept = jnp.log(jax.random.uniform(key_acc, (c,),
                                        dtype=state.position.dtype)) < log_accept
    pick = lambda a, b: jnp.where(accept[:, None], a, b)
    out = HMCState(pick(new_state.position, state.position),
                   jnp.where(accept, new_state.log_prob, state.log_prob),
                   pick(new_state.grad, state.grad))
    return out, jnp.exp(log_accept), ~jnp.isfinite(h1)


# ---------------------------------------------------------------------------
# adaptation
# ---------------------------------------------------------------------------

def da_init(step_size):
    mu = jnp.log(10.0 * step_size)
    return DualAveragingState(jnp.log(step_size), jnp.log(step_size),
                              jnp.zeros(()), mu, jnp.zeros(()))


def da_update(da, accept_prob, target=0.8, gamma=0.05, t0=10.0, kappa=0.75):
    """Nesterov dual averaging on the CROSS-CHAIN mean acceptance - the
    cross-chip psum in a sharded setting."""
    count = da.count + 1.0
    w = 1.0 / (count + t0)
    h_avg = (1.0 - w) * da.h_avg + w * (target - jnp.mean(accept_prob))
    log_step = da.mu - jnp.sqrt(count) / gamma * h_avg
    eta = count ** (-kappa)
    log_step_avg = eta * log_step + (1.0 - eta) * da.log_step_avg
    return DualAveragingState(log_step, log_step_avg, h_avg, da.mu, count)


def welford_init(d, dtype=jnp.float32):
    return WelfordState(jnp.zeros(d, dtype), jnp.zeros(d, dtype),
                        jnp.zeros((), dtype))


def welford_update(w, positions):
    """Accumulate cross-chain: every chain's position counts as a draw."""
    batch_mean = jnp.mean(positions, axis=0)
    batch_m2 = jnp.sum((positions - batch_mean) ** 2, axis=0)
    n_b = positions.shape[0]
    n = w.count + n_b
    delta = batch_mean - w.mean
    mean = w.mean + delta * n_b / n
    m2 = w.m2 + batch_m2 + delta**2 * w.count * n_b / n
    return WelfordState(mean, m2, n)


def welford_variance(w, regularize=True):
    var = w.m2 / jnp.maximum(w.count - 1.0, 1.0)
    if regularize:
        # Stan-style shrinkage toward unit
        n = w.count
        var = (n / (n + 5.0)) * var + 1e-3 * (5.0 / (n + 5.0))
    return var


# ---------------------------------------------------------------------------
# NUTS (iterative multinomial, fixed max depth)
# ---------------------------------------------------------------------------

class _NutsChainState(NamedTuple):
    # per-chain trajectory state; leading axis C
    q_minus: jnp.ndarray
    p_minus: jnp.ndarray
    g_minus: jnp.ndarray
    q_plus: jnp.ndarray
    p_plus: jnp.ndarray
    g_plus: jnp.ndarray
    q_prop: jnp.ndarray
    lp_prop: jnp.ndarray
    g_prop: jnp.ndarray
    r_sum: jnp.ndarray         # (C, D) physical momentum sum over trajectory
    log_sum_weight: jnp.ndarray
    sum_accept: jnp.ndarray
    n_steps: jnp.ndarray
    turning: jnp.ndarray
    diverged: jnp.ndarray


def _uturn_rho(p_left, p_right, rho, inv_mass):
    """Generalized (Stan/Betancourt) U-turn criterion on a momentum sum:
    stop when the trajectory's momentum resultant rho has non-positive
    projection onto either endpoint's sharp momentum inv_mass*p."""
    return (jnp.sum(rho * (inv_mass * p_left), axis=-1) <= 0.0) | \
           (jnp.sum(rho * (inv_mass * p_right), axis=-1) <= 0.0)


def _popcount(i, nbits):
    return jnp.sum((i >> jnp.arange(nbits)) & 1)


def _trailing_ones(i, nbits):
    bits = (i >> jnp.arange(nbits)) & 1
    return jnp.sum(jnp.cumprod(bits))


def nuts_step(logprob_fn, key, state, step_size, inv_mass, max_depth=8,
              max_delta_energy=1000.0):
    """One iterative multinomial-NUTS transition for all chains.

    The trajectory is doubled up to max_depth times in random directions;
    within each doubling the proposal is progressively multinomial-sampled.

    U-turn checks are the FULL balanced-subtree criterion, computed
    iteratively with the checkpoint bit-trick (Phan & Pradhan, "Iterative
    NUTS"; what Stan's recursion does, mapped to static loops): while a
    2^depth-leaf subtree is built leaf by leaf, every even leaf stores its
    momentum and running momentum-sum in checkpoint slot popcount(i); at
    every odd leaf i the subtrees ending there (one per trailing 1-bit of i)
    are tested with the generalized momentum-resultant criterion against
    their stored left edges.  Checkpoint storage is O(max_depth), checks are
    O(max_depth) dot products per leaf — all static shapes under jit, chains
    vectorized.
    """
    c, d = state.position.shape
    dtype = state.position.dtype
    vg = _value_and_grad_batched(logprob_fn)
    key, key_mom = jax.random.split(key)
    p0 = jax.random.normal(key_mom, (c, d), dtype=dtype) / jnp.sqrt(inv_mass)
    h0 = -state.log_prob + _kinetic(p0, inv_mass)

    n_slots = max(max_depth - 1, 1)   # even-leaf popcounts < subtree depth
    nbits = max_depth + 1

    init = _NutsChainState(
        q_minus=state.position, p_minus=p0, g_minus=state.grad,
        q_plus=state.position, p_plus=p0, g_plus=state.grad,
        q_prop=state.position, lp_prop=state.log_prob, g_prop=state.grad,
        r_sum=p0,
        log_sum_weight=jnp.zeros(c, dtype),
        sum_accept=jnp.zeros(c, dtype),
        n_steps=jnp.zeros(c, jnp.int32),
        turning=jnp.zeros(c, bool), diverged=jnp.zeros(c, bool))

    def doubling(depth, carry):
        ts, key = carry
        key, key_dir, key_mult, key_merge = jax.random.split(key, 4)
        go_fwd = jax.random.bernoulli(key_dir, 0.5, (c,))
        num_steps = 2 ** depth

        # integrate num_steps leapfrogs from the chosen end, in its direction,
        # accumulating the SUBTREE's own weight/proposal (progressive
        # multinomial within the subtree)
        q = jnp.where(go_fwd[:, None], ts.q_plus, ts.q_minus)
        p = jnp.where(go_fwd[:, None], ts.p_plus, -ts.p_minus)
        g = jnp.where(go_fwd[:, None], ts.g_plus, ts.g_minus)
        neg_inf = jnp.full((c,), -jnp.inf, dtype)

        def leap(i, inner):
            (q, p, g, lsw_sub, q_pr, lp_pr, g_pr, acc, div, turn,
             r_sub, p_ck, s_ck, key) = inner
            key, key_pick = jax.random.split(key)
            p = p + 0.5 * step_size * g
            q = q + step_size * inv_mass * p
            lp, g = vg(q)
            p = p + 0.5 * step_size * g
            h = -lp + _kinetic(p, inv_mass)
            log_w = h0 - h
            log_w = jnp.where(jnp.isfinite(log_w), log_w, -jnp.inf)
            div = div | (h - h0 > max_delta_energy) | ~jnp.isfinite(h)
            new_lsw = jnp.logaddexp(lsw_sub, log_w)
            take = jnp.log(jax.random.uniform(key_pick, (c,), dtype=dtype)) \
                < (log_w - new_lsw)
            take = take & ~div
            q_pr = jnp.where(take[:, None], q, q_pr)
            lp_pr = jnp.where(take, lp, lp_pr)
            g_pr = jnp.where(take[:, None], g, g_pr)
            acc = acc + jnp.exp(jnp.minimum(0.0, log_w))
            r_sub = r_sub + p

            # -- balanced-subtree U-turn bookkeeping (leaf index i) --
            is_even = (i % 2) == 0
            store_slot = jnp.minimum(_popcount(i, nbits), n_slots - 1)
            p_ck_new = jax.lax.dynamic_update_index_in_dim(
                p_ck, p, store_slot, axis=1)
            s_ck_new = jax.lax.dynamic_update_index_in_dim(
                s_ck, r_sub, store_slot, axis=1)
            p_ck = jnp.where(is_even, p_ck_new, p_ck)
            s_ck = jnp.where(is_even, s_ck_new, s_ck)

            # subtrees ending at odd leaf i: slots [idx_min, idx_max]
            idx_max = _popcount(i >> 1, nbits)
            idx_min = idx_max - _trailing_ones(i, nbits) + 1
            sl = jnp.arange(n_slots)
            active = (~is_even) & (sl >= idx_min) & (sl <= idx_max)  # (S,)
            # rho over [ckpt leaf .. leaf i] = r_sub - s_ck + p_ck
            rho = r_sub[:, None, :] - s_ck + p_ck                # (C, S, D)
            t_l = jnp.sum(rho * (inv_mass * p_ck), axis=-1) <= 0.0
            t_r = jnp.sum(rho * (inv_mass * p)[:, None, :], axis=-1) <= 0.0
            turn = turn | jnp.any(active[None, :] & (t_l | t_r), axis=1)
            return (q, p, g, new_lsw, q_pr, lp_pr, g_pr, acc, div, turn,
                    r_sub, p_ck, s_ck, key)

        zeros_ck = jnp.zeros((c, n_slots, d), dtype)
        inner0 = (q, p, g, neg_inf, q, state.log_prob, g,
                  jnp.zeros(c, dtype), jnp.zeros(c, bool),
                  jnp.zeros(c, bool), jnp.zeros((c, d), dtype),
                  zeros_ck, zeros_ck, key_mult)
        (q, p, g, lsw_sub, q_pr, lp_pr, g_pr, acc_sub, div_sub, sub_turn,
         r_sub, _, _, _) = jax.lax.fori_loop(0, num_steps, leap, inner0)

        stopped = ts.turning | ts.diverged
        sub_invalid = div_sub | sub_turn
        # merge proposal only from a valid subtree of an unstopped chain
        merge = ~stopped & ~sub_invalid
        take_sub = merge & (jnp.log(jax.random.uniform(key_merge, (c,),
                                                       dtype=dtype))
                            < (lsw_sub - jnp.logaddexp(ts.log_sum_weight,
                                                       lsw_sub)))

        def sel(cond, a, b):
            m = cond[:, None] if a.ndim == 2 else cond
            return jnp.where(m, a, b)

        q_prop = sel(take_sub, q_pr, ts.q_prop)
        lp_prop = jnp.where(take_sub, lp_pr, ts.lp_prop)
        g_prop = sel(take_sub, g_pr, ts.g_prop)
        lsw = jnp.where(merge, jnp.logaddexp(ts.log_sum_weight, lsw_sub),
                        ts.log_sum_weight)

        # trajectory endpoints / momentum resultant advance only on merge
        # (an invalid subtree is discarded wholesale, as in Stan)
        q_plus = sel(merge & go_fwd, q, ts.q_plus)
        p_plus = sel(merge & go_fwd, p, ts.p_plus)
        g_plus = sel(merge & go_fwd, g, ts.g_plus)
        q_minus = sel(merge & ~go_fwd, q, ts.q_minus)
        p_minus = sel(merge & ~go_fwd, -p, ts.p_minus)
        g_minus = sel(merge & ~go_fwd, g, ts.g_minus)
        # physical-frame momentum sum: backward subtrees integrated with
        # flipped momentum, so their resultant enters negated
        r_sum = jnp.where(merge[:, None],
                          ts.r_sum + jnp.where(go_fwd[:, None],
                                               r_sub, -r_sub),
                          ts.r_sum)

        turning = ts.turning | (~stopped & sub_turn) | \
            (merge & _uturn_rho(p_minus, p_plus, r_sum, inv_mass))
        keep = ~stopped
        new_ts = _NutsChainState(
            q_minus, p_minus, g_minus, q_plus, p_plus, g_plus,
            q_prop, lp_prop, g_prop, r_sum, lsw,
            ts.sum_accept + jnp.where(keep, acc_sub, 0.0),
            ts.n_steps + jnp.where(keep, num_steps, 0).astype(jnp.int32),
            turning, ts.diverged | (keep & div_sub))
        return new_ts, key

    ts, _ = jax.lax.fori_loop(0, max_depth, doubling, (init, key))

    accept_prob = ts.sum_accept / jnp.maximum(ts.n_steps.astype(dtype), 1.0)
    out = HMCState(ts.q_prop, ts.lp_prop, ts.g_prop)
    return out, accept_prob, ts.diverged


# ---------------------------------------------------------------------------
# drivers
# ---------------------------------------------------------------------------

def _make_kernel(logprob_fn, algorithm, num_leapfrog, max_depth):
    if algorithm == "hmc":
        def kernel(key, state, step_size, inv_mass):
            return hmc_step(logprob_fn, key, state, step_size, inv_mass,
                            num_leapfrog)
    else:
        def kernel(key, state, step_size, inv_mass):
            return nuts_step(logprob_fn, key, state, step_size, inv_mass,
                             max_depth)
    return kernel


def run_mcmc(logprob_fn, init_positions, key, num_warmup=500, num_samples=500,
             algorithm="nuts", num_leapfrog=32, max_depth=8,
             initial_step_size=0.1, target_accept=0.8, thin=1):
    """Adaptive warmup + sampling.  Returns (samples (S, C, D), stats dict).

    logprob_fn: batched (C, D) -> (C,).  init_positions: (C, D).
    Shard the chain axis C over a mesh for multi-chip execution
    (parallel/mesh.py) - adaptation reductions become psums automatically.
    """
    dtype = init_positions.dtype
    d = init_positions.shape[-1]
    kernel = _make_kernel(logprob_fn, algorithm, num_leapfrog, max_depth)

    state = init_chain_state(logprob_fn, init_positions)
    da = da_init(jnp.asarray(initial_step_size, dtype))
    wf = welford_init(d, dtype)
    inv_mass0 = jnp.ones(d, dtype)

    # --- warmup: single scan; mass matrix frozen from first 2/3 of draws ---
    mass_update_until = int(num_warmup * 0.67)

    def warmup_body(carry, i):
        state, da, wf, inv_mass, key = carry
        key, sub = jax.random.split(key)
        step_size = jnp.exp(da.log_step)
        state, accept, _ = kernel(sub, state, step_size, inv_mass)
        da = da_update(da, accept, target=target_accept)
        wf = jax.lax.cond(i < mass_update_until,
                          lambda w: welford_update(w, state.position),
                          lambda w: w, wf)
        inv_mass = jax.lax.cond(
            i == mass_update_until,
            lambda _: welford_variance(wf).astype(dtype),
            lambda im: im, inv_mass)
        return (state, da, wf, inv_mass, key), None

    key, warm_key = jax.random.split(key)
    (state, da, wf, inv_mass, _), _ = jax.lax.scan(
        warmup_body, (state, da, wf, inv_mass0, warm_key),
        jnp.arange(num_warmup))

    final_step = jnp.exp(da.log_step_avg)

    # --- sampling ---
    def sample_body(carry, _):
        state, key, div = carry
        key, sub = jax.random.split(key)
        new_state = state
        for _ in range(thin):
            key, sub = jax.random.split(key)
            new_state, accept, chain_div = kernel(sub, new_state, final_step,
                                                  inv_mass)
            div = div + chain_div.astype(div.dtype)
        return (new_state, key, div), (new_state.position, new_state.log_prob,
                                       accept)

    key, samp_key = jax.random.split(key)
    c = init_positions.shape[0]
    (state, _, divergences), (positions, log_probs, accepts) = jax.lax.scan(
        sample_body, (state, samp_key, jnp.zeros((c,), jnp.int32)),
        None, length=num_samples)

    stats = {"step_size": final_step, "inv_mass": inv_mass,
             "mean_accept": jnp.mean(accepts),
             "divergences": divergences,            # per-chain counts (C,)
             "total_divergences": jnp.sum(divergences),
             "log_probs": log_probs}
    return positions, stats
