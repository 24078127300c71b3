"""Training driver: scan-based NLL fitting with schedules + checkpointing.

The reference ships no trainer (training is plain user-side PyTorch,
docs/source/usage/training.rst:23-41); this is a TPU-side deliverable
(SURVEY section 5 "scheduler"): the whole optimization runs as chunked
``lax.scan`` dispatches (one per checkpoint interval — each eager dispatch
costs ~80 ms of tunnel latency here), with optax learning-rate schedules,
gradient clipping, minibatching, and orbax checkpointing between chunks.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import optax


def make_optimizer(learning_rate=1e-3, schedule=None, num_steps=None,
                   clip_norm=None, optimizer=None):
    """optax chain: optional global-norm clip + Adam on a schedule.

    schedule: None (constant) | "cosine" | "warmup_cosine" | an optax
    schedule callable.
    """
    if optimizer is not None:
        return optimizer
    if schedule is None:
        lr = learning_rate
    elif callable(schedule):
        lr = schedule
    elif schedule == "cosine":
        assert num_steps, "cosine schedule needs num_steps"
        lr = optax.cosine_decay_schedule(learning_rate, num_steps)
    elif schedule == "warmup_cosine":
        assert num_steps, "warmup_cosine schedule needs num_steps"
        lr = optax.warmup_cosine_decay_schedule(
            0.0, learning_rate, max(1, num_steps // 20), num_steps)
    else:
        raise ValueError(f"unknown schedule {schedule!r}")
    opt = optax.adam(lr)
    if clip_norm is not None:
        opt = optax.chain(optax.clip_by_global_norm(clip_norm), opt)
    return opt


def fit(pdf_obj, params, data, conditional_input=None, num_steps=1000,
        batch_size=None, learning_rate=1e-3, schedule=None, clip_norm=None,
        optimizer=None, key=None, checkpoint_path=None,
        checkpoint_every=None, verbose=False):
    """Maximum-likelihood fit.  Returns (params, loss_history np array).

    data: (N, total_target_dim); conditional_input: (N, c) or None.
    batch_size: minibatch rows redrawn each step (None = full batch).
    checkpoint_every: orbax-save params every k steps (breaks the scan into
    k-step chunks; otherwise ONE device dispatch runs all num_steps).
    """
    key = key if key is not None else jax.random.PRNGKey(0)
    data = jnp.asarray(data)
    ci_all = None if conditional_input is None else jnp.asarray(
        conditional_input)
    opt = make_optimizer(learning_rate, schedule, num_steps, clip_norm,
                         optimizer)
    opt_state = opt.init(params)

    def step(carry, skey):
        params, opt_state = carry
        if batch_size is not None:
            idx = jax.random.randint(skey, (batch_size,), 0, data.shape[0])
            x = data[idx]
            ci = None if ci_all is None else ci_all[idx]
        else:
            x, ci = data, ci_all

        # fused NLL objective: eligible gggg sub-manifolds run forward AND
        # backward in one Pallas launch with analytic cotangents; identical
        # math to value_and_grad of -log_prob(...).mean() (falls back to it
        # off-TPU / for ineligible structures)
        l, g = pdf_obj.nll_value_and_grad(params, x, conditional_input=ci)
        updates, opt_state = opt.update(g, opt_state)
        return (optax.apply_updates(params, updates), opt_state), l

    @jax.jit
    def run_chunk(params, opt_state, keys):
        (params, opt_state), losses = jax.lax.scan(
            step, (params, opt_state), keys)
        return params, opt_state, losses

    chunk = checkpoint_every or num_steps
    history = []
    done = 0
    while done < num_steps:
        n = min(chunk, num_steps - done)
        key, sub = jax.random.split(key)
        params, opt_state, losses = run_chunk(params, opt_state,
                                              jax.random.split(sub, n))
        history.append(np.asarray(losses))
        done += n
        if verbose:
            print(f"step {done}/{num_steps}: NLL {float(losses[-1]):.4f}",
                  flush=True)
        if checkpoint_path is not None:
            from .utils import checkpoint as ckpt
            ckpt.save(f"{checkpoint_path}/step_{done:08d}", params)
    return params, np.concatenate(history)
