"""Checkpoint/restore of flow parameters and sampler state via orbax.

The reference inherits nn.Module state_dict semantics; here the parameter
pytree plus any inference state (chain positions, step sizes, mass matrices,
SMC weights) checkpoint through orbax with multi-host-safe async saves
(SURVEY section 5 "checkpoint/resume").
"""
from __future__ import annotations

import jax


def save(path, params, extra_state=None):
    """Save a parameter pytree (+ optional sampler/optimizer state)."""
    import orbax.checkpoint as ocp
    payload = {"params": params}
    if extra_state is not None:
        payload["extra_state"] = extra_state
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, payload, force=True)
    ckptr.wait_until_finished()


def restore(path, like_params=None, like_extra_state=None):
    """Restore; pass `like_*` pytrees (e.g. pdf.init_params()) to recover
    exact shapes/dtypes/shardings.  Returns (params, extra_state|None)."""
    import orbax.checkpoint as ocp
    ckptr = ocp.StandardCheckpointer()
    if like_params is not None:
        template = {"params": like_params}
        if like_extra_state is not None:
            template["extra_state"] = like_extra_state
        payload = ckptr.restore(path, template)
    else:
        payload = ckptr.restore(path)
    return payload["params"], payload.get("extra_state")
