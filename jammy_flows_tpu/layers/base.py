"""Functional flow-layer protocol.

TPU-native redesign of the reference layer contract (layer_base.py:25-100).
A layer here is a *static configuration object* - it owns no tensors.  Its
parameters always arrive as a batched slice ``params`` of shape (Bp, P) with
Bp in {1, B} (broadcast): the reference's "permanent vs amortized parameter"
duality collapses into where that slice comes from (trainable pytree vs MLP
output).  All mapping methods are pure functions suitable for jit/vmap/grad:

    forward(params, x, log_det)  -> (y, log_det')   # base -> target (sampling)
    inverse(params, y, log_det)  -> (x, log_det')   # target -> base (density)

Coordinate bookkeeping mirrors layer_base.py: intrinsic/embedded/base
dimensions plus ``embedding_conditional_return`` used for autoregressive
conditioning, and ``transform_target_space`` for coordinate conversions.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp


class FlowLayer:
    """Base class: static config only, pure-function mappings."""

    def __init__(self, dimension, always_parametrize_in_embedding_space=0):
        self.dimension = dimension
        self.always_parametrize_in_embedding_space = bool(
            always_parametrize_in_embedding_space)
        self.num_params = 0

    # -- mapping ----------------------------------------------------------
    def forward(self, params, x, log_det):
        raise NotImplementedError

    def inverse(self, params, x, log_det):
        raise NotImplementedError

    # -- column fast path --------------------------------------------------
    # TPU tile padding makes (B, 1)/(B, 2) arrays ~11x slower than flat (B,)
    # arrays for elementwise math (measured v5e 2026-08-20; see
    # ops/splines.py column section).  Layers that implement
    # ``forward_cols``/``inverse_cols`` carry coordinates as tuples of (B,)
    # columns and parameters as a transposed (P, Bp) slab; the orchestrator
    # dispatches to them via ``supports_columns``.
    def supports_columns(self):
        return False

    def supports_columns_dir(self, direction):
        """direction in {"sample", "density"}.  Layers whose two directions
        differ in solver requirements (e.g. the exp-map 'v': one direction
        is analytic, the other needs a sphere-Newton solve) can support
        columns for the analytic direction only."""
        return self.supports_columns()

    def forward_cols(self, slab, cols, log_det):
        raise NotImplementedError

    def inverse_cols(self, slab, cols, log_det):
        raise NotImplementedError

    # -- parameter protocol ----------------------------------------------
    def default_params(self, rng=None):
        """Desired initialization vector, shape (num_params,), numpy float64.

        Equivalent of layer_base.get_desired_init_parameters: used both to
        initialize permanent parameters and as the MLP final-bias target.
        """
        rng = rng or np.random.default_rng(0)
        return rng.standard_normal(self.num_params)

    def param_structure(self):
        """Ordered (name, size) pairs matching this layer's packed parameter
        slab — the named-tensor interface of the reference's
        obtain_layer_param_structure (default.py:1119-1298).  Sizes must sum
        to ``num_params``; concrete layers override with semantic names
        ("log_widths", "means", ...)."""
        return [("params", self.num_params)] if self.num_params else []

    # -- dimension bookkeeping -------------------------------------------
    @property
    def intrinsic_dim(self):
        return self.dimension

    @property
    def embedded_dim(self):
        return self.dimension

    @property
    def base_dim(self):
        return self.dimension

    @property
    def target_dim(self):
        """Dimensionality of the target coordinates this layer consumes."""
        return (self.embedded_dim if self.always_parametrize_in_embedding_space
                else self.intrinsic_dim)

    # -- coordinate transforms -------------------------------------------
    def embedding_conditional_return(self, x):
        """Embed target coords for downstream autoregressive conditioning."""
        return x

    def transform_target_space(self, x, log_det=0.0, transform_from="default",
                               transform_to="embedding"):
        return x, log_det


def split_params(params, sizes):
    """Split a (B, sum(sizes)) parameter slab into per-block views."""
    out = []
    idx = 0
    for s in sizes:
        out.append(params[:, idx:idx + s])
        idx += s
    return out


def broadcast_params(params, batch_size):
    """Broadcast a (1, P) parameter slab to (B, P) when needed."""
    if params.shape[0] == batch_size:
        return params
    return jnp.broadcast_to(params, (batch_size,) + params.shape[1:])
