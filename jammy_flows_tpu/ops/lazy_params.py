"""Lazy (unmaterialized) MLP-predicted parameter slabs.

The amortized hot path predicts per-sample flow parameters with an MLP whose
final matmul produces a (B, P) tensor with P ~ 1000 -- on big batches this
single tensor (plus its per-layer transposed (K, D, B) views and their
backward passes) accounted for most of the HBM traffic of a training step
(measured 14.25 GB per 262k-row step on an amortized `e4/gggg` block vs
0.42 GB for the identical permanent-parameter block).

A :class:`LazyParamSlab` represents ``hidden @ w.T + b`` WITHOUT computing
it.  Column slices (the per-layer / per-parameter-group splits the
orchestrator performs) just slice rows of ``w`` and ``b``.  Consumers either

* materialize (one small XLA matmul for the sliced columns only), or
* pass ``(hidden, w, b)`` straight into the fused Pallas GF kernels, which
  run the final matmul on the MXU in VMEM -- the (B, P) slab then never
  exists in HBM at all (ops/pallas_gf.py lazy interface).

Reference context: the reference materializes the full slab per call
(jammy_flows/main/default.py:949-956); this is a TPU-side redesign, not a
port.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


class LazyParamSlab:
    """(B, P) parameter slab represented as ``hidden @ w.T + b``.

    hidden: (B, H); w: (P, H); b: (P,).  Supports the orchestrator's
    ``[:, lo:hi]`` column-slice patterns and ``.shape``/``.dtype``.
    """

    __slots__ = ("hidden", "w", "b", "summary", "w1", "b1")

    def __init__(self, hidden, w, b, summary=None, w1=None, b1=None):
        self.hidden = hidden
        self.w = w
        self.b = b
        # optional FULL-fusion pieces: hidden == tanh(summary @ w1.T + b1)
        # (set when the MLP is a plain one-hidden-layer tanh net) — the
        # whole-block kernels then read only the narrow summary from HBM
        self.summary = summary
        self.w1 = w1
        self.b1 = b1

    @property
    def shape(self):
        return (self.hidden.shape[0], self.w.shape[0])

    @property
    def dtype(self):
        return self.hidden.dtype

    @property
    def ndim(self):
        return 2

    def __getitem__(self, key):
        assert isinstance(key, tuple) and len(key) == 2 and \
            key[0] == slice(None) and isinstance(key[1], slice) and \
            key[1].step is None, f"unsupported lazy slice {key}"
        lo, hi, _ = key[1].indices(self.w.shape[0])
        return LazyParamSlab(self.hidden, self.w[lo:hi], self.b[lo:hi],
                             summary=self.summary, w1=self.w1, b1=self.b1)

    def materialize(self):
        return jnp.matmul(self.hidden, self.w.T,
                          precision=jax.lax.Precision.HIGHEST) + self.b

    def materialize_T(self):
        """Materialize TRANSPOSED: (P, B) = w @ hidden.T + b[:, None].

        The column fast path (layers/base.py supports_columns) wants the
        parameter slab param-major so each parameter is a contiguous (B,)
        row; producing it straight from the matmul avoids ever creating the
        tile-padded (B, P) orientation.  (A fully Pallas-fused variant that
        also kept the (B, H) hidden out of HBM was measured SLOWER than
        this XLA form — 0.67 vs 0.59 ms/1M forward, 1.27 vs 0.66 fwd+bwd,
        2026-08-20 — XLA already overlaps the two matmuls well; keep the
        XLA path.)"""
        return jnp.matmul(self.w, self.hidden.T,
                          precision=jax.lax.Precision.HIGHEST) + self.b[:, None]


def materialize_if_lazy(p):
    return p.materialize() if isinstance(p, LazyParamSlab) else p


def for_layer(sl, layer):
    """Materialize a sliced slab unless the layer consumes lazy slabs."""
    if isinstance(sl, LazyParamSlab) and \
            not getattr(layer, "accepts_lazy_params", False):
        return sl.materialize()
    return sl
