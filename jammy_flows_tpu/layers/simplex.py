"""Simplex flow layers: iterative autoregressive flow (w), Gumbel-softmax (u).

TPU-native reimplementation of layers/simplex/{simplex_base.py,
inner_loop_simplex.py,gumbel_softmax.py} (arXiv:2008.05456).
"""
from __future__ import annotations

import math

import numpy as np
import jax
import jax.numpy as jnp

from .base import FlowLayer
from ..ops import manifold
from ..ops import logistic_kde

LOG_SQRT_2PI = 0.5 * math.log(2.0 * math.pi)
SQRT2 = math.sqrt(2.0)


class SimplexLayer(FlowLayer):
    """Base for simplex layers: gauss <-> box <-> base simplex chain with
    exact log-dets (simplex_base.py:44-205)."""

    def __init__(self, dimension=1, always_parametrize_in_embedding_space=0,
                 project_from_gauss_to_simplex=0):
        super().__init__(dimension, always_parametrize_in_embedding_space)
        self.project_from_gauss_to_simplex = int(project_from_gauss_to_simplex)

    def forward(self, params, x, log_det):
        if self.project_from_gauss_to_simplex:
            x, log_det = manifold.gauss_to_box(x, log_det)
            x, log_det = manifold.box_to_skewed_box(x, log_det)
            x, log_det = manifold.box_to_base_simplex(x, log_det)
            if self.always_parametrize_in_embedding_space:
                x, log_det = manifold.base_simplex_to_canonical(x, log_det)
        return self._forward(params, x, log_det)

    def inverse(self, params, x, log_det):
        x, log_det = self._inverse(params, x, log_det)
        if self.project_from_gauss_to_simplex:
            if self.always_parametrize_in_embedding_space:
                x, log_det = manifold.canonical_simplex_to_base(x, log_det)
            x, log_det = manifold.base_simplex_to_box(x, log_det)
            x, log_det = manifold.skewed_box_to_box(x, log_det)
            x, log_det = manifold.box_to_gauss(x, log_det)
        return x, log_det

    @property
    def embedded_dim(self):
        return self.dimension + 1

    @property
    def base_dim(self):
        if self.always_parametrize_in_embedding_space and \
                not self.project_from_gauss_to_simplex:
            return self.dimension + 1
        return self.dimension

    def embedding_conditional_return(self, x):
        if x.shape[1] == self.dimension:
            x, _ = manifold.base_simplex_to_canonical(x, 0.0)
        return x

    def transform_target_space(self, x, log_det=0.0, transform_from="default",
                               transform_to="embedding"):
        """simplex_base.py:236-281."""
        currently_intrinsic = True
        if transform_from == "default":
            currently_intrinsic = not self.always_parametrize_in_embedding_space
        elif transform_from == "embedding":
            currently_intrinsic = False
        if transform_to == "default":
            want_intrinsic = not self.always_parametrize_in_embedding_space
        elif transform_to == "intrinsic":
            want_intrinsic = True
        else:
            want_intrinsic = False
        if currently_intrinsic and not want_intrinsic:
            return manifold.base_simplex_to_canonical(x, log_det)
        if (not currently_intrinsic) and want_intrinsic:
            return manifold.canonical_simplex_to_base(x, log_det)
        return x, log_det

    def _forward(self, params, x, log_det):
        raise NotImplementedError

    def _inverse(self, params, x, log_det):
        raise NotImplementedError


class InnerLoopSimplex(SimplexLayer):
    """Iterative autoregressive simplex flow - symbol "w"
    (inner_loop_simplex.py:14-127).

    Maps the base simplex to the skewed box and applies an internal
    fully-amortized passthrough PDF of per-dimension interval RQ-splines in
    box coordinates - recursive use of the orchestrator inside a layer.
    """

    def __init__(self, dimension=1, always_parametrize_in_embedding_space=0,
                 project_from_gauss_to_simplex=0):
        super().__init__(dimension, always_parametrize_in_embedding_space,
                         project_from_gauss_to_simplex)
        from ..models.pdf import PDF  # deferred: avoids import cycle
        self.inner_flow = PDF("+".join(["i1_0.0_1.0"] * dimension),
                              "+".join(["rr"] * dimension),
                              options_overwrite={"r": {"num_basis_functions": 10}},
                              amortize_everything=True,
                              amortization_mlp_use_custom_mode=True,
                              use_as_passthrough_instead_of_pdf=True)
        self.num_inner_params = self.inner_flow.total_number_amortizable_params
        self.num_params += self.num_inner_params

    def param_structure(self):
        return [("inner_flow_params", self.num_inner_params)]

    def _forward(self, params, x, log_det):
        if self.always_parametrize_in_embedding_space:
            x, log_det = manifold.canonical_simplex_to_base(x, log_det)
        x, log_det = manifold.base_simplex_to_box(x, log_det)
        x, log_det = self.inner_flow.all_layer_forward(
            {}, x, log_det, None, amortization_parameters=params)
        x, log_det = manifold.box_to_base_simplex(x, log_det)
        if self.always_parametrize_in_embedding_space:
            x, log_det = manifold.base_simplex_to_canonical(x, log_det)
        return x, log_det

    def _inverse(self, params, x, log_det):
        if self.always_parametrize_in_embedding_space:
            x, log_det = manifold.canonical_simplex_to_base(x, log_det)
        x, log_det = manifold.base_simplex_to_box(x, log_det)
        x, log_det = self.inner_flow.all_layer_inverse(
            {}, x, log_det, None, amortization_parameters=params)
        x, log_det = manifold.box_to_base_simplex(x, log_det)
        if self.always_parametrize_in_embedding_space:
            x, log_det = manifold.base_simplex_to_canonical(x, log_det)
        return x, log_det

    def default_params(self, rng=None):
        rng = rng or np.random.default_rng(0)
        return self.inner_flow.default_amortization_params(rng)


class GumbelSoftmax(SimplexLayer):
    """Gumbel-softmax simplex flow - symbol "u" (gumbel_softmax.py:14-411).

    Log-ratio transform to shifted Gumbel; temperature tau and class
    log-probs as parameters; Gumbel CDF -> inverse-normal pass reusing the
    Gaussianization-flow iCDF machinery.  Bypasses the gauss->simplex
    projection chain entirely (as the reference does).

    NOTE: the reference's forward log-det sums all_coords_log over the whole
    batch (gumbel_softmax.py:372, missing axis) - we use the per-item sum,
    which is the exact inverse of the backward factor.
    """

    def __init__(self, dimension=1, always_parametrize_in_embedding_space=0,
                 project_from_gauss_to_simplex=0):
        super().__init__(dimension, always_parametrize_in_embedding_space,
                         project_from_gauss_to_simplex)
        self.num_params += dimension + 2   # log_tau + (d+1) log_probs
        self.inverse_function_type = "inormal_partly_precise"

    def param_structure(self):
        return [("log_tau", 1), ("log_probs", self.dimension + 1)]

    def _unpack(self, params):
        return params[:, 0:1], params[:, 1:self.dimension + 2]

    @staticmethod
    def _gumbel_log_quantities(x):
        """(log_cdf, log_sf, log_pdf) of the standard Gumbel
        (gumbel_softmax.py:36-61)."""
        log_cdf = -jnp.exp(-x)
        log_pdf = -x - jnp.exp(-x)
        # log(1 - exp(-exp(-x))): for large x, sf ~ exp(-x)
        large = x > 5.0
        x_safe = jnp.where(large, 0.0, x)
        exact = jnp.log(-jnp.expm1(-jnp.exp(-x_safe)))
        log_sf = jnp.where(large, -x, exact)
        return log_cdf, log_sf, log_pdf

    def inverse(self, params, x, log_det):
        """Simplex (d intrinsic coords) -> standard normal
        (gumbel_softmax.py:250-316)."""
        log_tau, log_probs = self._unpack(params)
        d_plus_1 = 1.0 - jnp.sum(x, axis=1, keepdims=True)
        log_joined = jnp.log(jnp.maximum(
            jnp.concatenate([x, d_plus_1], axis=1), jnp.finfo(x.dtype).tiny))
        log_det = log_det + (self.dimension * log_tau[:, 0]
                             - jnp.sum(log_joined, axis=-1))
        transformed = jnp.exp(log_tau) * (log_joined[:, :-1]
                                          - jnp.log(jnp.maximum(d_plus_1, jnp.finfo(x.dtype).tiny)))
        normal_gumbel = transformed - log_probs[:, :-1] + log_probs[:, -1:]

        log_cdf, log_sf, log_pdf = self._gumbel_log_quantities(normal_gumbel)
        z = logistic_kde.icdf_pass(log_cdf, log_sf, self.inverse_function_type)
        dld = logistic_kde.icdf_log_derivative(log_cdf, log_sf, log_pdf,
                                               self.inverse_function_type)
        return z, log_det + jnp.sum(dld, axis=-1)

    def forward(self, params, z, log_det):
        """Standard normal -> simplex (gumbel_softmax.py:318-377)."""
        log_tau, log_probs = self._unpack(params)
        log_uniform = jax.scipy.stats.norm.logcdf(z)
        gumbel = -jnp.log(-log_uniform)
        log_det = log_det + jnp.sum(
            -jnp.log(-log_uniform) - log_uniform - LOG_SQRT_2PI - 0.5 * z**2,
            axis=-1)
        shifted = gumbel + log_probs[:, :-1] - log_probs[:, -1:]
        args = shifted / jnp.exp(log_tau)
        zeros = jnp.zeros((args.shape[0], 1), dtype=z.dtype)
        cat = jnp.concatenate([zeros, args], axis=1)
        lse = jax.scipy.special.logsumexp(cat, axis=1, keepdims=True)
        new_coords_log = args - lse
        all_coords_log = jnp.concatenate([new_coords_log, -lse], axis=1)
        log_det = log_det - (self.dimension * log_tau[:, 0]
                             - jnp.sum(all_coords_log, axis=-1))
        return jnp.exp(new_coords_log), log_det

    def default_params(self, rng=None):
        return np.zeros(self.dimension + 2)
