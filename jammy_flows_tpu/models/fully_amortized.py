"""Fully amortized PDF: one outer MLP predicts ALL parameters of an inner PDF.

TPU-native equivalent of the reference main/fully_amortized.py:22-278.  The
inner PDF is constructed with ``amortize_everything=True`` so every parameter
- including its internal amortization MLPs - arrives as one flat vector,
which the outer AmortizableMLP predicts from the conditional input.

The constructor signature mirrors the reference exactly
(fully_amortized.py:24-39): ``inner_mlp_*`` kwargs configure the inner PDF's
autoregressive MLPs, ``amortization_mlp_*`` kwargs the single outer MLP
(reference defaults: inner highway mode 1, outer rank 5 in custom mode).
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from .amortizable_mlp import AmortizableMLP, list_from_str
from .pdf import PDF


class FullyAmortizedPDF:

    def __init__(self,
                 pdf_defs,
                 flow_defs,
                 options_overwrite=None,
                 conditional_input_dim=None,
                 inner_mlp_dims_sub_pdfs="128",
                 inner_mlp_ranks=0,
                 inner_mlp_highway_mode=1,
                 amortization_mlp_dims="128",
                 amortization_mlp_use_custom_mode=True,
                 amortization_mlp_ranks=5,
                 amortization_mlp_highway_mode=0,
                 predict_log_normalization=False):
        assert isinstance(conditional_input_dim, int), \
            "fully amortized PDF requires a single conditional input dim"
        self.conditional_input_dim = conditional_input_dim
        self.predict_log_normalization = predict_log_normalization

        # inner PDF: everything amortized (fully_amortized.py:79-90)
        self.inner_pdf = PDF(pdf_defs, flow_defs,
                             options_overwrite=options_overwrite or {},
                             conditional_input_dim=None,
                             amortization_mlp_dims=inner_mlp_dims_sub_pdfs,
                             amortization_mlp_use_custom_mode=True,
                             amortization_mlp_ranks=inner_mlp_ranks,
                             amortization_mlp_highway_mode=inner_mlp_highway_mode,
                             amortize_everything=True)

        num_out = self.inner_pdf.total_number_amortizable_params
        self.num_inner_params = num_out
        extra = 1 if predict_log_normalization else 0

        # non-custom mode in the reference is a plain Linear chain
        # (fully_amortized.py:113-131) == a full-rank highway-0
        # AmortizableMLP: identical math AND identical (w0,b0,w1,b1,...)
        # packing, so one code path serves both modes.
        if not amortization_mlp_use_custom_mode:
            amortization_mlp_ranks = 0
            amortization_mlp_highway_mode = 0
        self.outer_mlp = AmortizableMLP(
            conditional_input_dim,
            list_from_str(amortization_mlp_dims),
            num_out + extra,
            highway_mode=amortization_mlp_highway_mode,
            low_rank_approximations=amortization_mlp_ranks,
            svd_mode="smart")

    def init_params(self, seed=0, dtype=None, data=None):
        """Outer-MLP init whose final bias is pinned to the inner PDF's full
        desired amortization vector (flow params for sub-pdf 0, damped inner
        MLP inits for later sub-pdfs) with all upstream weights damped - the
        reference's init recipe (fully_amortized.py:227-241)."""
        dtype = dtype or (jnp.float64 if jax.config.jax_enable_x64 else jnp.float32)
        rng = np.random.default_rng(seed)
        fix_bias = self.inner_pdf.default_amortization_params(
            rng, data=data)
        if self.predict_log_normalization:
            fix_bias = np.concatenate([fix_bias, np.zeros(1)])
        init = self.outer_mlp.default_init(rng, fix_final_bias=fix_bias,
                                           prev_damping_factor=1000.0)
        return {"outer_mlp": jnp.asarray(init, dtype=dtype)}

    def _inner_amortization(self, params, conditional_input):
        out = self.outer_mlp.apply(params["outer_mlp"][None, :], conditional_input)
        if self.predict_log_normalization:
            return out[:, :-1], out[:, -1:]
        return out, None

    def log_prob(self, params, x, conditional_input=None):
        amort, _ = self._inner_amortization(params, conditional_input)
        return self.inner_pdf.log_prob({}, x, conditional_input=None,
                                       amortization_parameters=amort)

    forward = log_prob
    __call__ = log_prob

    def sample(self, params, key, conditional_input=None):
        amort, _ = self._inner_amortization(params, conditional_input)
        return self.inner_pdf.sample({}, key,
                                     samplesize=conditional_input.shape[0],
                                     conditional_input=None,
                                     amortization_parameters=amort)

    def all_layer_forward(self, params, z, log_det, conditional_input=None):
        """Base -> target map through the amortized inner PDF."""
        amort, _ = self._inner_amortization(params, conditional_input)
        return self.inner_pdf.all_layer_forward(
            {}, z, log_det, conditional_input=None,
            amortization_parameters=amort)

    def all_layer_inverse(self, params, x, log_det, conditional_input=None):
        """Target -> base map through the amortized inner PDF."""
        amort, _ = self._inner_amortization(params, conditional_input)
        return self.inner_pdf.all_layer_inverse(
            {}, x, log_det, conditional_input=None,
            amortization_parameters=amort)

    def log_mean_poisson(self, params, conditional_input=None):
        assert self.predict_log_normalization
        _, log_lambda = self._inner_amortization(params, conditional_input)
        return log_lambda

    def count_parameters(self):
        return self.outer_mlp.num_params


fully_amortized_pdf = FullyAmortizedPDF
