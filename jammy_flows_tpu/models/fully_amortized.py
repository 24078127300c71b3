"""Fully amortized PDF: one outer MLP predicts ALL parameters of an inner PDF.

TPU-native equivalent of the reference main/fully_amortized.py:22-278.  The
inner PDF is constructed with ``amortize_everything=True`` so every parameter
- including its internal amortization MLPs - arrives as one flat vector,
which the outer AmortizableMLP predicts from the conditional input.
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
                 amortization_mlp_dims="128",
                 predict_log_normalization=False,
                 join_poisson_and_pdf_description=False,
                 amortization_mlp_use_custom_mode=True,
                 amortization_mlp_ranks=0,
                 amortization_mlp_highway_mode=0,
                 custom_mlp_highway_mode=0,
                 rank_of_amortization_mlp=0):
        assert conditional_input_dim is not None, \
            "fully amortized PDF requires conditional input"
        self.conditional_input_dim = conditional_input_dim
        self.predict_log_normalization = predict_log_normalization

        # inner PDF: everything amortized (fully_amortized.py:79-90)
        self.inner_pdf = PDF(pdf_defs, flow_defs,
                             options_overwrite=options_overwrite or {},
                             conditional_input_dim=None,
                             amortization_mlp_use_custom_mode=True,
                             amortization_mlp_ranks=amortization_mlp_ranks,
                             amortization_mlp_highway_mode=amortization_mlp_highway_mode,
                             amortize_everything=True)

        num_out = self.inner_pdf.total_number_amortizable_params
        if num_out is None:
            num_out = sum(sum(npl) for npl in self.inner_pdf.num_parameter_list)
        self.num_inner_params = num_out
        extra = 1 if predict_log_normalization else 0

        self.outer_mlp = AmortizableMLP(conditional_input_dim,
                                        list_from_str(amortization_mlp_dims),
                                        num_out + extra,
                                        highway_mode=custom_mlp_highway_mode,
                                        low_rank_approximations=rank_of_amortization_mlp,
                                        svd_mode="smart")

    def init_params(self, seed=0, dtype=None):
        dtype = dtype or (jnp.float64 if jax.config.jax_enable_x64 else jnp.float32)
        rng = np.random.default_rng(seed)
        desired = np.concatenate(
            [l.default_params(rng) for layers in self.inner_pdf.layer_list
             for l in layers])
        # MLP-of-MLP: desired bias covers only the directly-amortized flow
        # params of sub-pdf 0 when there is no inner encoder; inner MLP blocks
        # get standard init through the outer final bias.
        fix_bias = np.zeros(self.outer_mlp.output_dim)
        n_direct = min(len(desired), len(fix_bias))
        fix_bias[:n_direct] = desired[:n_direct]
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

    def log_mean_poisson(self, params, conditional_input=None):
        assert self.predict_log_normalization
        _, log_lambda = self._inner_amortization(params, conditional_input)
        return log_lambda

    def count_parameters(self):
        return self.outer_mlp.num_params


fully_amortized_pdf = FullyAmortizedPDF
