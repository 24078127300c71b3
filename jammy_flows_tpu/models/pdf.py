"""The joint autoregressive manifold PDF orchestrator.

TPU-native redesign of the reference `jammy_flows.pdf` (main/default.py:44-
3968).  The class holds only *static configuration* (parsed DSL, layer
objects, MLP configs); all numerical state lives in an explicit parameter
pytree, and every computational method is a pure function of
``(params, inputs)`` - directly jit/vmap/grad-able and shardable with pjit.

Parameter pytree layout (dict of arrays):
    "flow_0"    : (P0,)  permanent params of sub-pdf 0 (non-conditional pdfs)
    "mlp_<k>"   : (Pk,)  packed AmortizableMLP params predicting sub-pdf k
    "log_lambda": (1,)   Poisson log-mean (if predict_log_normalization)

The autoregressive structure follows the reference exactly: density
evaluation runs all layers in reverse per sub-manifold
(default.py:879-1057), sampling runs them forward (default.py:1373-1531),
each later sub-manifold's MLP consumes [conditional_input, embeddings of all
previous sub-manifold values].
"""
from __future__ import annotations

import math
import os

import numpy as np
import jax
import jax.numpy as jnp

from .. import registry
from ..ops import manifold as manifold_ops
from ..ops.special import std_normal_log_prob
from ..ops.lazy_params import LazyParamSlab, for_layer as _for_layer, \
    materialize_if_lazy as _materialize
from .amortizable_mlp import AmortizableMLP, list_from_str
from .diagnostics import DiagnosticsMixin


def _pallas_on():
    from ..ops import pallas_gf
    return pallas_gf.pallas_available()


def _block_kernel_info(layers):
    """(prep, meta) when this sub-manifold's whole layer stack can run
    as ONE fused Pallas block kernel (ops/pallas_gf_block.py), else None."""
    from ..ops import pallas_gf_block
    return pallas_gf_block.block_meta(layers)


def _parse_subspace(token):
    """'e4' -> ('e', 4, None); 'i1_-1.0_1.0' -> ('i', 1, (-1.0, 1.0))."""
    parts = token.split("_")
    mtype = parts[0][0]
    dim = int(parts[0][1:])
    boundaries = None
    if mtype == "i":
        if len(parts) >= 3:
            boundaries = (float(parts[1]), float(parts[2]))
        else:
            boundaries = (0.0, 1.0)
    return mtype, dim, boundaries


def _resolve_flow_options(pdf_defs_list, flow_defs_list, options_overwrite,
                          verbose=False):
    """3-level option override precedence: (manifold,layer) tuple > manifold
    int > flow char (default.py:196-272)."""
    flow_opts = {}
    for ind, cur_flow_defs in enumerate(flow_defs_list):
        flow_opts[ind] = []
        for cur_flow_index, abbrv in enumerate(cur_flow_defs):
            opts = registry.obtain_default_options(abbrv)
            for opt, val in opts.items():
                registry.check_flow_option(abbrv, opt, val)

            found_specific = False
            for k, v in options_overwrite.items():
                if isinstance(k, tuple):
                    assert len(k) == 2 and all(isinstance(i, int) for i in k)
                    assert 0 <= k[0] < len(flow_defs_list)
                    if k[0] != ind or k[1] != cur_flow_index:
                        continue
                    assert len(v) == 1
                    found_specific = True
                    for detail_abbrv, detail_opts in v.items():
                        assert detail_abbrv == abbrv
                        for o, ov in detail_opts.items():
                            registry.check_flow_option(abbrv, o, ov)
                            opts[o] = ov
            if not found_specific:
                for k, v in options_overwrite.items():
                    if isinstance(k, int):
                        assert 0 <= k < len(flow_defs_list)
                        if k != ind:
                            continue
                        for detail_abbrv, detail_opts in v.items():
                            if detail_abbrv == abbrv:
                                found_specific = True
                                for o, ov in detail_opts.items():
                                    registry.check_flow_option(abbrv, o, ov)
                                    opts[o] = ov
            if not found_specific:
                for k, v in options_overwrite.items():
                    if isinstance(k, str) and k == abbrv:
                        for o, ov in v.items():
                            registry.check_flow_option(abbrv, o, ov)
                            opts[o] = ov
            flow_opts[ind].append(opts)
    return flow_opts


class PDF(DiagnosticsMixin):
    """Joint autoregressive (conditional) normalizing-flow PDF over products
    of manifolds, defined by a two-string DSL - e.g.
    ``PDF("e4+s2+e4", "gggg+f+gggg")``."""

    def __init__(self,
                 pdf_defs,
                 flow_defs,
                 options_overwrite=None,
                 conditional_input_dim=None,
                 amortization_mlp_dims="128",
                 predict_log_normalization=False,
                 join_poisson_and_pdf_description=False,
                 hidden_mlp_dims_poisson="128",
                 rank_of_mlp_mappings_poisson=0,
                 amortization_mlp_use_custom_mode=False,
                 amortization_mlp_ranks=0,
                 amortization_mlp_highway_mode=0,
                 amortize_everything=False,
                 use_as_passthrough_instead_of_pdf=False,
                 skip_mlp_initialization=False,
                 verbose=False):
        options_overwrite = options_overwrite or {}
        self.pdf_defs_list = pdf_defs.split("+")
        self.flow_defs_list = flow_defs.split("+")
        assert len(self.pdf_defs_list) == len(self.flow_defs_list), \
            (self.pdf_defs_list, self.flow_defs_list)

        self.conditional_input_dim = conditional_input_dim
        self.encoding_type = "multi" if isinstance(conditional_input_dim, list) \
            else "single"
        self.predict_log_normalization = predict_log_normalization
        self.join_poisson_and_pdf_description = join_poisson_and_pdf_description
        self.amortize_everything = amortize_everything
        self.use_as_passthrough_instead_of_pdf = use_as_passthrough_instead_of_pdf
        self.skip_mlp_initialization = skip_mlp_initialization
        self.amortization_mlp_highway_mode = amortization_mlp_highway_mode

        if self.amortize_everything:
            assert not self.predict_log_normalization, \
                "log-lambda prediction with full amortization only in fully_amortized_pdf"

        n_sub = len(self.pdf_defs_list)
        if isinstance(amortization_mlp_dims, str):
            self.amortization_mlp_dims = [amortization_mlp_dims] * n_sub
        else:
            self.amortization_mlp_dims = list(amortization_mlp_dims)
        assert len(self.amortization_mlp_dims) == n_sub
        if isinstance(amortization_mlp_ranks, (int, str)):
            self.amortization_mlp_ranks = [amortization_mlp_ranks] * n_sub
        else:
            self.amortization_mlp_ranks = list(amortization_mlp_ranks)

        self.force_permanent_parameters_in_first_subpdf = (
            conditional_input_dim is None and not amortize_everything)

        self.flow_opts = _resolve_flow_options(
            self.pdf_defs_list, self.flow_defs_list, options_overwrite, verbose)

        self._build_layers()
        self._update_embedding_structure()
        self._build_mlps(hidden_mlp_dims_poisson, rank_of_mlp_mappings_poisson)

    # ------------------------------------------------------------------
    # construction
    # ------------------------------------------------------------------
    def _build_layers(self):
        """Instantiate layer objects with auto-injected options
        (default.py:378-479)."""
        self.layer_list = []
        self.num_parameter_list = []
        for sub_idx, sub_def in enumerate(self.pdf_defs_list):
            mtype, dim, boundaries = _parse_subspace(sub_def)
            layers = []
            nparams = []
            flow_str = self.flow_defs_list[sub_idx]
            n_layers = len(flow_str)
            for layer_ind, sym in enumerate(flow_str):
                assert registry.manifold_type(sym) == mtype, \
                    f"layer {sym} incompatible with manifold {sub_def}"
                kwargs = dict(self.flow_opts[sub_idx][layer_ind])

                if mtype == "s":
                    kwargs["euclidean_to_sphere_as_first"] = int(
                        layer_ind == 0 and not self.use_as_passthrough_instead_of_pdf)
                elif mtype == "i":
                    kwargs["low_boundary"], kwargs["high_boundary"] = boundaries
                    kwargs["euclidean_to_interval_as_first"] = int(
                        layer_ind == 0 and not self.use_as_passthrough_instead_of_pdf)
                elif mtype == "a":
                    kwargs["project_from_gauss_to_simplex"] = int(
                        layer_ind == 0 and not self.use_as_passthrough_instead_of_pdf)
                elif mtype == "e":
                    if sym != "x":
                        if layer_ind == n_layers - 1 and \
                                kwargs.get("skip_model_offset", 0) == 0:
                            kwargs["model_offset"] = 1
                        elif layer_ind == 0 and sym in ("g", "h"):
                            if kwargs.get("replace_first_sigmoid_with_icdf", 0) > 0 \
                                    and kwargs.get("inverse_function_type") == "isigmoid":
                                kwargs["inverse_function_type"] = "inormal_partly_precise"
                kwargs.pop("skip_model_offset", None)
                kwargs.pop("replace_first_sigmoid_with_icdf", None)

                cls = registry.get_layer_class(sym)
                layer = cls(dim, **kwargs)
                layers.append(layer)
                nparams.append(layer.num_params)
            self.layer_list.append(layers)
            self.num_parameter_list.append(nparams)

    def _update_embedding_structure(self):
        """Dimension/index bookkeeping (default.py:481-567)."""
        self.target_dims_intrinsic = []
        self.target_dims_embedded = []
        self.target_dims = []
        self.target_dim_indices_intrinsic = []
        self.target_dim_indices_embedded = []
        self.target_dim_indices = []
        self.base_dim_indices = []
        ti = te = td = tb = 0
        for layers in self.layer_list:
            d_int = layers[-1].intrinsic_dim
            d_emb = layers[-1].embedded_dim
            use_emb = any(l.always_parametrize_in_embedding_space for l in layers)
            d_tgt = d_emb if use_emb else d_int
            d_base = layers[0].base_dim
            self.target_dims_intrinsic.append(d_int)
            self.target_dims_embedded.append(d_emb)
            self.target_dims.append(d_tgt)
            self.target_dim_indices_intrinsic.append((ti, ti + d_int))
            self.target_dim_indices_embedded.append((te, te + d_emb))
            self.target_dim_indices.append((td, td + d_tgt))
            self.base_dim_indices.append((tb, tb + d_base))
            ti += d_int; te += d_emb; td += d_tgt; tb += d_base
        self.total_target_dim_intrinsic = ti
        self.total_target_dim_embedded = te
        self.total_target_dim = td
        self.total_base_dim = tb

    def _build_mlps(self, hidden_mlp_dims_poisson, rank_of_mlp_mappings_poisson):
        """Build the per-sub-pdf amortization MLP configs (default.py:571-722)."""
        self.mlp_predictors = []
        self.total_number_amortizable_params = 0 if self.amortize_everything else None

        if self.join_poisson_and_pdf_description:
            assert len(self.pdf_defs_list) == 1
            assert self.conditional_input_dim is not None

        prev_extra_input_num = 0
        for k, _ in enumerate(self.pdf_defs_list):
            tot_pars = sum(self.num_parameter_list[k])
            emb_dim_k = self.layer_list[k][-1].embedded_dim

            if k == 0 and self.conditional_input_dim is None:
                self.mlp_predictors.append(None)
                prev_extra_input_num += emb_dim_k
                if self.amortize_everything:
                    self.total_number_amortizable_params += tot_pars
                continue
            if tot_pars == 0:
                self.mlp_predictors.append(None)
                prev_extra_input_num += emb_dim_k
                continue

            num_predicted = tot_pars
            if self.predict_log_normalization and k == 0 and \
                    self.join_poisson_and_pdf_description:
                num_predicted += 1

            summary_dim = prev_extra_input_num
            if self.conditional_input_dim is not None:
                if isinstance(self.conditional_input_dim, list):
                    summary_dim += self.conditional_input_dim[k]
                else:
                    summary_dim += self.conditional_input_dim

            mlp = AmortizableMLP(summary_dim,
                                 list_from_str(self.amortization_mlp_dims[k]),
                                 num_predicted,
                                 low_rank_approximations=self.amortization_mlp_ranks[k],
                                 highway_mode=self.amortization_mlp_highway_mode,
                                 svd_mode="smart")
            self.mlp_predictors.append(mlp)
            if self.amortize_everything:
                self.total_number_amortizable_params += mlp.num_params
            prev_extra_input_num += emb_dim_k

        # standalone Poisson log-lambda predictor (default.py:675-716)
        self.log_normalization_mlp = None
        if self.predict_log_normalization and \
                self.conditional_input_dim is not None and \
                not self.join_poisson_and_pdf_description:
            assert not self.amortize_everything
            cd = self.conditional_input_dim
            summary_dim = cd[0] if isinstance(cd, list) else cd
            self.log_normalization_mlp = AmortizableMLP(
                summary_dim, list_from_str(hidden_mlp_dims_poisson), 1,
                low_rank_approximations=rank_of_mlp_mappings_poisson,
                highway_mode=self.amortization_mlp_highway_mode,
                svd_mode="smart")

    # ------------------------------------------------------------------
    # parameters
    # ------------------------------------------------------------------
    def init_params(self, seed=0, dtype=None, data=None):
        """Build the parameter pytree.

        Layer desired-init vectors initialize permanent params directly; each
        amortization MLP gets kaiming init with its final bias pinned to the
        desired flow params and all upstream weights damped by 1000
        (default.py:1817-1952).

        If ``data`` (N, D) is given and sub-pdf 0 is Euclidean, its layer
        chain is initialized data-driven: GF KDE means from percentiles, PCA
        householder rotation, MVN covariance fit (extra_functions.py:179-409).
        """
        dtype = dtype or (jnp.float64 if jax.config.jax_enable_x64 else jnp.float32)
        rng = np.random.default_rng(seed)
        params = {}
        desired = [np.concatenate([l.default_params(rng) for l in layers])
                   if sum(self.num_parameter_list[k]) > 0 else np.zeros(0)
                   for k, layers in enumerate(self.layer_list)]

        if data is not None:
            assert self.pdf_defs_list[0][0] == "e", \
                "data-driven init requires a Euclidean first sub-pdf"
            from .init import find_init_pars_of_chained_blocks
            desired[0] = find_init_pars_of_chained_blocks(
                self.layer_list[0], np.asarray(data), rng)

        if self.amortize_everything:
            return params  # everything arrives via amortization_parameters

        for k, layers in enumerate(self.layer_list):
            if k == 0 and self.mlp_predictors[0] is None and \
                    self.force_permanent_parameters_in_first_subpdf:
                if desired[0].size:
                    params["flow_0"] = jnp.asarray(desired[0], dtype=dtype)
            elif self.mlp_predictors[k] is not None:
                fix_bias = desired[k]
                if self.predict_log_normalization and k == 0 and \
                        self.join_poisson_and_pdf_description:
                    fix_bias = np.concatenate([fix_bias, np.zeros(1)])
                init = self.mlp_predictors[k].default_init(
                    rng, fix_final_bias=fix_bias, prev_damping_factor=1000.0)
                params[f"mlp_{k}"] = jnp.asarray(init, dtype=dtype)

        if self.predict_log_normalization and not self.join_poisson_and_pdf_description:
            if self.log_normalization_mlp is not None:
                init = self.log_normalization_mlp.default_init(
                    rng, fix_final_bias=np.array([-1.0]),
                    prev_damping_factor=1000.0)
                params["poisson_mlp"] = jnp.asarray(init, dtype=dtype)
            else:
                params["log_lambda"] = jnp.zeros((1,), dtype=dtype)
        return params

    def default_amortization_params(self, rng=None, data=None):
        """Desired init vector for the FULL amortization slab of an
        ``amortize_everything`` PDF: raw desired layer params for sub-pdf 0
        (no internal MLP) and damped-final-bias MLP inits for later sub-pdfs.
        Length == total_number_amortizable_params.  ``data`` (N, D) triggers
        the data-driven init of a Euclidean first sub-pdf chain, as in
        init_params."""
        assert self.amortize_everything
        rng = rng or np.random.default_rng(0)
        parts = []
        for k, layers in enumerate(self.layer_list):
            if k == 0 and data is not None:
                assert self.pdf_defs_list[0][0] == "e", \
                    "data-driven init requires a Euclidean first sub-pdf"
                from .init import find_init_pars_of_chained_blocks
                desired = find_init_pars_of_chained_blocks(
                    layers, np.asarray(data), rng)
                parts.append(desired)
                continue
            desired = [l.default_params(rng) for l in layers]
            desired = np.concatenate(desired) if desired else np.zeros(0)
            if self.mlp_predictors[k] is None:
                parts.append(desired)
            else:
                parts.append(self.mlp_predictors[k].default_init(
                    rng, fix_final_bias=desired, prev_damping_factor=1000.0))
        vec = np.concatenate(parts) if parts else np.zeros(0)
        assert len(vec) == self.total_number_amortizable_params, \
            (len(vec), self.total_number_amortizable_params)
        return vec

    def count_parameters(self, params=None):
        total = 0
        for k in range(len(self.layer_list)):
            if self.mlp_predictors[k] is not None:
                total += self.mlp_predictors[k].num_params
            elif k == 0 and self.force_permanent_parameters_in_first_subpdf:
                total += sum(self.num_parameter_list[0])
        if self.predict_log_normalization and not self.join_poisson_and_pdf_description:
            if self.log_normalization_mlp is not None:
                total += self.log_normalization_mlp.num_params
            else:
                total += 1
        return total

    # ------------------------------------------------------------------
    # conditioning / parameter prediction
    # ------------------------------------------------------------------
    def _predict_extra_params(self, params, k, data_summary_parts,
                              conditional_input, amortization_parameters,
                              amort_counter):
        """Return ((Bp, P_k) parameter slab or None, new amort_counter)."""
        mlp = self.mlp_predictors[k]
        if mlp is not None:
            parts = []
            if conditional_input is not None:
                ci = conditional_input[k] if isinstance(conditional_input, list) \
                    else conditional_input
                parts.append(ci)
            parts.extend(data_summary_parts)
            assert parts, "autoregressive conditioning input required"
            summary = jnp.concatenate(parts, axis=1) if len(parts) > 1 else parts[0]
            if amortization_parameters is not None:
                n = mlp.num_params
                assert amortization_parameters.shape[1] >= amort_counter + n, \
                    ("amortization slab too narrow",
                     amortization_parameters.shape, amort_counter, n)
                flat = amortization_parameters[:, amort_counter:amort_counter + n]
                amort_counter += n
                extra = mlp.apply(flat, summary)
            else:
                flat = params[f"mlp_{k}"][None, :]
                # lazy slab: keep the final (hidden -> P) matmul symbolic so
                # kernel-capable layers run it in VMEM and the (B, P) tensor
                # never touches HBM (ops/lazy_params.py); everyone else
                # materializes their column slice (same values, same grads)
                if summary.dtype == jnp.float32 and \
                        mlp.supports_penultimate(flat) and _pallas_on():
                    hidden, w_fin, b_fin = mlp.apply_penultimate(flat, summary)
                    fusion = {}
                    if mlp.supports_full_fusion(flat):
                        w1, b1 = mlp.first_layer_weights(flat)
                        fusion = dict(summary=summary, w1=w1, b1=b1)
                    extra = LazyParamSlab(hidden, w_fin, b_fin, **fusion)
                else:
                    extra = mlp.apply(flat, summary)
            if self.predict_log_normalization and k == 0 and \
                    self.join_poisson_and_pdf_description:
                extra = extra[:, :extra.shape[1] - 1]
            return extra, amort_counter

        # no MLP: permanent or fully-amortized first sub-pdf
        tot = sum(self.num_parameter_list[k])
        if tot == 0:
            return None, amort_counter
        if self.amortize_everything:
            assert amortization_parameters is not None
            assert amortization_parameters.shape[1] >= amort_counter + tot, \
                ("amortization slab too narrow", amortization_parameters.shape,
                 amort_counter, tot)
            extra = amortization_parameters[:, amort_counter:amort_counter + tot]
            return extra, amort_counter + tot
        assert params["flow_0"].shape[-1] == tot, \
            ("flow_0 param vector length mismatch", params["flow_0"].shape, tot)
        return params["flow_0"][None, :], amort_counter

    # ------------------------------------------------------------------
    # core mappings
    # ------------------------------------------------------------------
    def _block_info(self, k):
        """Cached whole-block kernel eligibility for sub-manifold k."""
        cache = getattr(self, "_block_info_cache", None)
        if cache is None:
            cache = self._block_info_cache = {}
        if k not in cache:
            cache[k] = _block_kernel_info(self.layer_list[k])
        return cache[k]

    def _try_block_kernel(self, k, extra_params, this_target, direction):
        """Run sub-manifold k's whole gggg stack as ONE fused Pallas launch
        (ops/pallas_gf_block.py) when eligible.  Returns (out, ld_sum) with
        ld_sum pre-summed over dims, or None to use the per-layer path."""
        if this_target.dtype != jnp.float32 or not _pallas_on():
            return None
        info = self._block_info(k)
        if info is None or extra_params is None:
            return None
        prep, meta = info
        from ..ops import pallas_gf_block as blk
        if isinstance(extra_params, LazyParamSlab):
            if extra_params.w.shape[1] > blk.MAX_KERNEL_H:
                return None
            if extra_params.w1 is not None \
                    and extra_params.w1.shape[1] <= 128:
                # FULL MLP fusion: both matmuls in VMEM; HBM reads only the
                # narrow conditional summary instead of the (B, H) hidden
                fn = blk.gf_block_density_lazy2 if direction == "density" \
                    else blk.gf_block_sample_lazy2
                out, ld = fn(this_target, extra_params.summary,
                             extra_params.w1, extra_params.b1,
                             extra_params.w, extra_params.b[:, None],
                             prep, meta)
                return out, jnp.sum(ld, axis=-1)
            fn = blk.gf_block_density_lazy if direction == "density" \
                else blk.gf_block_sample_lazy
            out, ld = fn(this_target, extra_params.hidden, extra_params.w,
                         extra_params.b[:, None], prep, meta)
        elif getattr(extra_params, "ndim", 0) == 2 \
                and extra_params.shape[0] == 1:
            fn = blk.gf_block_density_perm if direction == "density" \
                else blk.gf_block_sample_perm
            out, ld = fn(this_target, extra_params[0], prep, meta)
        else:
            return None       # per-sample materialized slabs: per-layer path
        return out, jnp.sum(ld, axis=-1)

    # -- column fast path ---------------------------------------------------
    # TPU tile padding makes elementwise math on (B, 1)/(B, 2) arrays ~11x
    # slower than on flat (B,) arrays (measured v5e 2026-08-20, see
    # ops/splines.py).  Spherical/interval sub-manifolds whose layers all
    # implement the column protocol (layers/base.py supports_columns) run
    # their whole stack on coordinate columns, with the parameter slab
    # transposed to (P, Bp) so each parameter is a contiguous row — for lazy
    # slabs the transposed orientation comes straight out of the MLP matmul.
    def _cols_ok(self, k, direction="density"):
        if os.environ.get("JAMMY_DISABLE_COLUMNS"):
            return False       # debug/attribution kill-switch
        cache = getattr(self, "_cols_cache", None)
        if cache is None:
            cache = self._cols_cache = {}
        key = (k, direction,
               tuple(l.always_parametrize_in_embedding_space
                     for l in self.layer_list[k]))
        if key not in cache:
            cache[key] = all(l.supports_columns_dir(direction)
                             for l in self.layer_list[k])
        return cache[key]

    @staticmethod
    def _slab_T(extra_params):
        if extra_params is None:
            return None
        if isinstance(extra_params, LazyParamSlab):
            return extra_params.materialize_T()
        return extra_params.T

    def _zphi_ok(self, k, direction):
        """True when sub-manifold k is s2 and EVERY layer supports the
        (z, phi)-carrier column protocol (layers/sphere.py): z = cos(theta)
        rides between layers, so per-layer theta<->z trig and the
        rotations' log(sin) bookkeeping vanish (dA = dz dphi)."""
        if self.pdf_defs_list[k] != "s2":
            return False
        cache = getattr(self, "_zphi_cache", None)
        if cache is None:
            cache = self._zphi_cache = {}
        if (k, direction) not in cache:
            cache[(k, direction)] = all(
                getattr(l, "supports_zphi_dir", lambda d: False)(direction)
                for l in self.layer_list[k])
        return cache[(k, direction)]

    def _try_columns(self, k, extra_params, this_target, log_det, direction):
        """Run sub-manifold k's layer stack on flat coordinate columns.
        Returns (out, log_det) or None when any layer lacks column support.
        Slicing conventions mirror the row loops exactly (front for forward,
        back-reversed for inverse)."""
        if not self._cols_ok(k, direction):
            return None
        layers = self.layer_list[k]
        slab = self._slab_T(extra_params)
        if slab is None:
            slab = jnp.zeros((0, 1), dtype=this_target.dtype)
        cols = tuple(this_target[:, i] for i in range(this_target.shape[1]))
        cnt = 0
        zphi = self._zphi_ok(k, direction)
        if direction == "density":
            if zphi:
                # sub-manifold boundary is intrinsic (theta, phi): ONE
                # conversion into the (z, phi) measure for the whole stack
                theta = manifold_ops.safe_angle_within_pi(cols[0])
                log_det = log_det + jnp.log(jnp.sin(theta))
                cols = (jnp.cos(theta), cols[1])
            total = slab.shape[0]
            for layer in reversed(layers):
                p = layer.num_params
                hi = total - cnt
                step = layer.inverse_cols_z if zphi else layer.inverse_cols
                cols, log_det = step(slab[hi - p:hi], cols, log_det)
                cnt += p
            if zphi and not layers[0].euclidean_to_sphere_as_first:
                z = manifold_ops.safe_costheta(cols[0])
                theta = jnp.arccos(z)
                log_det = log_det - jnp.log(jnp.sin(
                    manifold_ops.safe_angle_within_pi(theta)))
                cols = (theta, cols[1])
        else:
            if zphi and not layers[0].euclidean_to_sphere_as_first:
                theta = manifold_ops.safe_angle_within_pi(cols[0])
                log_det = log_det + jnp.log(jnp.sin(theta))
                cols = (jnp.cos(theta), cols[1])
            for layer in layers:
                p = layer.num_params
                step = layer.forward_cols_z if zphi else layer.forward_cols
                cols, log_det = step(slab[cnt:cnt + p], cols, log_det)
                cnt += p
            if zphi:
                z = manifold_ops.safe_costheta(cols[0])
                theta = jnp.arccos(z)
                log_det = log_det - jnp.log(jnp.sin(
                    manifold_ops.safe_angle_within_pi(theta)))
                cols = (theta, cols[1])
        return jnp.stack(cols, axis=1), log_det

    def _apply_inverse_stack(self, k, extra_params, this_target, log_det):
        """Apply sub-manifold k's layer stack in the density direction:
        whole-block kernel, column fast path, or the per-layer row loop."""
        fused = self._try_block_kernel(k, extra_params, this_target,
                                       "density")
        if fused is not None:
            out, ld_sum = fused
            return out, log_det + ld_sum
        cols = self._try_columns(k, extra_params, this_target, log_det,
                                 "density")
        if cols is not None:
            return cols
        cnt = 0
        for layer in reversed(self.layer_list[k]):
            p = layer.num_params
            if extra_params is not None and p > 0:
                hi_p = extra_params.shape[1] - cnt
                sl = _for_layer(extra_params[:, hi_p - p:hi_p], layer)
            else:
                sl = None
            if sl is None:
                sl = jnp.zeros((this_target.shape[0], 0),
                               dtype=this_target.dtype)
            this_target, log_det = layer.inverse(sl, this_target, log_det)
            cnt += p
        return this_target, log_det

    def all_layer_inverse(self, params, x, log_det, conditional_input=None,
                          amortization_parameters=None,
                          force_embedding_coordinates=False,
                          force_intrinsic_coordinates=False):
        """Autoregressive target -> base mapping (default.py:879-1057)."""
        if force_embedding_coordinates:
            assert x.shape[1] == self.total_target_dim_embedded
            x, log_det = self.transform_target_space(
                x, log_det, transform_from="embedding", transform_to="default")
        elif force_intrinsic_coordinates:
            assert x.shape[1] == self.total_target_dim_intrinsic
            x, log_det = self.transform_target_space(
                x, log_det, transform_from="intrinsic", transform_to="default")
        else:
            assert x.shape[1] == self.total_target_dim, \
                (x.shape[1], self.total_target_dim)

        extra_conditional_input = []
        base_targets = []
        amort_counter = 0

        for k, layers in enumerate(self.layer_list):
            extra_params, amort_counter = self._predict_extra_params(
                params, k, extra_conditional_input, conditional_input,
                amortization_parameters, amort_counter)

            lo, hi = self.target_dim_indices[k]
            this_target = x[:, lo:hi]

            this_target, log_det = self._apply_inverse_stack(
                k, extra_params, this_target, log_det)

            base_targets.append(this_target)
            prev_target = layers[-1].embedding_conditional_return(x[:, lo:hi])
            extra_conditional_input.append(prev_target)

        return jnp.concatenate(base_targets, axis=1), log_det

    def all_layer_forward(self, params, z, log_det, conditional_input=None,
                          amortization_parameters=None,
                          force_embedding_coordinates=False,
                          force_intrinsic_coordinates=False):
        """Autoregressive base -> target mapping (default.py:1373-1531)."""
        extra_conditional_input = []
        new_targets = []
        amort_counter = 0

        for k, layers in enumerate(self.layer_list):
            extra_params, amort_counter = self._predict_extra_params(
                params, k, extra_conditional_input, conditional_input,
                amortization_parameters, amort_counter)

            lo, hi = self.base_dim_indices[k]
            this_target = z[:, lo:hi]

            fused = self._try_block_kernel(k, extra_params, this_target,
                                           "sample")
            cols = None if fused is not None else self._try_columns(
                k, extra_params, this_target, log_det, "sample")
            if fused is not None:
                this_target, ld_sum = fused
                log_det = log_det - ld_sum
            elif cols is not None:
                this_target, log_det = cols
            else:
                cnt = 0
                for layer in layers:
                    p = layer.num_params
                    if extra_params is not None and p > 0:
                        sl = _for_layer(extra_params[:, cnt:cnt + p], layer)
                    else:
                        sl = jnp.zeros((this_target.shape[0], 0),
                                       dtype=this_target.dtype)
                    this_target, log_det = layer.forward(sl, this_target,
                                                         log_det)
                    cnt += p

            new_targets.append(this_target)
            prev_target = layers[-1].embedding_conditional_return(this_target)
            extra_conditional_input.append(prev_target)

        x = jnp.concatenate(new_targets, axis=1)
        if force_embedding_coordinates:
            x, log_det = self.transform_target_space(
                x, log_det, transform_from="default", transform_to="embedding")
        elif force_intrinsic_coordinates:
            x, log_det = self.transform_target_space(
                x, log_det, transform_from="default", transform_to="intrinsic")
        return x, log_det

    # ------------------------------------------------------------------
    # public API
    # ------------------------------------------------------------------
    # Large batches are rounded up to a multiple of 8192 rows so the fused
    # raw-parameter kernels can tile D*B into full (8, 1024) lane blocks for
    # every manifold dimension (ops/pallas_gf.py:_flat_geometry) and no
    # (K, D, B) pad-copies happen anywhere in the pipeline.  <=6% extra rows
    # at the 131072 threshold, ~0.8% at 1M; outputs are sliced back.
    _BATCH_ALIGN = 8192
    _BATCH_ALIGN_MIN = 131072

    def _round_batch(self, n, dtype):
        if dtype == jnp.float32 and n >= self._BATCH_ALIGN_MIN:
            return n + (-n) % self._BATCH_ALIGN
        return n

    @staticmethod
    def _pad_rows(a, n_new):
        """Pad a batch-major array to n_new rows by replicating row 0
        (always in-support, sliced away afterwards)."""
        if a is None or a.shape[0] == n_new:
            return a
        pad = n_new - a.shape[0]
        return jnp.concatenate(
            [a, jnp.broadcast_to(a[:1], (pad,) + a.shape[1:])], axis=0)

    def _pad_conditional(self, ci, n_new):
        if ci is None:
            return None
        if isinstance(ci, list):
            return [self._pad_rows(c, n_new) for c in ci]
        return self._pad_rows(ci, n_new)

    def log_prob(self, params, x, conditional_input=None,
                 amortization_parameters=None,
                 force_embedding_coordinates=False,
                 force_intrinsic_coordinates=False):
        """log p(x [| c]).  Returns (log_pdf, log_pdf_base, base_pos)
        (default.py:1059-1117)."""
        assert not self.use_as_passthrough_instead_of_pdf
        n = x.shape[0]
        n_run = self._round_batch(n, x.dtype)
        if n_run != n:
            lp, lb, bp = self.log_prob(
                params, self._pad_rows(x, n_run),
                self._pad_conditional(conditional_input, n_run),
                self._pad_rows(amortization_parameters, n_run),
                force_embedding_coordinates, force_intrinsic_coordinates)
            return lp[:n], lb[:n], bp[:n]
        log_det = jnp.zeros(x.shape[0], dtype=x.dtype)
        base_pos, log_det = self.all_layer_inverse(
            params, x, log_det, conditional_input,
            amortization_parameters=amortization_parameters,
            force_embedding_coordinates=force_embedding_coordinates,
            force_intrinsic_coordinates=force_intrinsic_coordinates)
        log_base = std_normal_log_prob(base_pos)
        return log_base + log_det, log_base, base_pos

    forward = log_prob
    __call__ = log_prob

    def nll_value_and_grad(self, params, x, conditional_input=None):
        """(mean conditional NLL, gradient pytree) — the fused training
        objective.

        Mathematically identical to
        ``jax.value_and_grad(lambda pp: -pdf.log_prob(pp, x, ci)[0].mean())``
        (pinned by tests/test_pallas_interpret.py and test_tpu_kernels.py),
        but each eligible gggg sub-manifold runs its density chain AND its
        backward in ONE Pallas launch with ANALYTIC cotangents: in the
        density direction the autoregressive conditioning consumes raw data
        (all_layer_inverse appends ``embedding_conditional_return(x_slice)``,
        never a computed output), so the per-sub-pdf NLL contributions
        decouple and the cotangent of a block's base output is exactly
        ``val/B`` (standard-normal base) and of its log-det ``-1/B`` —
        known before the loss value exists.  This skips the separate
        forward kernel launch the generic AD path pays (measured 2.9 of
        8.4 ms on the 262k conditional e4/gggg step).

        Ineligible structures (amortize_everything, Poisson heads,
        passthrough mode, non-f32, no TPU, non-block sub-manifolds) fall
        back to plain value_and_grad / per-sub-pdf AD with the same result.
        """
        def plain(pp):
            return -self.log_prob(pp, x,
                                  conditional_input=conditional_input)[0].mean()

        if (self.amortize_everything or self.predict_log_normalization
                or self.use_as_passthrough_instead_of_pdf
                or x.dtype != jnp.float32 or not _pallas_on()):
            return jax.value_and_grad(plain)(params)

        from ..ops import pallas_gf_block as blk
        n = x.shape[0]
        wv, wl = 1.0 / n, -1.0 / n

        # data summaries exactly as all_layer_inverse builds them
        summaries = []
        for k, layers in enumerate(self.layer_list):
            lo, hi = self.target_dim_indices[k]
            summaries.append(
                layers[-1].embedding_conditional_return(x[:, lo:hi]))

        loss = jnp.float32(0.0)
        grads = jax.tree.map(jnp.zeros_like, dict(params))
        log_c = 0.9189385332046727           # log sqrt(2 pi)

        for k, layers in enumerate(self.layer_list):
            lo, hi = self.target_dim_indices[k]
            this_target = x[:, lo:hi]
            parts = summaries[:k]
            extra_params, _ = self._predict_extra_params(
                params, k, parts, conditional_input, None, 0)

            info = self._block_info(k)
            fused_done = False
            if info is not None and extra_params is not None:
                prep, meta = info
                if isinstance(extra_params, LazyParamSlab):
                    if (extra_params.w.shape[1] <= blk.MAX_KERNEL_H
                            and extra_params.w1 is not None
                            and extra_params.w1.shape[1] <= 128):
                        val, ld_rows, _, gp = blk.gf_block_nll_lazy2(
                            this_target, extra_params.summary,
                            extra_params.w1, extra_params.b1,
                            extra_params.w, extra_params.b[:, None],
                            prep, meta, wv, wl)
                        # summary grads are zero by construction (raw data);
                        # map (gw1, gb1, gw, gb) back onto the flat MLP slab
                        # (1-hidden-layer highway-0 packing: [w1, b1, w, b])
                        _, gw1, gb1, gw, gb = gp
                        gflat = jnp.concatenate(
                            [gw1.ravel(), gb1, gw.ravel(), gb[:, 0]])
                        key = f"mlp_{k}"
                        assert gflat.shape == grads[key].shape
                        grads[key] = grads[key] + gflat
                        fused_done = True
                elif getattr(extra_params, "ndim", 0) == 2 \
                        and extra_params.shape[0] == 1:
                    val, ld_rows, _, (gpvec,) = blk.gf_block_nll_perm(
                        this_target, extra_params[0], prep, meta, wv, wl)
                    grads["flow_0"] = grads["flow_0"] + gpvec
                    fused_done = True

            if fused_done:
                loss = loss + (0.5 * val * val + log_c).sum(axis=-1).mean() \
                    - ld_rows.sum(axis=-1).mean()
                continue

            # fallback: AD just this sub-pdf (decoupled contributions)
            def sub_nll(pp, k=k, parts=tuple(parts), tt=this_target):
                ep, _ = self._predict_extra_params(
                    pp, k, list(parts), conditional_input, None, 0)
                ld = jnp.zeros(n, dtype=x.dtype)
                out, ld = self._apply_inverse_stack(k, ep, tt, ld)
                return -(std_normal_log_prob(out) + ld).mean()

            lk, gk = jax.value_and_grad(sub_nll)(params)
            loss = loss + lk
            grads = jax.tree.map(jnp.add, grads, dict(gk))

        return loss, grads

    def sample(self, params, key, samplesize=1, conditional_input=None,
               amortization_parameters=None,
               force_embedding_coordinates=False,
               force_intrinsic_coordinates=False,
               failsafe_crosscheck_tolerance=None,
               failsafe_rounds=3,
               dtype=None):
        """Ancestral sampling.  Returns (x, base_pos, log_pdf, log_pdf_base)
        (default.py:1300-1707; RNG via explicit jax.random key).

        failsafe_crosscheck_tolerance: if set, roundtrips each sample through
        log_prob and re-draws batch items whose forward/backward log-pdfs
        disagree beyond the tolerance - a fixed-round where-merge redesign of
        the reference's recursive recheck_sampling
        (extra_functions.py:413-537; hooks default.py:1682-1703).  Introduced
        for the numerically delicate `v` flow.
        """
        dtype = dtype or (jnp.float64 if jax.config.jax_enable_x64 else jnp.float32)
        if conditional_input is not None:
            ci0 = conditional_input[0] if isinstance(conditional_input, list) \
                else conditional_input
            n = ci0.shape[0]
            dtype = ci0.dtype
        else:
            n = samplesize

        n_run = self._round_batch(n, dtype)
        run_ci = self._pad_conditional(conditional_input, n_run)
        run_amort = self._pad_rows(amortization_parameters, n_run)

        def draw(key):
            z = jax.random.normal(key, (n_run, self.total_base_dim),
                                  dtype=dtype)
            log_base = std_normal_log_prob(z)
            log_det = jnp.zeros(n_run, dtype=dtype)
            x, log_det = self.all_layer_forward(
                params, z, log_det, run_ci,
                amortization_parameters=run_amort)
            return x, z, -log_det + log_base, log_base

        key, sub = jax.random.split(key)
        x, z, log_pdf, log_base = draw(sub)

        if failsafe_crosscheck_tolerance is not None:
            for _ in range(failsafe_rounds):
                lp_eval, _, _ = self.log_prob(
                    params, x, conditional_input=run_ci,
                    amortization_parameters=run_amort)
                bad = jnp.abs(lp_eval - log_pdf) > failsafe_crosscheck_tolerance
                key, sub = jax.random.split(key)
                x2, z2, lp2, lb2 = draw(sub)
                x = jnp.where(bad[:, None], x2, x)
                z = jnp.where(bad[:, None], z2, z)
                log_pdf = jnp.where(bad, lp2, log_pdf)
                log_base = jnp.where(bad, lb2, log_base)

        if force_embedding_coordinates:
            x, neg_ld = self.transform_target_space(
                x, jnp.zeros(n_run, dtype=dtype), transform_from="default",
                transform_to="embedding")
            log_pdf = log_pdf - neg_ld
        elif force_intrinsic_coordinates:
            x, neg_ld = self.transform_target_space(
                x, jnp.zeros(n_run, dtype=dtype), transform_from="default",
                transform_to="intrinsic")
            log_pdf = log_pdf - neg_ld
        if n_run != n:
            return x[:n], z[:n], log_pdf[:n], log_base[:n]
        return x, z, log_pdf, log_base

    def log_mean_poisson(self, params, conditional_input=None,
                         amortization_parameters=None):
        """Poisson log-mean head (default.py:832-877)."""
        assert self.predict_log_normalization, \
            "PDF was not initialized with predict_log_normalization"
        if conditional_input is None:
            return params["log_lambda"][None, :]
        ci = conditional_input[0] if isinstance(conditional_input, list) \
            else conditional_input
        if self.join_poisson_and_pdf_description:
            mlp = self.mlp_predictors[0]
            if amortization_parameters is not None:
                flat = amortization_parameters[:, :mlp.num_params]
            else:
                flat = params["mlp_0"][None, :]
            return mlp.apply(flat, ci)[:, -1:]
        # standalone Poisson MLP (the reference builds this MLP but leaves
        # its evaluation unimplemented, default.py:875-877; here it works)
        assert self.log_normalization_mlp is not None
        return self.log_normalization_mlp.apply(params["poisson_mlp"][None, :],
                                                ci)

    def get_embedding_flags(self):
        """Per-sub-pdf embedding flags (default.py:327-344)."""
        flags = []
        for layers in self.layer_list:
            flag = layers[0].always_parametrize_in_embedding_space
            assert all(l.always_parametrize_in_embedding_space == flag
                       for l in layers)
            flags.append(flag)
        return flags

    def set_embedding_flags(self, usement_flag, sub_pdf_index=None):
        """Switch sub-manifolds between embedding and intrinsic default
        parametrization (default.py:346-374).  Mutates static config - call
        outside jit and re-jit afterwards."""
        assert usement_flag in (True, False)
        for ind, layers in enumerate(self.layer_list):
            if sub_pdf_index is None or ind == sub_pdf_index:
                for l in layers:
                    l.always_parametrize_in_embedding_space = bool(usement_flag)
        self._update_embedding_structure()

    def obtain_flow_param_structure(self, params, conditional_input=None,
                                    predefined_target_input=None, key=None,
                                    amortization_parameters=None):
        """Current per-layer parameter structure along the sampling path,
        keyed "<k>_<flowstr>.<j>" (default.py:1119-1298).  Each entry holds
        the raw packed slab ("params") AND the reference-style NAMED tensors
        ("named": {"log_widths": ..., "means": ..., ...}, split according to
        each layer's param_structure())."""
        key = key if key is not None else jax.random.PRNGKey(0)
        dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
        if conditional_input is not None:
            ci0 = conditional_input[0] if isinstance(conditional_input, list) \
                else conditional_input
            n = ci0.shape[0]
        else:
            n = 1
        if predefined_target_input is not None:
            z = predefined_target_input
        else:
            z = jax.random.normal(key, (n, self.total_base_dim), dtype=dtype)

        structure = {}
        extra_conditional_input = []
        amort_counter = 0
        log_det = jnp.zeros(z.shape[0], dtype=z.dtype)
        for k, layers in enumerate(self.layer_list):
            extra_params, amort_counter = self._predict_extra_params(
                params, k, extra_conditional_input, conditional_input,
                amortization_parameters, amort_counter)
            lo, hi = self.base_dim_indices[k]
            this_target = z[:, lo:hi]
            cnt = 0
            for j, layer in enumerate(layers):
                p = layer.num_params
                if extra_params is not None and p > 0:
                    sl = _materialize(extra_params[:, cnt:cnt + p])
                else:
                    sl = jnp.zeros((this_target.shape[0], 0), dtype=z.dtype)
                name = f"{k:03d}_{self.flow_defs_list[k]}.{j:03d}"
                named = {}
                off = 0
                for pname, size in layer.param_structure():
                    named[pname] = sl[:, off:off + size]
                    off += size
                assert off == p, (name, off, p)
                structure[name] = {"params": sl,
                                   "named": named,
                                   "layer_type": type(layer).__name__,
                                   "num_params": p}
                this_target, log_det = layer.forward(sl, this_target, log_det)
                cnt += p
            prev_target = layers[-1].embedding_conditional_return(this_target)
            extra_conditional_input.append(prev_target)
        # consistency check mirroring test_general.py:563-588
        for k in range(len(self.layer_list)):
            tot = sum(v["num_params"] for name, v in structure.items()
                      if name.startswith(f"{k:03d}_"))
            assert tot == sum(self.num_parameter_list[k])
        return structure

    def get_total_embedding_dim(self):
        """Total embedding dimension of the joint PDF (default.py:1709-1716)."""
        return sum(layers[-1].embedded_dim for layers in self.layer_list)

    def transform_target_into_returnable_params(self, target):
        """Transform a target tensor from default to embedding
        parametrization (default.py:1719-1735)."""
        res, _ = self.transform_target_space(target)
        return res

    def transform_target_space(self, x, log_det=0.0, transform_from="default",
                               transform_to="embedding"):
        """Convert the joint target vector between coordinate systems
        (default.py:1737-1813)."""
        if isinstance(log_det, float):
            log_det = jnp.zeros(x.shape[0], dtype=x.dtype)
        index_maps = {"default": self.target_dim_indices,
                      "intrinsic": self.target_dim_indices_intrinsic,
                      "embedding": self.target_dim_indices_embedded}
        src = index_maps[transform_from]
        outs = []
        for k, layers in enumerate(self.layer_list):
            lo, hi = src[k]
            part, log_det = layers[-1].transform_target_space(
                x[:, lo:hi], log_det, transform_from=transform_from,
                transform_to=transform_to)
            outs.append(part)
        return jnp.concatenate(outs, axis=1), log_det


# user-facing alias matching the reference's `jammy_flows.pdf`
pdf = PDF
