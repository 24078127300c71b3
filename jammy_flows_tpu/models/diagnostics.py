"""Diagnostics mixin for the PDF orchestrator: per-sub-manifold log-dets,
entropy (joint + marginals), chi^2 base-space coverage, pdf scans, and
marginal moments (Gaussian / vMF approximations).

TPU-native reimplementation of the reference diagnostics
(main/default.py:1954-3968, helper_fns/coverage.py).  The healpix
multiresolution scan is replaced by an equal-area Fibonacci-lattice scan on
S2 (healpy-free, static shapes).
"""
from __future__ import annotations

import math

import numpy as np
import jax
import jax.numpy as jnp

from ..ops.special import std_normal_log_prob
from ..ops.lazy_params import for_layer

LOG_SQRT_2PI = 0.5 * math.log(2.0 * math.pi)


class DiagnosticsMixin:
    """Mixed into models.pdf.PDF; uses its layer_list / index bookkeeping."""

    # ------------------------------------------------------------------
    # per-sub-manifold mappings (default.py:2713-3288)
    # ------------------------------------------------------------------
    def all_layer_forward_subdims(self, params, z, conditional_input=None,
                                  amortization_parameters=None,
                                  force_embedding_coordinates=False,
                                  force_intrinsic_coordinates=False):
        """Base -> target keeping a separate log-det per sub-manifold.

        Returns (x, log_det_dict) with integer keys per sub-manifold plus
        "total" (default.py:2979-3214).
        """
        extra_conditional_input = []
        new_targets = []
        log_det_dict = {}
        amort_counter = 0

        for k, layers in enumerate(self.layer_list):
            extra_params, amort_counter = self._predict_extra_params(
                params, k, extra_conditional_input, conditional_input,
                amortization_parameters, amort_counter)
            lo, hi = self.base_dim_indices[k]
            this_target = z[:, lo:hi]
            ld_k = jnp.zeros(z.shape[0], dtype=z.dtype)

            cols = self._try_columns(k, extra_params, this_target, ld_k,
                                     "sample")
            if cols is not None:
                this_target, ld_k = cols
            else:
                cnt = 0
                for layer in layers:
                    p = layer.num_params
                    if extra_params is not None and p > 0:
                        sl = for_layer(extra_params[:, cnt:cnt + p], layer)
                    else:
                        sl = jnp.zeros((this_target.shape[0], 0),
                                       dtype=z.dtype)
                    this_target, ld_k = layer.forward(sl, this_target, ld_k)
                    cnt += p

            prev_target = layers[-1].embedding_conditional_return(this_target)
            extra_conditional_input.append(prev_target)

            if force_embedding_coordinates:
                this_target, ld_k = layers[-1].transform_target_space(
                    this_target, ld_k, transform_from="default",
                    transform_to="embedding")
            elif force_intrinsic_coordinates:
                this_target, ld_k = layers[-1].transform_target_space(
                    this_target, ld_k, transform_from="default",
                    transform_to="intrinsic")
            new_targets.append(this_target)
            log_det_dict[k] = ld_k

        log_det_dict["total"] = sum(log_det_dict[k]
                                    for k in range(len(self.layer_list)))
        return jnp.concatenate(new_targets, axis=1), log_det_dict

    def all_layer_inverse_subdims(self, params, x, conditional_input=None,
                                  amortization_parameters=None,
                                  force_embedding_coordinates=False,
                                  force_intrinsic_coordinates=False):
        """Target -> base with per-sub-manifold log-dets
        (default.py:2713-2901)."""
        if force_embedding_coordinates:
            index_map = self.target_dim_indices_embedded
        elif force_intrinsic_coordinates:
            index_map = self.target_dim_indices_intrinsic
        else:
            index_map = self.target_dim_indices

        extra_conditional_input = []
        base_targets = []
        log_det_dict = {}
        amort_counter = 0

        for k, layers in enumerate(self.layer_list):
            extra_params, amort_counter = self._predict_extra_params(
                params, k, extra_conditional_input, conditional_input,
                amortization_parameters, amort_counter)
            lo, hi = index_map[k]
            this_target = x[:, lo:hi]
            ld_k = jnp.zeros(x.shape[0], dtype=x.dtype)

            if force_embedding_coordinates:
                this_target, ld_k = layers[-1].transform_target_space(
                    this_target, ld_k, transform_from="embedding",
                    transform_to="default")
            elif force_intrinsic_coordinates:
                this_target, ld_k = layers[-1].transform_target_space(
                    this_target, ld_k, transform_from="intrinsic",
                    transform_to="default")

            default_target = this_target
            cols = self._try_columns(k, extra_params, this_target, ld_k,
                                     "density")
            if cols is not None:
                this_target, ld_k = cols
            else:
                cnt = 0
                for layer in reversed(layers):
                    p = layer.num_params
                    if extra_params is not None and p > 0:
                        hi_c = extra_params.shape[1] - cnt
                        sl = for_layer(extra_params[:, hi_c - p:hi_c], layer)
                    else:
                        sl = jnp.zeros((this_target.shape[0], 0),
                                       dtype=x.dtype)
                    this_target, ld_k = layer.inverse(sl, this_target, ld_k)
                    cnt += p

            base_targets.append(this_target)
            log_det_dict[k] = ld_k
            prev_target = layers[-1].embedding_conditional_return(default_target)
            extra_conditional_input.append(prev_target)

        log_det_dict["total"] = sum(log_det_dict[k]
                                    for k in range(len(self.layer_list)))
        return jnp.concatenate(base_targets, axis=1), log_det_dict

    def sample_with_subdim_logprobs(self, params, key, samplesize=1,
                                    conditional_input=None,
                                    force_embedding_coordinates=True,
                                    force_intrinsic_coordinates=False,
                                    failsafe_crosscheck_tolerance=None,
                                    failsafe_rounds=3,
                                    dtype=None):
        """Sample + per-sub-manifold log-probabilities
        (default.py:2903-2977).

        failsafe_crosscheck_tolerance: roundtrip each sample through
        log_prob and re-draw batch items whose forward/backward total
        log-pdfs disagree beyond the tolerance (fixed-round where-merge,
        default.py:2954-2974)."""
        dtype = dtype or (jnp.float64 if jax.config.jax_enable_x64
                          else jnp.float32)
        if conditional_input is not None:
            ci0 = conditional_input[0] if isinstance(conditional_input, list) \
                else conditional_input
            n = ci0.shape[0]
            dtype = ci0.dtype
        else:
            n = samplesize

        def draw(key):
            z = jax.random.normal(key, (n, self.total_base_dim), dtype=dtype)
            x, ld_dict = self.all_layer_forward_subdims(
                params, z, conditional_input,
                force_embedding_coordinates=force_embedding_coordinates,
                force_intrinsic_coordinates=force_intrinsic_coordinates)
            log_pdf_dict = {}
            for k in range(len(self.layer_list)):
                lo, hi = self.base_dim_indices[k]
                log_pdf_dict[k] = std_normal_log_prob(z[:, lo:hi]) - ld_dict[k]
            log_pdf_dict["total"] = std_normal_log_prob(z) - ld_dict["total"]
            return x, z, log_pdf_dict

        key, sub = jax.random.split(key)
        x, z, log_pdf_dict = draw(sub)

        if failsafe_crosscheck_tolerance is not None:
            for _ in range(failsafe_rounds):
                lp_eval, _, _ = self.log_prob(
                    params, x, conditional_input=conditional_input,
                    force_embedding_coordinates=force_embedding_coordinates,
                    force_intrinsic_coordinates=force_intrinsic_coordinates)
                bad = jnp.abs(lp_eval - log_pdf_dict["total"]) \
                    > failsafe_crosscheck_tolerance
                key, sub = jax.random.split(key)
                x2, z2, lpd2 = draw(sub)
                x = jnp.where(bad[:, None], x2, x)
                z = jnp.where(bad[:, None], z2, z)
                log_pdf_dict = {kk: jnp.where(bad, lpd2[kk], vv)
                                for kk, vv in log_pdf_dict.items()}
        return x, z, log_pdf_dict

    # ------------------------------------------------------------------
    # entropy (default.py:2263-2712)
    # ------------------------------------------------------------------
    def entropy(self, params, key, sub_manifolds=(-1,), conditional_input=None,
                samplesize=100, force_embedding_coordinates=True,
                force_intrinsic_coordinates=False,
                failsafe_crosscheck_tolerance=None):
        """Monte-Carlo entropy of the joint and/or marginal sub-manifold PDFs.

        Returns dict: {"total": (B,), k: (B,)} per requested index.  Marginal
        entropies for k>0 use the S x S conditioning-pair logsumexp trick
        (default.py:2391-2451).
        """
        batch_size = 1
        data_summary = None
        if conditional_input is not None:
            if isinstance(conditional_input, list):
                batch_size = conditional_input[0].shape[0]
                data_summary = [jnp.repeat(ci, samplesize, axis=0)
                                for ci in conditional_input]
            else:
                batch_size = conditional_input.shape[0]
                data_summary = jnp.repeat(conditional_input, samplesize, axis=0)

        targets, z, log_pdf_dict = self.sample_with_subdim_logprobs(
            params, key, samplesize * batch_size, data_summary,
            force_embedding_coordinates=force_embedding_coordinates,
            force_intrinsic_coordinates=force_intrinsic_coordinates,
            failsafe_crosscheck_tolerance=failsafe_crosscheck_tolerance)

        entropy_dict = {}
        for sub_mf in sub_manifolds:
            if sub_mf == -1:
                entropy_dict["total"] = -log_pdf_dict["total"].reshape(
                    -1, samplesize).mean(axis=1)
            elif sub_mf == 0:
                entropy_dict[0] = -log_pdf_dict[0].reshape(
                    -1, samplesize).mean(axis=1)
            else:
                entropy_dict[sub_mf] = self._marginal_entropy(
                    params, targets, data_summary, sub_mf, samplesize,
                    batch_size, force_embedding_coordinates,
                    force_intrinsic_coordinates, iterative_samplesize=samplesize)
        return entropy_dict

    def _marginal_entropy(self, params, targets, data_summary, sub_mf,
                          samplesize, batch_size, force_emb, force_intr,
                          iterative_samplesize):
        """Marginal entropy of sub-manifold k>0: for each of its samples,
        average the conditional density over the S conditioning samples."""
        if force_emb:
            dims = self.target_dims_embedded
            index_map = self.target_dim_indices_embedded
        elif force_intr:
            dims = self.target_dims_intrinsic
            index_map = self.target_dim_indices_intrinsic
        else:
            dims = self.target_dims
            index_map = self.target_dim_indices

        first_len = sum(dims[:sub_mf])
        lo, hi = index_map[sub_mf]
        d_mf = hi - lo
        total_len = targets.shape[1]

        num_steps = samplesize // iterative_samplesize
        chunks = []
        for step in range(num_steps):
            # conditioning block: tile all S first-part samples
            first = targets[:, :first_len].reshape(-1, samplesize, first_len)
            first = jnp.tile(first, (1, iterative_samplesize, 1)).reshape(
                -1, first_len)
            # marginal block: each selected sample against all S conditioners
            final = targets[:, lo:hi].reshape(-1, samplesize, d_mf)
            final = final[:, step * iterative_samplesize:
                          (step + 1) * iterative_samplesize, :]
            final = jnp.repeat(final, samplesize, axis=1).reshape(-1, d_mf)

            joint = jnp.concatenate([first, final], axis=1)
            fill = total_len - joint.shape[1]
            filled = jnp.concatenate(
                [joint, jnp.ones((joint.shape[0], fill), dtype=joint.dtype)],
                axis=1)

            if data_summary is None:
                ds = None
            elif isinstance(data_summary, list):
                ds = [jnp.repeat(d, iterative_samplesize, axis=0)
                      for d in data_summary]
            else:
                ds = jnp.repeat(data_summary, iterative_samplesize, axis=0)

            base_vals, ld_dict = self.all_layer_inverse_subdims(
                params, filled, ds,
                force_embedding_coordinates=force_emb,
                force_intrinsic_coordinates=force_intr)
            blo, bhi = self.base_dim_indices[sub_mf]
            log_g = std_normal_log_prob(base_vals[:, blo:bhi])
            lp = (log_g + ld_dict[sub_mf]).reshape(-1, iterative_samplesize,
                                                   samplesize)
            lp = jax.scipy.special.logsumexp(lp, axis=-1) - math.log(samplesize)
            chunks.append(lp)
        log_probs = jnp.concatenate(chunks, axis=1)
        return -log_probs.mean(axis=1)

    def entropy_iterative(self, params, key, sub_manifolds=(-1,),
                          conditional_input=None, samplesize=100,
                          iterative_samplesize=10, max_iterative_batchsize=20,
                          force_embedding_coordinates=True,
                          force_intrinsic_coordinates=False,
                          failsafe_crosscheck_tolerance=None,
                          return_samples=False):
        """Memory-bounded entropy: chunks the marginal S x S evaluation over
        target samples and batch items (default.py:2456-2712)."""
        assert samplesize % iterative_samplesize == 0
        batch_size = 1
        data_summary = None
        if conditional_input is not None:
            if isinstance(conditional_input, list):
                batch_size = conditional_input[0].shape[0]
                data_summary = [jnp.repeat(ci, samplesize, axis=0)
                                for ci in conditional_input]
            else:
                batch_size = conditional_input.shape[0]
                data_summary = jnp.repeat(conditional_input, samplesize, axis=0)

        targets, z, log_pdf_dict = self.sample_with_subdim_logprobs(
            params, key, samplesize * batch_size, data_summary,
            force_embedding_coordinates=force_embedding_coordinates,
            force_intrinsic_coordinates=force_intrinsic_coordinates,
            failsafe_crosscheck_tolerance=failsafe_crosscheck_tolerance)

        entropy_dict = {}
        for sub_mf in sub_manifolds:
            if sub_mf == -1:
                entropy_dict["total"] = -log_pdf_dict["total"].reshape(
                    -1, samplesize).mean(axis=1)
            elif sub_mf == 0:
                entropy_dict[0] = -log_pdf_dict[0].reshape(
                    -1, samplesize).mean(axis=1)
            else:
                # batch chunking
                per_batch = samplesize
                n_batch_steps = max(1, math.ceil(batch_size
                                                 / max_iterative_batchsize))
                parts = []
                for bstep in range(n_batch_steps):
                    sl = slice(bstep * max_iterative_batchsize * per_batch,
                               (bstep + 1) * max_iterative_batchsize * per_batch)
                    t_slice = targets[sl]
                    if data_summary is None:
                        ds = None
                    elif isinstance(data_summary, list):
                        ds = [d[sl] for d in data_summary]
                    else:
                        ds = data_summary[sl]
                    ent = self._marginal_entropy(
                        params, t_slice, ds, sub_mf, samplesize,
                        t_slice.shape[0] // samplesize,
                        force_embedding_coordinates,
                        force_intrinsic_coordinates, iterative_samplesize)
                    parts.append(ent)
                entropy_dict[sub_mf] = jnp.concatenate(parts, axis=0)
        if return_samples:
            return entropy_dict, targets, log_pdf_dict
        return entropy_dict

    # ------------------------------------------------------------------
    # coverage (default.py:1954-2257, helper_fns/coverage.py)
    # ------------------------------------------------------------------
    def approximate_coverage(self, params, target_x, conditional_input=None,
                             amortization_parameters=None,
                             force_embedding_coordinates=False,
                             force_intrinsic_coordinates=False,
                             num_percentile_points=100, sub_manifolds=(-1,)):
        """chi^2 base-space coverage: 2*(logp(0) - logp(z_base)) should be
        chi^2(dim)-distributed for calibrated posteriors."""
        from scipy.stats import chi2

        return_dict = {"true": {}, "logprob_diffs": {}, "chi2_cdf_evals": {}}
        expected = np.linspace(0, 1.0, num_percentile_points)
        return_dict["expected"] = expected

        _, logp_base, base_points = self.log_prob(
            params, target_x, conditional_input=conditional_input,
            amortization_parameters=amortization_parameters,
            force_embedding_coordinates=force_embedding_coordinates,
            force_intrinsic_coordinates=force_intrinsic_coordinates)

        def coverage(logp_base_np, ndim):
            diffs = 2.0 * (0.0 - (np.asarray(logp_base_np)
                                  + ndim * LOG_SQRT_2PI))
            diffs = np.maximum(diffs, 0.0)
            chi2_evals = chi2.cdf(diffs, df=ndim)
            actual = np.asarray(
                [np.mean(chi2_evals <= e) for e in expected])
            return actual, diffs, chi2_evals

        if -1 in sub_manifolds:
            tc, ld, ce = coverage(logp_base, self.total_base_dim)
            return_dict["true"]["total"] = tc
            return_dict["logprob_diffs"]["total"] = ld
            return_dict["chi2_cdf_evals"]["total"] = ce

        for sm in sub_manifolds:
            if sm == -1:
                continue
            lo, hi = self.base_dim_indices[sm]
            sub_lp = std_normal_log_prob(base_points[:, lo:hi])
            tc, ld, ce = coverage(sub_lp, hi - lo)
            return_dict["true"][int(sm)] = tc
            return_dict["logprob_diffs"][int(sm)] = ld
            return_dict["chi2_cdf_evals"][int(sm)] = ce
        return return_dict

    def coverage_and_or_pdf_scan(self, params, labels=None,
                                 conditional_input=None,
                                 amortization_parameters=None,
                                 coverage_num_percentile_points=100,
                                 exact_coverage_calculation=False,
                                 save_pdf_scan=False, calculate_MAP=False,
                                 samples_per_event=10000, key=None):
        """Grid/lattice pdf scans: HPD coverage and MAP extraction
        (default.py:2024-2257).  S2 scans use an equal-area Fibonacci lattice
        instead of healpix."""
        key = key if key is not None else jax.random.PRNGKey(0)
        return_dict = {}
        batch_size = 1 if conditional_input is None else (
            conditional_input[0].shape[0] if isinstance(conditional_input, list)
            else conditional_input.shape[0])

        embedded_labels = None
        if labels is not None:
            embedded_labels = labels
            if labels.shape[1] == self.total_target_dim_intrinsic:
                embedded_labels, _ = self.transform_target_space(
                    labels, 0.0, transform_from="intrinsic",
                    transform_to="embedding")
            cov = self.approximate_coverage(
                params, embedded_labels, conditional_input=conditional_input,
                amortization_parameters=amortization_parameters,
                force_embedding_coordinates=True,
                num_percentile_points=coverage_num_percentile_points)
            return_dict["approx_cov_values"] = cov["chi2_cdf_evals"]["total"]
            return_dict["logprob_diffs_base"] = cov["logprob_diffs"]["total"]
            lp_t, lp_b, _ = self.log_prob(
                params, embedded_labels, conditional_input=conditional_input,
                force_embedding_coordinates=True)
            return_dict["log_pdf_labels"] = lp_t
            return_dict["log_pdf_base_labels"] = lp_b

        if not (exact_coverage_calculation or save_pdf_scan or calculate_MAP):
            return return_dict

        mtypes = {d[0] for d in self.pdf_defs_list}
        max_positions, real_cov_values = [], []
        scan_positions, scan_log_evals, scan_volumes = [], [], []

        def _repeat_ci(ci, reps):
            """Repeat-interleave conditional input so every batch item gets
            `reps` consecutive rows (ONE device dispatch for the whole
            batch, vs the reference's per-event loop default.py:2114)."""
            if ci is None:
                return None
            if isinstance(ci, list):
                return [jnp.repeat(c, reps, axis=0) for c in ci]
            return jnp.repeat(ci, reps, axis=0)

        dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32

        if mtypes == {"e"}:
            from ..utils import grid as grid_utils
            # dispatch 1: B*S samples in one call
            key, sub = jax.random.split(key)
            ci_rep = _repeat_ci(conditional_input, samples_per_event)
            samples, _, lp_s, _ = self.sample(
                params, sub, samplesize=samples_per_event * batch_size,
                conditional_input=ci_rep)
            samples = np.asarray(samples).reshape(
                batch_size, samples_per_event, -1)
            lp_s = np.asarray(lp_s).reshape(batch_size, samples_per_event)
            mi = np.argmax(lp_s, axis=1)
            max_positions = [samples[b, mi[b]:mi[b] + 1]
                             for b in range(batch_size)]

            # host-side: per-event grids from per-event percentile bounds
            npts = int(samples_per_event ** (1.0 / self.total_target_dim))
            grids, volumes = [], []
            for b in range(batch_size):
                bounds = grid_utils.percentile_bounds(samples[b], [0.5, 99.5])
                pos, vol = grid_utils.make_grid(bounds, npts)
                grids.append(pos)
                volumes.append(vol)
            g = grids[0].shape[0]
            all_pos = jnp.asarray(np.concatenate(grids, axis=0), dtype)

            # dispatch 2: all grids in one call
            lp_all, _, _ = self.log_prob(
                params, all_pos, conditional_input=_repeat_ci(
                    conditional_input, g))
            lp_all = np.asarray(lp_all).reshape(batch_size, g)

            for b in range(batch_size):
                positions, log_evals = grids[b], lp_all[b]
                bin_volume = volumes[b]
                if save_pdf_scan:
                    scan_positions.append(positions)
                    scan_log_evals.append(log_evals)
                    scan_volumes.append(bin_volume)
                if exact_coverage_calculation and labels is not None:
                    p = np.exp(log_evals)
                    order = np.argsort(p)[::-1]
                    lab = np.asarray(embedded_labels[b])
                    idx = np.argmin(np.linalg.norm(positions[order] - lab,
                                                   axis=1))
                    real_cov_values.append(
                        float(np.cumsum(p[order] * bin_volume)[idx]))
        elif mtypes == {"s"}:
            assert self.pdf_defs_list == ["s2"], "only s2 scans supported"
            n_pts = samples_per_event
            # equal-area Fibonacci lattice on S2
            i = np.arange(n_pts)
            golden = (1.0 + 5**0.5) / 2.0
            z = 1.0 - (2.0 * i + 1.0) / n_pts
            theta = np.arccos(np.clip(z, -1, 1))
            phi = np.mod(2.0 * np.pi * i / golden, 2.0 * np.pi)
            angles = np.stack([theta, phi], axis=1)
            area = 4.0 * np.pi / n_pts

            # ONE dispatch: every batch item scans the same lattice
            tiled = jnp.asarray(np.tile(angles, (batch_size, 1)), dtype)
            lp_all, _, _ = self.log_prob(
                params, tiled,
                conditional_input=_repeat_ci(conditional_input, n_pts),
                force_intrinsic_coordinates=True)
            lp_all = np.asarray(lp_all).reshape(batch_size, n_pts)
            xyz = None
            if exact_coverage_calculation and labels is not None:
                xyz_j, _ = self.transform_target_space(
                    jnp.asarray(angles, dtype), 0.0,
                    transform_from="intrinsic", transform_to="embedding")
                xyz = np.asarray(xyz_j)

            max_positions_angles = []
            for b in range(batch_size):
                lp = lp_all[b]
                if save_pdf_scan:
                    scan_positions.append(angles)
                    scan_log_evals.append(lp)
                    scan_volumes.append(np.full(n_pts, area))
                mi = int(np.argmax(lp))
                max_positions_angles.append(angles[mi:mi + 1])
                emb_max, _ = self.transform_target_space(
                    jnp.asarray(angles[mi:mi + 1], dtype), 0.0,
                    transform_from="intrinsic", transform_to="embedding")
                max_positions.append(np.asarray(emb_max))
                if exact_coverage_calculation and labels is not None:
                    order = np.argsort(lp)[::-1]
                    lab = np.asarray(embedded_labels[b])
                    idx = np.argmin(np.linalg.norm(xyz[order] - lab, axis=1))
                    real_cov_values.append(
                        float(np.cumsum(area * np.exp(lp[order]))[idx]))
            if calculate_MAP:
                return_dict["map_positions_angles"] = np.concatenate(
                    max_positions_angles)
        else:
            raise NotImplementedError(
                "pdf scans support pure-Euclidean or pure-s2 PDFs")

        if calculate_MAP:
            return_dict["map_positions"] = np.concatenate(max_positions)
        if exact_coverage_calculation and labels is not None:
            return_dict["real_cov_values"] = np.array(real_cov_values)
        if save_pdf_scan:
            return_dict["pdf_scan_positions"] = scan_positions
            return_dict["pdf_scan_log_evals"] = scan_log_evals
            return_dict["pdf_scan_volume_sizes"] = scan_volumes
        return return_dict

    # ------------------------------------------------------------------
    # marginal moments (default.py:3290-3968)
    # ------------------------------------------------------------------
    def marginal_moments_device(self, params, key, conditional_input=None,
                                samplesize=500):
        """Pure-jnp marginal moments: jit/shard-able, so the reduction runs
        where the samples live on a pod (the host-side `marginal_moments`
        pulls samples to numpy, which cannot shard).

        Returns a dict of DEVICE arrays: per sub-manifold ``mean_k`` and
        ``varlike_k`` (Euclidean covariance / spherical vMF kappa), plus
        ``entropy_gauss_approx_k`` / ``entropy_vmf_approx_k``.  Under a
        sharded conditional batch the per-item sample reductions are
        batch-local, so the whole computation shards trivially.
        """
        batch_size = 1 if conditional_input is None else (
            conditional_input[0].shape[0] if isinstance(conditional_input, list)
            else conditional_input.shape[0])
        data_summary = None
        if conditional_input is not None:
            if isinstance(conditional_input, list):
                data_summary = [jnp.repeat(ci, samplesize, axis=0)
                                for ci in conditional_input]
            else:
                data_summary = jnp.repeat(conditional_input, samplesize,
                                          axis=0)
        targets, _, _ = self.sample_with_subdim_logprobs(
            params, key, samplesize * batch_size, data_summary,
            force_embedding_coordinates=True)

        out = {}
        for k, sub_def in enumerate(self.pdf_defs_list):
            lo, hi = self.target_dim_indices_embedded[k]
            d = hi - lo
            sub = targets[:, lo:hi].reshape(batch_size, samplesize, d)
            mean = jnp.mean(sub, axis=1)
            if sub_def[0] == "e":
                c = sub - mean[:, None, :]
                cov = jnp.einsum("bsi,bsj->bij", c, c) / (samplesize - 1)
                out[f"mean_{k}"] = mean
                out[f"varlike_{k}"] = cov
                _, logdet = jnp.linalg.slogdet(cov)
                out[f"entropy_gauss_approx_{k}"] = 0.5 * (
                    d * (1.0 + math.log(2.0 * math.pi)) + logdet)
            elif sub_def in ("s1", "s2"):
                rbar = jnp.linalg.norm(mean, axis=-1)
                mean_dir = mean / jnp.maximum(rbar[:, None], 1e-12)
                p_dim = d  # embedding dim = p of the vMF
                kappa = _banerjee_kappa_jnp(rbar, p=p_dim)
                out[f"mean_{k}"] = mean_dir
                out[f"varlike_{k}"] = kappa
                if sub_def == "s2":
                    out[f"entropy_vmf_approx_{k}"] = _vmf_entropy_jnp(kappa)
            else:
                out[f"mean_{k}"] = mean
                out[f"varlike_{k}"] = jnp.var(sub, axis=1)
        return out

    def entropy_device(self, params, key, sub_manifolds=(-1,),
                       conditional_input=None, samplesize=100,
                       force_embedding_coordinates=True,
                       force_intrinsic_coordinates=False):
        """Fully traceable (jit / shard_map-able) entropy for pod-scale
        runs: every reduction is batch-local, so under a batch-sharded
        conditional input the whole computation (sampling, the S x S
        marginal conditioning-pair logsumexp, the final means) runs where
        the data lives with no host round trips and no cross-device
        collectives.

        Same expressions as :meth:`entropy` (the reference semantics at
        default.py:2391-2451); the host-side chunk loops of
        :meth:`entropy_iterative` (default.py:2456-2712) exist only to
        bound memory on a single device - under jit the S x S block is
        evaluated in one shot, so memory scales with B*S^2*D over the mesh.
        """
        ent = self.entropy(
            params, key, sub_manifolds=tuple(sub_manifolds),
            conditional_input=conditional_input, samplesize=samplesize,
            force_embedding_coordinates=force_embedding_coordinates,
            force_intrinsic_coordinates=force_intrinsic_coordinates,
            failsafe_crosscheck_tolerance=None)
        # string keys throughout: a jit output pytree cannot sort the host
        # API's mixed {"total", 0, 1, ...} dictionary keys
        return {str(k): v for k, v in ent.items()}

    def coverage_scan_device(self, params, labels, conditional_input=None,
                             samples_per_event=4096, key=None,
                             return_scan=False):
        """Device-side exact HPD coverage + MAP from a pdf scan, fully
        traceable: grid construction (per-event jnp percentile bounds for
        Euclidean PDFs, a shared equal-area Fibonacci lattice for s2),
        density evaluation, the HPD ordering (argsort) and the cumulative
        mass lookup all run in jnp with batch-local reductions, so the
        event axis shards over a pod mesh (the host-orchestrated
        counterpart is :meth:`coverage_and_or_pdf_scan`,
        default.py:2024-2257).

        labels: (B, intrinsic-dim) event positions.  Returns a dict of
        DEVICE arrays: ``real_cov_values`` (B,), ``map_positions`` (B, D);
        with return_scan also ``scan_positions``/``scan_log_evals``/
        ``scan_volumes``.
        """
        key = key if key is not None else jax.random.PRNGKey(0)
        mtypes = {d[0] for d in self.pdf_defs_list}
        batch_size = labels.shape[0]
        dtype = labels.dtype

        def _repeat_ci(ci, reps):
            if ci is None:
                return None
            if isinstance(ci, list):
                return [jnp.repeat(c, reps, axis=0) for c in ci]
            return jnp.repeat(ci, reps, axis=0)

        if mtypes == {"e"}:
            D = self.total_target_dim
            S = samples_per_event
            ci_rep = _repeat_ci(conditional_input, S)
            # same key discipline as coverage_and_or_pdf_scan so the two
            # produce identical sample sets (and hence identical grids)
            key, sub = jax.random.split(key)
            samples, _, lp_s, _ = self.sample(
                params, sub, samplesize=S * batch_size,
                conditional_input=ci_rep, dtype=dtype)
            samples = samples.reshape(batch_size, S, D)
            lp_s = lp_s.reshape(batch_size, S)
            mi = jnp.argmax(lp_s, axis=1)
            map_positions = jnp.take_along_axis(
                samples, mi[:, None, None], axis=1)[:, 0]

            # per-event rectangular grids from percentile bounds (mirrors
            # utils/grid.py percentile_bounds + make_grid, vectorized)
            npts = int(S ** (1.0 / D))
            lows = jnp.percentile(samples, 0.5, axis=1)    # (B, D)
            highs = jnp.percentile(samples, 99.5, axis=1)
            margin = (highs - lows) * 0.1
            lows, highs = lows - margin, highs + margin
            axes = np.meshgrid(*([np.linspace(0.0, 1.0, npts)] * D),
                               indexing="ij")
            unit = jnp.asarray(
                np.stack([m.ravel() for m in axes], axis=1), dtype)  # (g, D)
            g = unit.shape[0]
            positions = lows[:, None, :] + unit[None] \
                * (highs - lows)[:, None, :]               # (B, g, D)
            volumes = jnp.prod((highs - lows) / (npts - 1), axis=1)  # (B,)

            lp_all, _, _ = self.log_prob(
                params, positions.reshape(batch_size * g, D),
                conditional_input=_repeat_ci(conditional_input, g))
            lp_all = lp_all.reshape(batch_size, g)
            scan_positions, scan_volumes = positions, \
                volumes[:, None] * jnp.ones((1, g), dtype)
            emb_labels = labels
        elif mtypes == {"s"}:
            assert self.pdf_defs_list == ["s2"], "only s2 scans supported"
            g = samples_per_event
            i = np.arange(g)
            golden = (1.0 + 5**0.5) / 2.0
            zc = 1.0 - (2.0 * i + 1.0) / g
            theta = np.arccos(np.clip(zc, -1, 1))
            phi = np.mod(2.0 * np.pi * i / golden, 2.0 * np.pi)
            angles = jnp.asarray(np.stack([theta, phi], axis=1), dtype)
            area = 4.0 * np.pi / g

            tiled = jnp.tile(angles, (batch_size, 1))
            lp_all, _, _ = self.log_prob(
                params, tiled,
                conditional_input=_repeat_ci(conditional_input, g),
                force_intrinsic_coordinates=True)
            lp_all = lp_all.reshape(batch_size, g)
            xyz, _ = self.transform_target_space(
                angles, 0.0, transform_from="intrinsic",
                transform_to="embedding")                  # (g, 3)
            mi = jnp.argmax(lp_all, axis=1)
            map_positions = xyz[mi]
            positions = jnp.broadcast_to(xyz[None], (batch_size, g, 3))
            scan_positions = jnp.broadcast_to(angles[None],
                                              (batch_size, g, 2))
            scan_volumes = jnp.full((batch_size, g), area, dtype)
            if labels.shape[1] == 2:
                emb_labels, _ = self.transform_target_space(
                    labels, 0.0, transform_from="intrinsic",
                    transform_to="embedding")
            else:
                emb_labels = labels
            volumes = jnp.full((batch_size,), area, dtype)
        else:
            raise NotImplementedError(
                "pdf scans support pure-Euclidean or pure-s2 PDFs")

        def per_event(lp, pos, lab, vol):
            order = jnp.argsort(-lp)
            csum = jnp.cumsum(jnp.exp(lp[order]) * vol)
            cell = jnp.argmin(jnp.linalg.norm(pos[order] - lab[None],
                                              axis=1))
            return csum[cell]

        real_cov = jax.vmap(per_event)(lp_all, positions, emb_labels,
                                       volumes)
        out = {"real_cov_values": real_cov, "map_positions": map_positions}
        if return_scan:
            out["scan_positions"] = scan_positions
            out["scan_log_evals"] = lp_all
            out["scan_volumes"] = scan_volumes
        return out

    def _s2_scan_entropy(self, params, conditional_input, batch_size,
                         nside=32):
        """Scan-based entropy of a pure-s2 PDF: adaptive multiresolution
        scan (utils/grid.py:multires_s2_scan, the healpy-free equivalent of
        the reference's healpix entropy scan default.py:3521-3698), then
        H = -sum_i p_i a_i log p_i over the cells."""
        from ..utils.grid import multires_s2_scan
        assert self.pdf_defs_list == ["s2"], \
            "s2_entropy_scanning requires a pure-s2 PDF (default.py:3524)"
        n_base = 12 * nside * nside
        ents = []
        for b in range(batch_size):
            ci_b = None
            if conditional_input is not None:
                ci_b = conditional_input[b:b + 1] if not isinstance(
                    conditional_input, list) else conditional_input[0][b:b + 1]
            _, lp, areas = multires_s2_scan(self, params,
                                            conditional_input=ci_b,
                                            n_base=min(n_base, 49152),
                                            rounds=3)
            prob = np.exp(lp) * areas
            tot = prob.sum()
            assert abs(tot - 1.0) < 0.05, \
                (f"s2 entropy scan captured only {tot:.3f} probability mass; "
                 "increase s2_entropy_scan_nside")
            prob = prob / tot
            ents.append(-float(np.sum(prob * lp)))
        return np.asarray(ents)

    def marginal_moments(self, params, key, conditional_input=None,
                         samplesize=500, calc_kl_diff_and_entropic_quantities=False,
                         iterative_samplesize=10, max_iterative_batchsize=20,
                         mises_abs_precision=1e-7,
                         failsafe_crosscheck_tolerance=None,
                         s2_entropy_scanning=False, s2_entropy_scan_nside=32,
                         calc_zlp_kent_fit=False, return_samples=False):
        """Per-sub-manifold moments: Euclidean mean/cov (+ Gaussian-approx
        entropy), spherical mean direction + vMF kappa (Banerjee + Newton to
        ``mises_abs_precision`` on A_p(kappa)=rbar, default.py:3446-3469) and
        vMF entropy; optional exact-marginal entropies and KL(exact||approx)
        (option surface of default.py:3290-3303).

        s2_entropy_scanning: compute the exact entropy of a pure-s2 PDF from
        an adaptive multiresolution scan instead of Monte-Carlo sampling
        (reference healpix scan, default.py:3521-3698); moments still come
        from MC samples.  return_samples: adds ``samples_<k>`` (B, S, d_emb)
        and ``samples_<k>_angles`` for spheres.  failsafe_crosscheck_tolerance
        is passed to the sampling path (v-flow safety net).

        With ``calc_zlp_kent_fit=True``, every S2 sub-manifold additionally
        gets a batched maximum-likelihood zlp-Kent fit (Adam + damped-Newton
        fast path, utils/vmf_kent.py — the reference calls the analogous
        fit from marginal_moments at default.py:3859-3866): keys
        ``zlp_kent_pars_<k>`` (gamma1/2/3, kappa, u, loglike, grad_norm) and,
        when the exact marginal entropy is computed, ``kl_diff_exact_kent_<k>``
        = E_flow[log p_flow - log p_kent].  The Kent fit uses the first half
        of the samples; its cross-entropy is evaluated on the held-out second
        half, so the KL estimate is unbiased up to MC error (it can come out
        slightly negative when the fit is essentially exact).
        """
        batch_size = 1 if conditional_input is None else (
            conditional_input[0].shape[0] if isinstance(conditional_input, list)
            else conditional_input.shape[0])

        sub_indices = list(range(len(self.pdf_defs_list)))
        entropy_dict = None
        if calc_kl_diff_and_entropic_quantities and s2_entropy_scanning:
            scan_ent = self._s2_scan_entropy(params, conditional_input,
                                             batch_size,
                                             nside=s2_entropy_scan_nside)
            entropy_dict = {"total": scan_ent, 0: scan_ent}
        if calc_kl_diff_and_entropic_quantities and entropy_dict is None:
            entropy_dict, targets, _ = self.entropy_iterative(
                params, key, sub_manifolds=[-1] + sub_indices,
                conditional_input=conditional_input, samplesize=samplesize,
                iterative_samplesize=iterative_samplesize,
                max_iterative_batchsize=max_iterative_batchsize,
                failsafe_crosscheck_tolerance=failsafe_crosscheck_tolerance,
                return_samples=True)
        else:
            data_summary = None
            if conditional_input is not None:
                if isinstance(conditional_input, list):
                    data_summary = [jnp.repeat(ci, samplesize, axis=0)
                                    for ci in conditional_input]
                else:
                    data_summary = jnp.repeat(conditional_input, samplesize,
                                              axis=0)
            targets, _, _ = self.sample_with_subdim_logprobs(
                params, key, samplesize * batch_size, data_summary,
                force_embedding_coordinates=True,
                failsafe_crosscheck_tolerance=failsafe_crosscheck_tolerance)

        out = {}
        if entropy_dict is not None:
            for k, v in entropy_dict.items():
                out[f"entropy_{k}"] = np.asarray(v)

        for k, sub_def in enumerate(self.pdf_defs_list):
            lo, hi = self.target_dim_indices_embedded[k]
            sub = np.asarray(targets[:, lo:hi]).reshape(
                batch_size, samplesize, hi - lo)
            if return_samples:
                out[f"samples_{k}"] = sub
            if sub_def[0] == "e":
                mean = sub.mean(axis=1)
                c = sub - mean[:, None, :]
                cov = np.einsum("bsi,bsj->bij", c, c) / (samplesize - 1)
                out[f"mean_{k}"] = mean
                out[f"varlike_{k}"] = cov
                # Gaussian-approximation entropy 0.5 log det(2 pi e Sigma)
                d = hi - lo
                sign, logdet = np.linalg.slogdet(cov)
                out[f"entropy_gauss_approx_{k}"] = 0.5 * (
                    d * (1.0 + math.log(2.0 * math.pi)) + logdet)
            elif sub_def == "s2":
                resultant = sub.mean(axis=1)
                rbar = np.linalg.norm(resultant, axis=-1)
                mean_dir = resultant / np.maximum(rbar[:, None], 1e-12)
                kappa = _banerjee_kappa(rbar, p=3,
                                        abs_precision=mises_abs_precision)
                out[f"mean_{k}"] = mean_dir
                theta = np.arccos(np.clip(mean_dir[:, 2], -1, 1))
                phi = np.mod(np.arctan2(mean_dir[:, 1], mean_dir[:, 0]),
                             2 * np.pi)
                out[f"mean_{k}_angles"] = np.stack([theta, phi], axis=1)
                out[f"varlike_{k}"] = kappa
                out[f"entropy_vmf_approx_{k}"] = _vmf_entropy(kappa)
                if return_samples:
                    th = np.arccos(np.clip(sub[:, :, 2], -1, 1))
                    ph = np.mod(np.arctan2(sub[:, :, 1], sub[:, :, 0]),
                                2 * np.pi)
                    out[f"samples_{k}_angles"] = np.stack([th, ph], axis=-1)
                if calc_zlp_kent_fit:
                    from ..utils.vmf_kent import (fit_zlpkent_batch_quat,
                                                  zlpkent_logpdf_s2_batch)
                    half = samplesize // 2
                    fit = fit_zlpkent_batch_quat(
                        jnp.asarray(sub[:, :half]), num_steps=150,
                        newton_steps=8, grad_tol=mises_abs_precision)
                    out[f"zlp_kent_pars_{k}"] = fit
                    # held-out MC cross-entropy of the flow marginal vs its
                    # Kent fit (in-sample evaluation is optimistically biased)
                    held = sub[:, half:]
                    lps = zlpkent_logpdf_s2_batch(
                        held, fit["gamma1"], fit["gamma2"], fit["gamma3"],
                        fit["kappa"], fit["u"])
                    kent_ce = -lps.mean(axis=1)
                    out[f"entropy_kent_crossent_{k}"] = kent_ce
                    if entropy_dict is not None:
                        out[f"kl_diff_exact_kent_{k}"] = (
                            kent_ce - np.asarray(entropy_dict[k]))
            elif sub_def == "s1":
                resultant = sub.mean(axis=1)
                rbar = np.linalg.norm(resultant, axis=-1)
                mean_dir = resultant / np.maximum(rbar[:, None], 1e-12)
                kappa = _banerjee_kappa(rbar, p=2,
                                        abs_precision=mises_abs_precision)
                out[f"mean_{k}"] = mean_dir
                out[f"mean_{k}_angles"] = np.mod(
                    np.arctan2(mean_dir[:, 1], mean_dir[:, 0]), 2 * np.pi)
                out[f"varlike_{k}"] = kappa
                if return_samples:
                    out[f"samples_{k}_angles"] = np.mod(
                        np.arctan2(sub[:, :, 1], sub[:, :, 0]), 2 * np.pi)
            else:
                mean = sub.mean(axis=1)
                out[f"mean_{k}"] = mean
                out[f"varlike_{k}"] = sub.var(axis=1)

            if entropy_dict is not None and sub_def[0] == "e" \
                    and k in entropy_dict:
                out[f"kl_diff_exact_approximate_{k}"] = (
                    out[f"entropy_gauss_approx_{k}"] - np.asarray(
                        entropy_dict[k]))
            if entropy_dict is not None and sub_def == "s2" \
                    and k in entropy_dict:
                out[f"kl_diff_exact_approximate_{k}"] = (
                    out[f"entropy_vmf_approx_{k}"] - np.asarray(
                        entropy_dict[k]))
        return out


def _banerjee_kappa_jnp(rbar, p=3, newton_iters=8):
    """jnp twin of _banerjee_kappa (jit/shard-able; p=2 uses the
    exponentially-scaled Bessel ratio i1e/i0e, which is the plain ratio).
    8 fixed Newton iterations fully converge A_p(kappa)=rbar in f64 from
    the Banerjee init (quadratic convergence), matching the host path's
    mises_abs_precision loop."""
    rbar = jnp.clip(rbar, 1e-9, 1.0 - 1e-9)
    kappa = rbar * (p - rbar**2) / (1.0 - rbar**2)
    for _ in range(newton_iters):
        if p == 3:
            a = 1.0 / jnp.tanh(kappa) - 1.0 / kappa
            da = 1.0 / kappa**2 - 1.0 / jnp.sinh(kappa)**2
        else:
            a = (jax.scipy.special.i1e(kappa)
                 / jax.scipy.special.i0e(kappa))
            da = 1.0 - a**2 - a / kappa
        kappa = kappa - (a - rbar) / jnp.maximum(da, 1e-12)
        kappa = jnp.maximum(kappa, 1e-9)
    return kappa


def _vmf_entropy_jnp(kappa):
    """jnp twin of _vmf_entropy (stable log-sinh for large kappa)."""
    kappa = jnp.maximum(kappa, 1e-9)
    ks = jnp.minimum(kappa, 20.0)
    log_c_small = jnp.log(kappa) - jnp.log(4.0 * jnp.pi) - jnp.log(jnp.sinh(ks))
    log_c_large = jnp.log(kappa) - jnp.log(4.0 * jnp.pi) - (kappa - math.log(2.0))
    log_c = jnp.where(kappa > 20, log_c_large, log_c_small)
    a3 = 1.0 / jnp.tanh(kappa) - 1.0 / kappa
    return -log_c - kappa * a3


def _banerjee_kappa(rbar, p=3, newton_iters=3, abs_precision=None,
                    max_iters=100):
    """Banerjee et al. vMF concentration estimate + Newton refinement on
    A_p(kappa) = rbar (default.py:3446-3469).

    With ``abs_precision`` set, iterates until max |A_p(kappa) - rbar| <
    abs_precision (the reference's mises_abs_precision loop) instead of a
    fixed count, bounded by ``max_iters``."""
    rbar = np.clip(rbar, 1e-9, 1.0 - 1e-9)
    kappa = rbar * (p - rbar**2) / (1.0 - rbar**2)
    n_iters = max_iters if abs_precision is not None else newton_iters
    for _ in range(n_iters):
        if p == 3:
            a = 1.0 / np.tanh(kappa) - 1.0 / kappa
            da = 1.0 / kappa**2 - 1.0 / np.sinh(kappa)**2
        else:  # p == 2: A_2 = I1/I0
            from scipy.special import i0, i1
            a = i1(kappa) / i0(kappa)
            da = 1.0 - a**2 - a / kappa
        if abs_precision is not None and \
                np.max(np.abs(a - rbar)) < abs_precision:
            break
        kappa = kappa - (a - rbar) / np.maximum(da, 1e-12)
        kappa = np.maximum(kappa, 1e-9)
    return kappa


def _vmf_entropy(kappa):
    """Entropy of a vMF on S2: -log C_3(kappa) - kappa * A_3(kappa)."""
    kappa = np.maximum(kappa, 1e-9)
    log_c = np.log(kappa) - np.log(4.0 * np.pi) - np.log(np.sinh(kappa))
    # use stable log sinh for large kappa
    large = kappa > 20
    log_c = np.where(large,
                     np.log(kappa) - np.log(4.0 * np.pi)
                     - (kappa - math.log(2.0)), log_c)
    a3 = 1.0 / np.tanh(kappa) - 1.0 / kappa
    return -log_c - kappa * a3
