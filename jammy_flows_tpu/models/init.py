"""Data-driven initialization of Euclidean flow chains.

TPU-native equivalent of the reference init machinery
(extra_functions.py:101-409, wired into pdf.init_params at
default.py:1817-1952): traverses the sub-pdf-0 layers in reverse,
initializing Gaussianization-flow KDE means from data percentiles, the
rotation from a PCA/householder fit (scipy minimize, init-time CPU), and MVN
blocks from an SVD-regularized covariance fit - de-correlating the data as
it goes.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp
from scipy.optimize import minimize
import scipy.linalg

from ..ops import rotations, matrix, logistic_kde


def _fit_householder_to_orthogonal(target_matrix, n_iter, dim, rng):
    """Fit householder parameters reproducing the action of an orthogonal
    matrix on the diagonal test vector (extra_functions.py:101-121)."""
    test_vec = np.ones(dim) / np.sqrt(dim)
    v2 = target_matrix @ test_vec

    def loss(a):
        vs = jnp.asarray(a.reshape(1, n_iter, dim))
        mat = np.asarray(rotations.householder_matrix(vs))[0]
        return -float((mat @ test_vec) @ v2)

    start = rng.standard_normal(n_iter * dim)
    res = minimize(loss, start)
    return res["x"]


def _fit_mvn_to_cov(layer, target_cov, dim, rng):
    """Fit mvn_block params so L L^T matches the target covariance by
    reverse KL (extra_functions.py:123-176)."""
    inv_target = scipy.linalg.pinv(target_cov)
    _, logdet_target = np.linalg.slogdet(target_cov)

    def build(a):
        pt = layer._unpack(jnp.asarray(a[None, :]))
        lower, _ = _mvn_lower(layer, pt, dim)
        return lower

    def loss(a):
        lower = build(a)
        pred = lower @ lower.T
        _, logdet_pred = np.linalg.slogdet(pred)
        return 0.5 * (np.trace(inv_target @ pred) - logdet_pred
                      + logdet_target - dim)

    start = rng.standard_normal(layer.num_cov_params)
    res = minimize(loss, start)
    lower = build(res["x"])
    pred = lower @ lower.T
    inv_pred = scipy.linalg.pinv(pred)
    l, sigma, r = scipy.linalg.svd(inv_pred)
    whiten = np.sqrt(sigma)[:, None] * r   # "sqrt" of inverse covariance
    return res["x"], whiten


def _mvn_lower(layer, param_tuple, dim):
    single, full, off = param_tuple
    if layer.cov_type == "diagonal_symmetric":
        return np.eye(dim) * float(np.exp(single[0, 0])), 0.0
    if layer.cov_type == "diagonal":
        return np.diag(np.exp(np.asarray(full[0]))), 0.0
    mat, _ = matrix.build_lower_triangular(dim, full, off)
    return np.asarray(mat[0]), 0.0


def find_init_pars_of_chained_blocks(layers, data, rng, mvn_min_max_sv_ratio=1e-4):
    """Desired init vector for a chain of Euclidean layers given data (N, D).

    Returns numpy vector of length sum(layer.num_params).
    """
    from ..layers.euclidean import GaussianizationFlow, MultivariateNormal

    cur_data = np.asarray(data, dtype=np.float64)
    dim = cur_data.shape[1]
    all_params = []

    for layer_ind, layer in enumerate(reversed(layers)):
        param_list = []
        if getattr(layer, "model_offset", 0):
            means = cur_data.mean(axis=0, keepdims=True)
            param_list.append(means[0])
            cur_data = cur_data - means

        if isinstance(layer, MultivariateNormal):
            if layer.cov_type != "identity":
                data_matrix = cur_data.T @ cur_data / cur_data.shape[0]
                l, sigma, r = scipy.linalg.svd(data_matrix)
                min_sv = mvn_min_max_sv_ratio * sigma.max()
                fixed = (l * np.maximum(sigma, min_sv)) @ r
                pars, whiten = _fit_mvn_to_cov(layer, fixed, dim, rng)
                param_list.append(pars)
                cur_data = cur_data @ whiten.T
        elif isinstance(layer, GaussianizationFlow) and \
                layer.nonlinear_stretch_type == "classic":
            # rotation
            if layer.rotation_mode == "householder" and \
                    layer.num_rotation_params > 0:
                if dim < 30 and layer_ind == 0:
                    data_matrix = cur_data.T @ cur_data
                    _, _, r = scipy.linalg.svd(data_matrix)
                    vs = _fit_householder_to_orthogonal(
                        r, layer.householder_iter, dim, rng)
                else:
                    vs = rng.standard_normal(layer.num_rotation_params)
                param_list.append(vs)
                mat = np.asarray(rotations.householder_matrix(
                    jnp.asarray(vs.reshape(1, layer.householder_iter, dim))))[0]
                cur_data = cur_data @ mat   # inverse rotation: x @ R = R^T x
            elif layer.rotation_mode != "none":
                param_list.append(np.zeros(layer.num_rotation_params))

            # percentile-based KDE means + bandwidths
            k = layer.num_kde
            percentiles = np.percentile(cur_data, np.linspace(0, 100, k),
                                        axis=0)                    # (K, D)
            if layer.center_mean == 0:
                param_list.append(percentiles.flatten())
            else:
                param_list.append(percentiles[:-1].flatten())
            diffs = percentiles[1:, :] - percentiles[:-1, :]
            bw = np.log(np.maximum(diffs.min(axis=0), 1e-6) * 1.5)
            bw_full = np.broadcast_to(bw[None, :], (k, dim))
            param_list.append(bw_full.flatten())
            if layer.fit_normalization:
                param_list.append(np.ones(k * dim))
            if layer.add_skewness:
                param_list.append(np.zeros(k * dim))

            # gaussianize the data for the next (earlier) layer
            # params in B-minor (K, D, 1) layout
            val = logistic_kde.gaussianize_value(
                jnp.asarray(cur_data), jnp.asarray(percentiles[..., None]),
                jnp.asarray(bw_full[..., None]),
                jnp.zeros((k, dim, 1)),
                jnp.zeros((1, 1, 1)), jnp.ones((1, 1, 1)),
                add_skewness=False,
                inverse_function_type=layer.inverse_function_type)
            cur_data = np.asarray(val)
        else:
            param_list.append(layer.default_params(rng))

        vec = np.concatenate(param_list) if param_list else np.zeros(0)
        assert len(vec) == layer.num_params, \
            (type(layer).__name__, len(vec), layer.num_params)
        all_params.append(vec)

    return np.concatenate(all_params[::-1])
