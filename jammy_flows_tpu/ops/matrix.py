"""Triangular-matrix kernels for affine flows.

TPU-native equivalent of jammy_flows/layers/matrix_fns.py:4-146.  The
reference constructs explicit inverse triangular matrices from
sub-determinants; here the inverse direction uses a batched triangular solve
(numerically better and one fused XLA op), and the log-det is the sum of log
diagonal entries in both directions.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


def build_lower_triangular(dim, log_diagonal, off_diagonal, upper=False):
    """Assemble a batched triangular matrix with positive diagonal.

    log_diagonal: (B, dim); off_diagonal: (B, dim*(dim-1)/2) packed in
    row-major strictly-lower order.  Returns ((B, dim, dim), logdet (B,)).
    """
    b = log_diagonal.shape[0]
    mat = jnp.zeros((b, dim, dim), dtype=log_diagonal.dtype)
    didx = np.arange(dim)
    mat = mat.at[:, didx, didx].set(jnp.exp(log_diagonal))
    if dim > 1 and off_diagonal is not None and off_diagonal.shape[-1] > 0:
        rows, cols = np.tril_indices(dim, k=-1)
        mat = mat.at[:, rows, cols].set(off_diagonal)
    if upper:
        mat = jnp.swapaxes(mat, -1, -2)
    logdet = jnp.sum(log_diagonal, axis=-1)
    return mat, logdet


def _tri_matvec(mat, x):
    """(Bp, d, d) applied to (B, d) -> (B, d); plain 2-D matmul when Bp=1
    (the batched einsum would materialize the tile-padded (B, d, d)
    broadcast - see ops/rotations.py:apply_rotation)."""
    if mat.shape[0] == 1:
        return jnp.matmul(x, mat[0].T, precision=jax.lax.Precision.HIGHEST)
    return jnp.einsum("bij,bj->bi", mat, x, precision=jax.lax.Precision.HIGHEST)


def _tri_solve(mat, x, lower):
    """Solve mat @ y = x rowwise; shared-matrix fast path for Bp=1."""
    if mat.shape[0] == 1:
        return jax.scipy.linalg.solve_triangular(mat[0], x.T, lower=lower).T
    mat_b = jnp.broadcast_to(mat, (x.shape[0],) + mat.shape[1:])
    return jax.scipy.linalg.solve_triangular(mat_b, x[..., None],
                                             lower=lower)[..., 0]


def triangular_apply(dim, cov_type, params_tuple, x, inverse=False):
    """Apply y = L x (or x = L^{-1} y) for the mvn_block cov types.

    params_tuple = (single_log_diag, full_log_diag, off_diag) following
    multivariate_normal.py:187-226.  Returns (result, logdet_contribution)
    where logdet_contribution is log|det L| (negated internally for inverse).
    """
    single_log_diag, full_log_diag, off_diag = params_tuple

    if cov_type == "identity":
        return x, jnp.zeros(x.shape[:1], dtype=x.dtype)

    if cov_type == "diagonal_symmetric":
        ld = dim * single_log_diag[:, 0]
        if inverse:
            return x * jnp.exp(-single_log_diag), -ld
        return x * jnp.exp(single_log_diag), ld

    if cov_type == "diagonal":
        ld = jnp.sum(full_log_diag, axis=-1)
        if inverse:
            return x * jnp.exp(-full_log_diag), -ld
        return x * jnp.exp(full_log_diag), ld

    if cov_type == "full":
        mat, ld = build_lower_triangular(dim, full_log_diag, off_diag)
        if inverse:
            return _tri_solve(mat, x, lower=True), -ld
        return _tri_matvec(mat, x), ld

    raise ValueError(f"Unknown cov type {cov_type}")


def triangular_combination_apply(dim, left_pars, diag_pars, right_pars, x,
                                 inverse=False):
    """Volume-preserving L * D * U transformation ("triangular_combination"
    rotation mode of the `g` flow, gaussianization_flow.py:942-964/1004-1027).

    left_pars/right_pars: (B, dim*(dim-1)/2); diag_pars: (B, dim-1) - the last
    log-diagonal entry is -sum(others) so det = 1.
    """
    zeros = jnp.zeros((left_pars.shape[0], dim), dtype=x.dtype)
    upper, _ = build_lower_triangular(dim, zeros, right_pars, upper=True)
    lower, _ = build_lower_triangular(dim, zeros, left_pars)
    diag = jnp.concatenate([diag_pars, -jnp.sum(diag_pars, axis=1, keepdims=True)],
                           axis=1)
    if inverse:
        y = _tri_solve(lower, x, lower=True)
        y = y * jnp.exp(-diag)
        return _tri_solve(upper, y, lower=False)
    y = _tri_matvec(upper, x)
    y = y * jnp.exp(diag)
    return _tri_matvec(lower, y)
