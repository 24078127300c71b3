"""Rotation-matrix parametrizations.

TPU-native equivalents of the rotation modes used by the `g` Euclidean flow
(gaussianization_flow.py:156-223, 457-471, 747-798) and the spherical layers
(sphere_base.py:112-240): householder, givens-angles, cayley, axis ("xyz"),
and quaternion.  All return batched (B, d, d) orthogonal matrices built from
packed parameter vectors; products of small matrices are unrolled at trace
time (d and iteration counts are static and tiny).
"""
from __future__ import annotations

import itertools

import jax
import jax.numpy as jnp


def householder_matrix(vs):
    """Product of Householder reflections.

    vs: (B, n_iter, d) raw vectors ->  (B, d, d) orthogonal matrix.
    Mirrors gaussianization_flow.py:457-471 / sphere_base.py:222-240.
    """
    b, n_iter, d = vs.shape
    q = jnp.broadcast_to(jnp.eye(d, dtype=vs.dtype), (b, d, d))
    for i in range(n_iter):
        v = vs[:, i, :]
        # safe norm: finite gradient if an (MLP-predicted) vector passes
        # through 0 during training
        v = v / jnp.sqrt(jnp.sum(v**2, axis=-1, keepdims=True) + 1e-20)
        qi = jnp.eye(d, dtype=vs.dtype) - 2.0 * v[:, :, None] * v[:, None, :]
        q = jnp.einsum("bij,bjk->bik", q, qi, precision=jax.lax.Precision.HIGHEST)
    return q


def householder_apply(vs, x, inverse=False):
    """Apply the product-of-reflections rotation (or its transpose) to
    x (B, d) WITHOUT forming the matrix: n_iter fused elementwise passes.

    Equivalent to apply_rotation(householder_matrix(vs), x, inverse) but
    avoids the (B, d, d) matrix entirely - for per-sample (MLP-predicted)
    rotations the batched matrix costs ~4 GB of tile-padded HBM traffic per
    1M samples (d=4, v5e); the reflection form touches only (B, d) tensors.
    """
    b, n_iter, d = vs.shape
    # householder_matrix builds R = q1 q2 ... qn, so R x applies qn first;
    # R^T x = qn ... q1 x applies q1 first.  Each qi is symmetric.
    order = range(n_iter) if inverse else reversed(range(n_iter))
    for i in order:
        v = vs[:, i, :]
        v = v / jnp.sqrt(jnp.sum(v**2, axis=-1, keepdims=True) + 1e-20)
        x = x - 2.0 * v * jnp.sum(v * x, axis=-1, keepdims=True)
    return x


def givens_matrix(angles, d):
    """Product of Givens rotations over all (i, j) pairs.

    angles: (B, d*(d-1)/2) -> (B, d, d).
    Mirrors the "angles" rotation mode (gaussianization_flow.py:747-780).
    """
    b = angles.shape[0]
    prev = jnp.broadcast_to(jnp.eye(d, dtype=angles.dtype), (b, d, d))
    for ind, (i, j) in enumerate(itertools.combinations(range(d), 2)):
        c = jnp.cos(angles[:, ind])
        s = jnp.sin(angles[:, ind])
        g = jnp.broadcast_to(jnp.eye(d, dtype=angles.dtype), (b, d, d))
        g = g.at[:, i, i].set(c).at[:, j, j].set(c)
        g = g.at[:, i, j].set(s).at[:, j, i].set(-s)
        prev = jnp.einsum("bij,bjk->bik", g, prev, precision=jax.lax.Precision.HIGHEST)
    return prev


def cayley_matrix(param):
    """2-D Cayley rotation from a single parameter t:
       R = 1/(1+t^2) [[1-t^2, -2t], [2t, 1-t^2]]
    (gaussianization_flow.py:782-798).
    param: (B, 1) -> (B, 2, 2).
    """
    t = param[:, 0]
    mult = 1.0 / (1.0 + t**2)
    a = (1.0 - t**2) * mult
    off = 2.0 * t * mult
    row0 = jnp.stack([a, -off], axis=-1)
    row1 = jnp.stack([off, a], axis=-1)
    return jnp.stack([row0, row1], axis=1)


def xyz_matrix(params):
    """Rotation aligning the z-axis to a unit vector mu (its own "xyz" mode).

    params: (B, 3) unnormalized direction -> (B, 3, 3).
    Mirrors sphere_base.py:161-185.
    """
    normed = params / jnp.sqrt(jnp.sum(params**2, axis=-1, keepdims=True)
                               + 1e-20)
    mx, my, mz = normed[:, 0], normed[:, 1], normed[:, 2]
    opz = 1.0 + mz
    r00 = 1.0 - mx**2 / opz
    r11 = 1.0 - my**2 / opz
    r01 = -mx * my / opz
    row0 = jnp.stack([r00, r01, mx], axis=-1)
    row1 = jnp.stack([r01, r11, my], axis=-1)
    row2 = jnp.stack([-mx, -my, mz], axis=-1)
    return jnp.stack([row0, row1, row2], axis=1)


def quaternion_matrix(params):
    """Rotation matrix from an unnormalized quaternion (a, i, j, k).

    params: (B, 4) -> (B, 3, 3).  Mirrors sphere_base.py:186-217.
    """
    sq = jnp.sum(params**2, axis=-1) + 1e-20
    a, i, j, k = params[:, 0], params[:, 1], params[:, 2], params[:, 3]
    row0 = jnp.stack([1.0 - 2.0 * (j**2 + k**2) / sq,
                      2.0 * (i * j - a * k) / sq,
                      2.0 * (i * k + j * a) / sq], axis=-1)
    row1 = jnp.stack([2.0 * (i * j + a * k) / sq,
                      1.0 - 2.0 * (i**2 + k**2) / sq,
                      2.0 * (j * k - i * a) / sq], axis=-1)
    row2 = jnp.stack([2.0 * (i * k - j * a) / sq,
                      2.0 * (j * k + i * a) / sq,
                      1.0 - 2.0 * (i**2 + j**2) / sq], axis=-1)
    return jnp.stack([row0, row1, row2], axis=1)


def apply_rotation(mat, x, inverse=False):
    """Apply (or inverse-apply, i.e. transpose) a rotation to x (B, d).

    mat: (Bp, d, d) with Bp in {1, B}.  The Bp=1 (shared-rotation) case MUST
    be a plain 2-D matmul: a batched einsum makes XLA materialize the
    (B, d, d) broadcast with the (d, d) minor dims tile-padded to (8, 128) -
    ~4 GB of HBM traffic per rotation per 1M samples measured on v5e.
    """
    if mat.shape[0] == 1:
        m = mat[0]
        return jnp.matmul(x, m if inverse else m.T,
                          precision=jax.lax.Precision.HIGHEST)
    if inverse:
        return jnp.einsum("bji,bj->bi", mat, x, precision=jax.lax.Precision.HIGHEST)
    return jnp.einsum("bij,bj->bi", mat, x, precision=jax.lax.Precision.HIGHEST)


def householder_apply_cols(vs_cols, cols, inverse=False):
    """Column twin of householder_apply: cols is a tuple of d flat (B,)
    coordinate arrays, vs_cols a list (n_iter) of lists (d) of (Bp,) raw
    reflection-vector columns.  Keeps every per-sample quantity a flat (B,)
    array (TPU tile-padding - see ops/splines.py column section)."""
    n_iter = len(vs_cols)
    d = len(cols)
    cols = list(cols)
    order = range(n_iter) if inverse else reversed(range(n_iter))
    for i in order:
        v = vs_cols[i]
        assert len(v) == d
        nrm = jnp.sqrt(sum(c * c for c in v) + 1e-20)
        v = [c / nrm for c in v]
        dot = v[0] * cols[0]
        for j in range(1, d):
            dot = dot + v[j] * cols[j]
        cols = [c - 2.0 * vj * dot for c, vj in zip(cols, v)]
    return tuple(cols)


def apply_matrix_cols(mat, cols, inverse=False):
    """Apply (Bp, d, d) rotation matrices to d columns of (B,) coordinates:
    y_i = sum_j R_ij x_j (or R^T when inverse)."""
    d = len(cols)
    out = []
    for i in range(d):
        acc = None
        for j in range(d):
            r = mat[:, j, i] if inverse else mat[:, i, j]
            term = r * cols[j]
            acc = term if acc is None else acc + term
        out.append(acc)
    return tuple(out)
