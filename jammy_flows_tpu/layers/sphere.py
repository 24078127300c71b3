"""Spherical flow layers: base projection/rotation machinery, Moebius (m),
circular RQ-spline (o), identity (y).

TPU-native reimplementation of layers/spheres/{sphere_base.py,moebius_1d.py,
splines_1d.py,spherical_do_nothing.py}.  The exponential-map (v), vMF (f)
and CNF (c) S2 flows live in sphere_s2.py.
"""
from __future__ import annotations

import math

import numpy as np
import jax
import jax.numpy as jnp

from .base import FlowLayer
from ..ops import manifold, rotations
from ..ops.inverse import make_inverse_fn
from ..ops.splines import (rq_spline, rq_spline_smooth_circular,
                           rq_spline_cols,
                           rq_spline_smooth_circular_cols)

PI = math.pi
TWO_PI = 2.0 * math.pi


def safe_angle_within_2pi(x, margin=1e-7):
    return jnp.clip(x, margin, TWO_PI - margin)


class SphereLayer(FlowLayer):
    """Base for all spherical layers (sphere_base.py:40-730).

    Handles (a) the plane <-> sphere Gaussian-CDF projection when this is the
    first layer of the sub-manifold, (b) an optional extra rotation in
    embedding space with 4 parametrizations, (c) intrinsic <-> embedding
    coordinate handling.  Parameter layout: [rotation params] + child params.
    """

    def __init__(self, dimension=1, euclidean_to_sphere_as_first=1,
                 add_rotation=0, rotation_mode="householder",
                 num_householder_iter=-1,
                 always_parametrize_in_embedding_space=0):
        super().__init__(dimension, always_parametrize_in_embedding_space)
        self.euclidean_to_sphere_as_first = int(euclidean_to_sphere_as_first)
        self.add_rotation = int(add_rotation)
        self.rotation_mode = rotation_mode
        self.num_rotation_params = 0
        self.householder_iter = 0
        if self.add_rotation:
            emb = dimension + 1
            if rotation_mode == "angles":
                self.num_rotation_params = emb * (emb - 1) // 2
            elif rotation_mode == "xyz":
                assert dimension == 2
                self.num_rotation_params = 3
            elif rotation_mode == "quaternion":
                assert dimension == 2
                self.num_rotation_params = 4
            else:  # householder
                it = emb if num_householder_iter == -1 else num_householder_iter
                self.householder_iter = it
                self.num_rotation_params = it * emb
        self.num_params += self.num_rotation_params

    # -- rotation ---------------------------------------------------------
    def _rotation_matrix(self, rot_params, batch):
        emb = self.dimension + 1
        if self.rotation_mode == "householder":
            vs = rot_params.reshape(-1, self.householder_iter, emb)
            mat = rotations.householder_matrix(vs)
        elif self.rotation_mode == "angles":
            mat = rotations.givens_matrix(rot_params, emb)
        elif self.rotation_mode == "xyz":
            mat = rotations.xyz_matrix(rot_params)
        elif self.rotation_mode == "quaternion":
            mat = rotations.quaternion_matrix(rot_params)
        else:
            raise ValueError(f"unknown sphere rotation mode {self.rotation_mode}")
        # (Bp, d, d): apply_rotation handles the shared Bp=1 case as a plain
        # matmul - do NOT broadcast to the batch (tile-padded HBM blowup)
        return mat

    def _apply_embedding_rotation(self, rot_params, x, log_det, inverse):
        """Rotate in embedding space (sphere_base.py:601-695)."""
        if not self.add_rotation:
            return x, log_det
        if not self.always_parametrize_in_embedding_space:
            x, log_det = manifold.spherical_to_eucl(self.dimension, x, log_det)
        if self.rotation_mode == "householder":
            vs = rot_params.reshape(-1, self.householder_iter,
                                    self.dimension + 1)
            x = rotations.householder_apply(vs, x, inverse=inverse)
        else:
            mat = self._rotation_matrix(rot_params, x.shape[0])
            x = rotations.apply_rotation(mat, x, inverse=inverse)
        if not self.always_parametrize_in_embedding_space:
            x, log_det = manifold.eucl_to_spherical(self.dimension, x, log_det)
        return x, log_det

    # -- plane <-> sphere -------------------------------------------------
    def _plane_to_sphere(self, x, log_det):
        if self.dimension == 1:
            return manifold.plane_to_circle(x, log_det)
        return manifold.plane_to_sphere2(x, log_det)

    def _sphere_to_plane(self, x, log_det):
        if self.dimension == 1:
            return manifold.circle_to_plane(x, log_det)
        return manifold.sphere2_to_plane(x, log_det)

    # -- orchestration ----------------------------------------------------
    def forward(self, params, x, log_det):
        rot = params[:, :self.num_rotation_params]
        child = params[:, self.num_rotation_params:]
        if self.euclidean_to_sphere_as_first:
            x, log_det = self._plane_to_sphere(x, log_det)
            if self.always_parametrize_in_embedding_space:
                x, log_det = manifold.spherical_to_eucl(self.dimension, x, log_det)
        x, log_det = self._forward(child, x, log_det, rot_params=rot)
        x, log_det = self._apply_embedding_rotation(rot, x, log_det, inverse=False)
        return x, log_det

    def inverse(self, params, x, log_det):
        rot = params[:, :self.num_rotation_params]
        child = params[:, self.num_rotation_params:]
        x, log_det = self._apply_embedding_rotation(rot, x, log_det, inverse=True)
        x, log_det = self._inverse(child, x, log_det, rot_params=rot)
        if self.euclidean_to_sphere_as_first:
            if self.always_parametrize_in_embedding_space:
                x, log_det = manifold.eucl_to_spherical(self.dimension, x, log_det)
            x, log_det = self._sphere_to_plane(x, log_det)
        return x, log_det

    # -- column fast path --------------------------------------------------
    # Flat-(B,) coordinate columns instead of tile-padded (B, d) arrays
    # (layers/base.py supports_columns; ~11x on elementwise math, v5e).
    def _rot_vs_cols(self, rot_slab):
        """Householder reflection vectors as list (it) of lists (d) of (Bp,)
        columns, straight from the transposed (R, Bp) slab rows."""
        emb = self.dimension + 1
        return [[rot_slab[i * emb + j] for j in range(emb)]
                for i in range(self.householder_iter)]

    def _apply_embedding_rotation_cols(self, rot_slab, cols, log_det,
                                       inverse):
        if not self.add_rotation:
            return cols, log_det
        if self.dimension == 1:
            x, y, log_det = manifold.circle_spherical_to_eucl_cols(
                cols[0], log_det)
            ecols = (x, y)
        else:
            x, y, z, log_det = manifold.spherical_to_eucl_cols(
                cols[0], cols[1], log_det)
            ecols = (x, y, z)
        if self.rotation_mode == "householder":
            ecols = rotations.householder_apply_cols(
                self._rot_vs_cols(rot_slab), ecols, inverse=inverse)
        else:
            mat = self._rotation_matrix(rot_slab.T, ecols[0].shape[0])
            ecols = rotations.apply_matrix_cols(mat, ecols, inverse=inverse)
        if self.dimension == 1:
            ang, log_det = manifold.circle_eucl_to_spherical_cols(
                ecols[0], ecols[1], log_det)
            return (ang,), log_det
        theta, phi, log_det = manifold.eucl_to_spherical_cols(
            ecols[0], ecols[1], ecols[2], log_det)
        return (theta, phi), log_det

    def supports_columns(self):
        # embedding-space default parametrization stays on the row path
        return (not self.always_parametrize_in_embedding_space
                and self._supports_columns_child())

    def _supports_columns_child(self):
        return False

    def forward_cols(self, slab, cols, log_det):
        rot = slab[:self.num_rotation_params]
        child = slab[self.num_rotation_params:]
        if self.euclidean_to_sphere_as_first:
            if self.dimension == 1:
                ang, log_det = manifold.plane_to_circle_cols(cols[0], log_det)
                cols = (ang,)
            else:
                th, ph, log_det = manifold.plane_to_sphere2_cols(
                    cols[0], cols[1], log_det)
                cols = (th, ph)
        cols, log_det = self._forward_cols(child, cols, log_det,
                                           rot_slab=rot)
        cols, log_det = self._apply_embedding_rotation_cols(rot, cols,
                                                            log_det,
                                                            inverse=False)
        return cols, log_det

    def inverse_cols(self, slab, cols, log_det):
        rot = slab[:self.num_rotation_params]
        child = slab[self.num_rotation_params:]
        cols, log_det = self._apply_embedding_rotation_cols(rot, cols,
                                                            log_det,
                                                            inverse=True)
        cols, log_det = self._inverse_cols(child, cols, log_det,
                                           rot_slab=rot)
        if self.euclidean_to_sphere_as_first:
            if self.dimension == 1:
                x, log_det = manifold.circle_to_plane_cols(cols[0], log_det)
                cols = (x,)
            else:
                x0, x1, log_det = manifold.sphere2_to_plane_cols(
                    cols[0], cols[1], log_det)
                cols = (x0, x1)
        return cols, log_det

    # -- (z, phi)-carrier column protocol (S2 only) ------------------------
    # Carrying z = cos(theta) between layers removes the per-layer
    # cos/arccos/log(sin) round trips of the (theta, phi) carrier, and the
    # sphere area element is dA = dz dphi, so embedding rotations are
    # measure-preserving: their log-det terms vanish identically.  Measured
    # motivation: the production f15 sampling stack spent ~2.2 of 3.55 ms
    # in coordinate trig (2026-08-21).
    def supports_zphi_dir(self, direction):
        return False

    def _apply_embedding_rotation_cols_z(self, rot_slab, cols, inverse):
        if not self.add_rotation:
            return cols
        assert self.dimension == 2
        ecols = manifold.zphi_to_eucl_cols(cols[0], cols[1])
        if self.rotation_mode == "householder":
            ecols = rotations.householder_apply_cols(
                self._rot_vs_cols(rot_slab), ecols, inverse=inverse)
        else:
            mat = self._rotation_matrix(rot_slab.T, ecols[0].shape[0])
            ecols = rotations.apply_matrix_cols(mat, ecols, inverse=inverse)
        return manifold.eucl_to_zphi_cols(*ecols)

    def forward_cols_z(self, slab, cols, log_det):
        rot = slab[:self.num_rotation_params]
        child = slab[self.num_rotation_params:]
        if self.euclidean_to_sphere_as_first:
            z, phi, log_det = manifold.plane_to_zsphere2_cols(
                cols[0], cols[1], log_det)
            cols = (z, phi)
        cols, log_det = self._forward_cols_z(child, cols, log_det,
                                             rot_slab=rot)
        cols = self._apply_embedding_rotation_cols_z(rot, cols,
                                                     inverse=False)
        return cols, log_det

    def inverse_cols_z(self, slab, cols, log_det):
        rot = slab[:self.num_rotation_params]
        child = slab[self.num_rotation_params:]
        cols = self._apply_embedding_rotation_cols_z(rot, cols,
                                                     inverse=True)
        cols, log_det = self._inverse_cols_z(child, cols, log_det,
                                             rot_slab=rot)
        if self.euclidean_to_sphere_as_first:
            x0, x1, log_det = manifold.zsphere2_to_plane_cols(
                cols[0], cols[1], log_det)
            cols = (x0, x1)
        return cols, log_det

    def _forward_cols_z(self, child_slab, cols, log_det, rot_slab=None):
        raise NotImplementedError

    def _inverse_cols_z(self, child_slab, cols, log_det, rot_slab=None):
        raise NotImplementedError

    def _forward_cols(self, child_slab, cols, log_det, rot_slab=None):
        raise NotImplementedError

    def _inverse_cols(self, child_slab, cols, log_det, rot_slab=None):
        raise NotImplementedError

    # -- coordinate bookkeeping ------------------------------------------
    @property
    def embedded_dim(self):
        return self.dimension + 1

    @property
    def base_dim(self):
        if self.always_parametrize_in_embedding_space and \
                not self.euclidean_to_sphere_as_first:
            return self.dimension + 1
        return self.dimension

    def embedding_conditional_return(self, x):
        if x.shape[1] == self.dimension:
            x, _ = manifold.spherical_to_eucl(self.dimension, x, 0.0)
        return x

    def transform_target_space(self, x, log_det=0.0, transform_from="default",
                               transform_to="embedding"):
        """sphere_base.py:796-841."""
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
            return manifold.spherical_to_eucl(self.dimension, x, log_det)
        if (not currently_intrinsic) and want_intrinsic:
            return manifold.eucl_to_spherical(self.dimension, x, log_det)
        return x, log_det

    def default_params(self, rng=None):
        rng = rng or np.random.default_rng(0)
        parts = [rng.standard_normal(self.num_rotation_params)]
        parts.append(self._default_params(rng))
        return np.concatenate(parts)

    # hooks
    def _forward(self, params, x, log_det, rot_params=None):
        raise NotImplementedError

    def _inverse(self, params, x, log_det, rot_params=None):
        raise NotImplementedError

    def _default_params(self, rng):
        return rng.standard_normal(self.num_params - self.num_rotation_params)

    def param_structure(self):
        """Named slab layout: rotation params first (sphere_base.py:762
        slices child inputs after them), then the child layer's names."""
        rot_name = {"householder": "householder", "angles": "anglepars",
                    "xyz": "xyzpars", "quaternion": "quatpars"}[
                        self.rotation_mode]
        parts = []
        if self.num_rotation_params:
            parts.append((rot_name, self.num_rotation_params))
        parts += self._child_param_structure()
        assert sum(s for _, s in parts) == self.num_params, \
            (type(self).__name__, parts, self.num_params)
        return parts

    def _child_param_structure(self):
        rest = self.num_params - self.num_rotation_params
        return [("params", rest)] if rest else []


# ---------------------------------------------------------------------------
# Moebius flow on S1 - symbol "m"
# ---------------------------------------------------------------------------

MIN_OMEGA_RADIUS = 0.001
MAX_OMEGA_RADIUS = 0.999


def _moebius_omega(omega_pars, use_xyz=True):
    """Extract omega centers with radius sigmoid-bounded in (0.001, 0.999).

    omega_pars: (B, K, 4) [x, y, log_length, log_norm]
    (moebius_1d.py:140-216).
    """
    log_length_par = omega_pars[:, :, -2:-1]
    denom = jnp.logaddexp(0.0, -log_length_par)
    omega_length = MIN_OMEGA_RADIUS + jnp.exp(
        math.log(MAX_OMEGA_RADIUS - MIN_OMEGA_RADIUS) - denom)
    if use_xyz:
        normed = omega_pars[:, :, :2] / jnp.sqrt(
            jnp.sum(omega_pars[:, :, :2]**2, axis=2, keepdims=True))
        omega_vec = normed * omega_length
    else:
        omega_vec = jnp.concatenate(
            [jnp.cos(omega_pars[:, :, 0:1]) * omega_length,
             jnp.sin(omega_pars[:, :, 0:1]) * omega_length], axis=2)
    return omega_vec, omega_length


def moebius_trafo(x, omega_pars, use_xyz=True):
    """Convex combination of Moebius transforms on (-pi, pi)
    (moebius_1d.py:140-216)."""
    cos_x = jnp.cos(x)[:, None, :]
    sin_x = jnp.sin(x)[:, None, :]
    omega_vec, omega_length = _moebius_omega(omega_pars, use_xyz)

    o_m_o_sq = 1.0 - omega_length**2

    def xy_vals(cx, sx):
        o_p_o = 1.0 + omega_length**2 - 2.0 * (cx * omega_vec[:, :, 0:1]
                                               + sx * omega_vec[:, :, 1:2])
        y = o_m_o_sq * (sx - omega_vec[:, :, 1:2]) - omega_vec[:, :, 1:2] * o_p_o
        xx = o_m_o_sq * (cx - omega_vec[:, :, 0:1]) - omega_vec[:, :, 0:1] * o_p_o
        return xx, y

    # rotation fixing f(-pi) = -pi
    x_m_pi, y_m_pi = xy_vals(math.cos(-PI), math.sin(-PI))
    phi_m_pi = jnp.arctan2(y_m_pi, x_m_pi)
    rot = -PI - phi_m_pi

    x_val, y_val = xy_vals(cos_x, sin_x)
    x_p = jnp.cos(rot) * x_val - jnp.sin(rot) * y_val
    y_p = jnp.sin(rot) * x_val + jnp.cos(rot) * y_val
    arc = jnp.arctan2(y_p, x_p)[:, :, -1:] + PI

    log_norms = omega_pars[:, :, -1:]
    weights = jnp.exp(log_norms - jax.scipy.special.logsumexp(
        log_norms, axis=1, keepdims=True))
    return jnp.sum(arc * weights, axis=1) - PI


def moebius_trafo_deriv(x, omega_pars, use_xyz=True):
    """d moebius_trafo / dx > 0 (moebius_1d.py:219-259)."""
    cos_x = jnp.cos(x)[:, None, :]
    sin_x = jnp.sin(x)[:, None, :]
    omega_vec, omega_length = _moebius_omega(omega_pars, use_xyz)
    o_m_o_sq = 1.0 - omega_length**2
    o_p_o = 1.0 + omega_length**2 - 2.0 * (cos_x * omega_vec[:, :, 0:1]
                                           + sin_x * omega_vec[:, :, 1:2])
    log_norms = omega_pars[:, :, -1:]
    weighted = (jnp.log(o_m_o_sq / o_p_o) + log_norms) \
        - jax.scipy.special.logsumexp(log_norms, axis=1, keepdims=True)
    return jnp.exp(jax.scipy.special.logsumexp(weighted, axis=1))


def _moebius_omega_cols(slab, num_k, nop, use_xyz):
    """Column twin of _moebius_omega: slab (K*nop, Bp) k-major -> list of
    per-component (ox, oy, length, log_norm) columns (Bp,)."""
    out = []
    for k in range(num_k):
        p = [slab[k * nop + j] for j in range(nop)]
        log_length = p[-2]
        denom = jnp.logaddexp(0.0, -log_length)
        length = MIN_OMEGA_RADIUS + jnp.exp(
            math.log(MAX_OMEGA_RADIUS - MIN_OMEGA_RADIUS) - denom)
        if use_xyz:
            nrm = jnp.sqrt(p[0] ** 2 + p[1] ** 2)
            ox, oy = p[0] / nrm * length, p[1] / nrm * length
        else:
            ox, oy = jnp.cos(p[0]) * length, jnp.sin(p[0]) * length
        out.append((ox, oy, length, p[-1]))
    return out


def _moebius_eval_cols(x, om):
    """Column twin of moebius_trafo + moebius_trafo_deriv: x (B,) in
    (-pi, pi), om from _moebius_omega_cols.  Returns (y (B,),
    log_deriv (B,)) - one pass computes both (they share all terms)."""
    cos_x, sin_x = jnp.cos(x), jnp.sin(x)
    log_norms = [o[3] for o in om]
    m = log_norms[0]
    for ln in log_norms[1:]:
        m = jnp.maximum(m, ln)
    lse = m + jnp.log(sum(jnp.exp(ln - m) for ln in log_norms))

    y_acc = None
    logd_terms = []
    for ox, oy, length, ln in om:
        o_m_o_sq = 1.0 - length ** 2

        def xy(cx, sx):
            o_p_o = 1.0 + length ** 2 - 2.0 * (cx * ox + sx * oy)
            return (o_m_o_sq * (cx - ox) - ox * o_p_o,
                    o_m_o_sq * (sx - oy) - oy * o_p_o, o_p_o)

        # rotation fixing f(-pi) = -pi (moebius_1d.py:140-216)
        xm, ym, _ = xy(-1.0, 0.0)
        rot = -PI - jnp.arctan2(ym, xm)
        xv, yv, o_p_o = xy(cos_x, sin_x)
        xp = jnp.cos(rot) * xv - jnp.sin(rot) * yv
        yp = jnp.sin(rot) * xv + jnp.cos(rot) * yv
        arc = jnp.arctan2(yp, xp) + PI
        w = jnp.exp(ln - lse)
        y_acc = arc * w if y_acc is None else y_acc + arc * w
        logd_terms.append(jnp.log(o_m_o_sq / o_p_o) + ln - lse)

    mm = logd_terms[0]
    for t in logd_terms[1:]:
        mm = jnp.maximum(mm, t)
    log_deriv = mm + jnp.log(sum(jnp.exp(t - mm) for t in logd_terms))
    return y_acc - PI, log_deriv


class Moebius(SphereLayer):
    """Moebius circle flow - symbol "m" (moebius_1d.py:11-283)."""

    def __init__(self, dimension=1, euclidean_to_sphere_as_first=1,
                 add_rotation=0, natural_direction=0,
                 use_moebius_xyz_parametrization=True, num_basis_functions=5,
                 **kwargs):
        super().__init__(1, euclidean_to_sphere_as_first, add_rotation,
                         rotation_mode="householder", **kwargs)
        self.use_xyz = bool(use_moebius_xyz_parametrization)
        self.num_basis_functions = num_basis_functions
        self.num_omega_pars = 4 if self.use_xyz else 3
        self.natural_direction = int(natural_direction)
        self.num_params += num_basis_functions * self.num_omega_pars

    def _to_minus_pi_pi(self, x):
        return jnp.where(x > PI, x - TWO_PI, x)

    def _from_minus_pi_pi(self, x):
        return jnp.where(x < 0.0, x + TWO_PI, x)

    def _moebius_pars(self, params):
        return params.reshape(-1, self.num_basis_functions, self.num_omega_pars)

    def _child_param_structure(self):
        return [("moebius", self.num_basis_functions * self.num_omega_pars)]

    def _apply(self, params, x, log_det, sampling):
        mp = self._moebius_pars(params)
        if self.always_parametrize_in_embedding_space:
            x, log_det = manifold.eucl_to_spherical(1, x, log_det)
        x = self._to_minus_pi_pi(x)
        # natural direction: analytic map in the forward (sampling) pass
        analytic = (self.natural_direction and sampling) or \
                   (not self.natural_direction and not sampling)
        if analytic:
            log_deriv = jnp.sum(jnp.log(
                moebius_trafo_deriv(x, mp, self.use_xyz)), axis=-1)
            x = moebius_trafo(x, mp, self.use_xyz)
        else:
            inv = make_inverse_fn(
                lambda xx, p: moebius_trafo(xx, p, self.use_xyz),
                lambda xx, p: (moebius_trafo(xx, p, self.use_xyz),
                               moebius_trafo_deriv(xx, p, self.use_xyz)),
                lo=-PI, hi=PI, num_bisection_iter=20, num_newton_iter=20)
            x = inv(x, mp)
            log_deriv = -jnp.sum(jnp.log(
                moebius_trafo_deriv(x, mp, self.use_xyz)), axis=-1)
        log_det = log_det + log_deriv
        x = self._from_minus_pi_pi(x)
        if self.always_parametrize_in_embedding_space:
            x, log_det = manifold.spherical_to_eucl(1, x, log_det)
        return x, log_det

    def _forward(self, params, x, log_det, rot_params=None):
        return self._apply(params, x, log_det, sampling=True)

    def _inverse(self, params, x, log_det, rot_params=None):
        return self._apply(params, x, log_det, sampling=False)

    # -- column fast path ---------------------------------------------------
    def _supports_columns_child(self):
        return True

    def _apply_col(self, slab, x, log_det, sampling):
        om = _moebius_omega_cols(slab, self.num_basis_functions,
                                 self.num_omega_pars, self.use_xyz)
        x = self._to_minus_pi_pi(x)
        analytic = (self.natural_direction and sampling) or \
                   (not self.natural_direction and not sampling)
        if analytic:
            y, log_deriv = _moebius_eval_cols(x, om)
            x = y
        else:
            inv = make_inverse_fn(
                lambda xx, p: _moebius_eval_cols(xx, p)[0],
                lambda xx, p: (lambda yv, ld: (yv, jnp.exp(ld)))(
                    *_moebius_eval_cols(xx, p)),
                lo=-PI, hi=PI, num_bisection_iter=20, num_newton_iter=20)
            x = inv(x, om)
            log_deriv = -_moebius_eval_cols(x, om)[1]
        log_det = log_det + log_deriv
        return self._from_minus_pi_pi(x), log_det

    def _forward_cols(self, child_slab, cols, log_det, rot_slab=None):
        x, log_det = self._apply_col(child_slab, cols[0], log_det,
                                     sampling=True)
        return (x,), log_det

    def _inverse_cols(self, child_slab, cols, log_det, rot_slab=None):
        x, log_det = self._apply_col(child_slab, cols[0], log_det,
                                     sampling=False)
        return (x,), log_det


# ---------------------------------------------------------------------------
# Circular RQ-spline on S1 - symbol "o"
# ---------------------------------------------------------------------------

class CircularRQSpline(SphereLayer):
    """Circular rational-quadratic spline - symbol "o" (splines_1d.py:8-356)."""

    def __init__(self, dimension=1, euclidean_to_sphere_as_first=1,
                 add_rotation=1, natural_direction=1, num_basis_functions=2,
                 min_width=1e-4, min_height=1e-4, min_derivative=1e-4,
                 fix_boundary_derivatives=-1.0, smooth_second_derivative=1,
                 fix_first_width_n_height_to_zero=0,
                 also_fix_second_width_to_zero=0,
                 independent_width_height_parametrization=0, **kwargs):
        super().__init__(1, euclidean_to_sphere_as_first, add_rotation,
                         rotation_mode="householder", **kwargs)
        k = num_basis_functions
        self.num_basis_functions = k
        self.natural_direction = int(natural_direction)
        self.min_width = min_width
        self.min_height = min_height
        self.min_derivative = min_derivative
        self.fix_boundary_derivatives = fix_boundary_derivatives
        self.smooth_second_derivative = int(smooth_second_derivative)
        self.fix_first = int(fix_first_width_n_height_to_zero)
        self.fix_second_w = int(also_fix_second_width_to_zero)
        self.independent_wh = int(independent_width_height_parametrization)

        self.num_width_params = k
        self.num_height_params = k
        if self.fix_first:
            self.num_width_params = k - 1
            self.num_height_params = k - 1
            if self.fix_second_w:
                self.num_width_params -= 1

        self.boundary_log_derivs_fixed_value = None
        if self.smooth_second_derivative == 1:
            assert k == 2, "smooth circular spline needs 2 bins"
            bd_sub = 3
        else:
            if fix_boundary_derivatives > 0.0:
                assert fix_boundary_derivatives > min_derivative
                bd_sub = 2
                self.boundary_log_derivs_fixed_value = float(
                    np.log(np.exp(fix_boundary_derivatives - min_derivative) - 1.0))
            else:
                bd_sub = 1  # periodic: derivative at seam shared
        self.num_derivative_params = k + 1 - bd_sub
        self.num_params += (self.num_width_params + self.num_height_params
                            + self.num_derivative_params)

    def _unpack(self, params):
        w = params[:, :self.num_width_params]
        h = params[:, self.num_width_params:
                   self.num_width_params + self.num_height_params]
        d = params[:, self.num_width_params + self.num_height_params:]
        if self.fix_first:
            zero = jnp.zeros_like(h[:, :1])
            h = jnp.concatenate([zero, h], axis=1)
            if self.fix_second_w:
                w = jnp.concatenate([zero, zero, w], axis=1)
            else:
                w = jnp.concatenate([zero, w], axis=1)
        if self.independent_wh:
            h = w + h
        return w, h, d

    def _apply(self, params, x, log_det, sampling):
        if self.always_parametrize_in_embedding_space:
            x, log_det = manifold.eucl_to_spherical(1, x, log_det)
        x = safe_angle_within_2pi(x)
        w, h, d = self._unpack(params)
        # natural direction: spline-forward in the sampling pass
        use_inverse = not sampling if self.natural_direction else sampling
        if self.smooth_second_derivative == 0:
            if self.fix_boundary_derivatives > 0.0:
                fixed = jnp.full_like(d[:, :1], self.boundary_log_derivs_fixed_value)
                d = jnp.concatenate([fixed, d, fixed], axis=1)
            else:
                d = jnp.concatenate([d, d[:, :1]], axis=1)  # periodic seam
            res, ld = rq_spline(
                x, w[:, None, :], h[:, None, :], d[:, None, :],
                inverse=use_inverse, left=0.0, right=TWO_PI, bottom=0.0,
                top=TWO_PI, rel_min_bin_width=self.min_width,
                rel_min_bin_height=self.min_height,
                min_derivative=self.min_derivative)
        else:
            res, ld = rq_spline_smooth_circular(
                x, w[:, None, :], h[:, None, :], inverse=use_inverse,
                rel_min_bin_width=self.min_width,
                rel_min_bin_height=self.min_height, shift_to_middle=True)
        log_det = log_det + jnp.sum(ld, axis=-1)
        res = safe_angle_within_2pi(res)
        if self.always_parametrize_in_embedding_space:
            res, log_det = manifold.spherical_to_eucl(1, res, log_det)
        return res, log_det

    def _forward(self, params, x, log_det, rot_params=None):
        return self._apply(params, x, log_det, sampling=True)

    def _inverse(self, params, x, log_det, rot_params=None):
        return self._apply(params, x, log_det, sampling=False)

    # -- column fast path ---------------------------------------------------
    def _supports_columns_child(self):
        return True

    def _unpack_col_slab(self, slab):
        """Column twin of _unpack: slab (P_child, Bp) -> (w, h, d) column
        lists."""
        nw, nh = self.num_width_params, self.num_height_params
        w = [slab[i] for i in range(nw)]
        h = [slab[nw + i] for i in range(nh)]
        d = [slab[nw + nh + i] for i in range(self.num_derivative_params)]
        if self.fix_first:
            zero = jnp.zeros_like(slab[0])
            h = [zero] + h
            w = ([zero, zero] if self.fix_second_w else [zero]) + w
        if self.independent_wh:
            h = [wi + hi for wi, hi in zip(w, h)]
        return w, h, d

    def _apply_cols_spline(self, slab, x, log_det, sampling):
        x = safe_angle_within_2pi(x)
        w, h, d = self._unpack_col_slab(slab)
        use_inverse = not sampling if self.natural_direction else sampling
        if self.smooth_second_derivative == 0:
            if self.fix_boundary_derivatives > 0.0:
                fixed = jnp.asarray(self.boundary_log_derivs_fixed_value,
                                    dtype=x.dtype)[None]
                d = [fixed] + d + [fixed]
            else:
                d = d + [d[0]]          # periodic seam
            res, ld = rq_spline_cols(
                x, w, h, d, inverse=use_inverse, left=0.0, right=TWO_PI,
                bottom=0.0, top=TWO_PI, rel_min_bin_width=self.min_width,
                rel_min_bin_height=self.min_height,
                min_derivative=self.min_derivative)
        else:
            res, ld = rq_spline_smooth_circular_cols(
                x, w, h, inverse=use_inverse,
                rel_min_bin_width=self.min_width,
                rel_min_bin_height=self.min_height, shift_to_middle=True)
        log_det = log_det + ld
        return safe_angle_within_2pi(res), log_det

    def _forward_cols(self, child_slab, cols, log_det, rot_slab=None):
        x, log_det = self._apply_cols_spline(child_slab, cols[0], log_det,
                                             sampling=True)
        return (x,), log_det

    def _inverse_cols(self, child_slab, cols, log_det, rot_slab=None):
        x, log_det = self._apply_cols_spline(child_slab, cols[0], log_det,
                                             sampling=False)
        return (x,), log_det

    def _default_params(self, rng):
        n = (self.num_width_params + self.num_height_params
             + self.num_derivative_params)
        if self.smooth_second_derivative:
            return np.zeros(n)
        return np.full(n, 0.54)

    def _child_param_structure(self):
        return [("widths", self.num_width_params),
                ("heights", self.num_height_params),
                ("derivatives", self.num_derivative_params)]


# ---------------------------------------------------------------------------
# Spherical identity - symbol "y"
# ---------------------------------------------------------------------------

class SphericalIdentity(SphereLayer):
    """Identity spherical flow (optional rotation) - symbol "y"."""

    def __init__(self, dimension=1, euclidean_to_sphere_as_first=1,
                 add_rotation=0, **kwargs):
        super().__init__(dimension, euclidean_to_sphere_as_first, add_rotation,
                         rotation_mode="householder", **kwargs)

    def _forward(self, params, x, log_det, rot_params=None):
        return x, log_det

    def _inverse(self, params, x, log_det, rot_params=None):
        return x, log_det

    def _supports_columns_child(self):
        return True

    def _forward_cols(self, child_slab, cols, log_det, rot_slab=None):
        return cols, log_det

    def _inverse_cols(self, child_slab, cols, log_det, rot_slab=None):
        return cols, log_det

    def _default_params(self, rng):
        return np.zeros(0)
