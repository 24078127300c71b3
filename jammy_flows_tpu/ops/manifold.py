"""Manifold projection kernels with exact log-determinants.

TPU-native equivalents of the base-layer geometry in the reference:
  * circle/sphere <-> plane Gaussian-CDF stereographic-like projections
    (sphere_base.py:456-598)
  * spherical <-> Euclidean embedding transforms (sphere_base.py:242-362)
  * real line <-> interval via the Gaussian CDF (interval_base.py:33-59)
  * gauss <-> box <-> base simplex <-> canonical simplex chain
    (simplex_base.py:44-166)

Everything operates on batched (B, d) arrays and a (B,) log_det accumulator.
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp

PI = math.pi
TWO_PI = 2.0 * math.pi
SQRT2 = math.sqrt(2.0)
LOG_SQRT_2PI = 0.5 * math.log(2.0 * math.pi)



def _safe_acos_arg(x, margin=None):
    """Clip an arccos argument with a dtype-aware margin so the arccos
    gradient stays finite even where clipping is active (0 * inf = nan
    otherwise)."""
    if margin is None:
        margin = 1e-14 if x.dtype == jnp.float64 else 1e-7
    return jnp.clip(x, -1.0 + margin, 1.0 - margin)

def safe_angle_within_pi(x, margin=1e-7):
    """Clamp a polar angle away from 0 and pi (sphere_base.py:8-19)."""
    return jnp.clip(x, margin, PI - margin)


def safe_costheta(x, margin=None, dtype=None):
    """Clamp cos(theta) away from +-1 (sphere_base.py:21-38)."""
    if margin is None:
        d = dtype if dtype is not None else x.dtype
        margin = 1e-10 if d == jnp.float64 else 1e-7
    return jnp.clip(x, -1.0 + margin, 1.0 - margin)


# ---------------------------------------------------------------------------
# S1 (circle)
# ---------------------------------------------------------------------------

def plane_to_circle(x, log_det):
    """R^1 -> [0, 2pi) through the Gaussian CDF (sphere_base.py:523-539).

    x: (B, 1).  Positive reals map to (0, pi], negative to (pi, 2pi).
    """
    radius = jnp.abs(x)
    keep_sign = x >= 0
    log_det = log_det + LOG_SQRT_2PI - 0.5 * radius[:, 0]**2
    angle = PI * (1.0 - jax.scipy.special.erf(radius / SQRT2))
    angle = jnp.where(keep_sign, angle, TWO_PI - angle)
    return angle, log_det


def circle_to_plane(x, log_det):
    """[0, 2pi) -> R^1, inverse of :func:`plane_to_circle`
    (sphere_base.py:456-481)."""
    sign = jnp.where(x > PI, -1.0, 1.0)
    folded = jnp.where(sign > 0, x, TWO_PI - x)
    eps = 1e-8 if x.dtype == jnp.float64 else 1e-5
    folded = jnp.clip(folded, eps, TWO_PI - eps)
    r = SQRT2 * jax.scipy.special.erfinv(1.0 - folded / PI)
    log_det = log_det - LOG_SQRT_2PI + 0.5 * r[:, 0]**2
    return r * sign, log_det


# ---------------------------------------------------------------------------
# S2 (2-sphere)
# ---------------------------------------------------------------------------

def plane_to_sphere2(x, log_det):
    """R^2 -> (theta, phi) via the radial Gaussian-CDF projection
    (sphere_base.py:541-598 for the non-cylinder branch).

    The log-det uses the spherical measure convention of the reference:
    the radial r-factors cancel against inplane polar factors and the
    sin(theta) area element is dropped (kept implicitly in the measure).
    """
    radius = jnp.sqrt(jnp.sum(x**2, axis=-1, keepdims=True))
    acos_arg = jnp.where(radius == 0.0, 1.0, x[:, :1] / jnp.maximum(radius, 1e-30))
    phi = jnp.arccos(_safe_acos_arg(acos_arg))
    phi = jnp.where(x[:, 1:2] < 0, TWO_PI - phi, phi)

    theta = jnp.arccos(_safe_acos_arg(1.0 - 2.0 * jnp.exp(-0.5 * radius**2)))
    theta = safe_angle_within_pi(theta)
    log_det = log_det + jnp.log(1.0 - jnp.cos(theta[:, 0])) \
        - jnp.log(jnp.sin(theta[:, 0]))
    return jnp.concatenate([theta, phi], axis=1), log_det


def sphere2_to_plane(x, log_det):
    """(theta, phi) -> R^2, inverse of :func:`plane_to_sphere2`
    (sphere_base.py:482-521)."""
    theta = safe_angle_within_pi(x[:, :1])
    cos_t = safe_costheta(jnp.cos(theta), margin=1e-6)
    r = jnp.sqrt(-2.0 * jnp.log(0.5 * (1.0 - cos_t)))
    log_det = log_det - jnp.log(1.0 - cos_t[:, 0]) + jnp.log(jnp.sin(theta[:, 0]))
    phi = x[:, 1:2]
    return jnp.concatenate([r * jnp.cos(phi), r * jnp.sin(phi)], axis=1), log_det


# ---------------------------------------------------------------------------
# Spherical <-> Euclidean embedding
# ---------------------------------------------------------------------------

def spherical_to_eucl(dim, x, log_det):
    """Intrinsic angles -> embedded unit vector (sphere_base.py:305-332)."""
    if dim == 1:
        return jnp.concatenate([jnp.cos(x), jnp.sin(x)], axis=1), log_det
    if dim == 2:
        theta = safe_angle_within_pi(x[:, :1])
        phi = x[:, 1:2]
        st = jnp.sin(theta)
        eucl = jnp.concatenate(
            [st * jnp.cos(phi), st * jnp.sin(phi), jnp.cos(theta)], axis=1)
        log_det = log_det + jnp.log(st[:, 0])
        return eucl, log_det
    raise NotImplementedError("only S1 and S2 supported")


def eucl_to_spherical(dim, x, log_det):
    """Embedded unit vector -> intrinsic angles (sphere_base.py:242-303)."""
    if dim == 1:
        norm = jnp.sqrt(jnp.sum(x**2, axis=1, keepdims=True))
        ang = jnp.arccos(_safe_acos_arg(x[:, :1] / norm))
        ang = jnp.where(x[:, 1:2] < 0, TWO_PI - ang, ang)
        return ang, log_det
    if dim == 2:
        norm = jnp.sqrt(jnp.sum(x**2, axis=-1, keepdims=True))
        theta = jnp.arccos(_safe_acos_arg(x[:, 2:3] / norm))
        theta = safe_angle_within_pi(theta)
        log_det = log_det - jnp.log(jnp.sin(theta[:, 0]))
        xy_norm = jnp.sqrt(jnp.sum(x[:, :2]**2, axis=-1, keepdims=True))
        acos_arg = _safe_acos_arg(x[:, :1] / jnp.maximum(xy_norm, 1e-30))
        phi = jnp.arccos(acos_arg)
        phi = jnp.where(x[:, 1:2] < 0, TWO_PI - phi, phi)
        return jnp.concatenate([theta, phi], axis=1), log_det
    raise NotImplementedError("only S1 and S2 supported")


# ---------------------------------------------------------------------------
# Interval
# ---------------------------------------------------------------------------

def real_line_to_interval(x, log_det, low, high):
    """R -> [low, high] via Gaussian CDF (interval_base.py:33-45)."""
    width = high - low
    res = 0.5 + 0.5 * jax.scipy.special.erf(x / SQRT2)
    res = res * width + low
    log_det = log_det - 0.5 * x[:, 0]**2 - LOG_SQRT_2PI + math.log(width)
    return res, log_det


def interval_to_real_line(x, log_det, low, high):
    """[low, high] -> R (interval_base.py:47-59)."""
    width = high - low
    u = (x - low) / width
    res = jax.scipy.special.erfinv(2.0 * u - 1.0) * SQRT2
    log_det = log_det + 0.5 * res[:, 0]**2 + LOG_SQRT_2PI - math.log(width)
    return res, log_det


# ---------------------------------------------------------------------------
# Simplex chain
# ---------------------------------------------------------------------------

def gauss_to_box(x, log_det):
    """R^d -> (0,1)^d via the Gaussian CDF."""
    log_det = log_det + jnp.sum(-0.5 * x**2 - LOG_SQRT_2PI, axis=-1)
    return 0.5 * (1.0 + jax.scipy.special.erf(x / SQRT2)), log_det


def box_to_gauss(x, log_det):
    res = SQRT2 * jax.scipy.special.erfinv(2.0 * x - 1.0)
    log_det = log_det - jnp.sum(-0.5 * res**2 - LOG_SQRT_2PI, axis=-1)
    return res, log_det


def box_to_skewed_box(x, log_det):
    """Skew the box so the induced simplex density is flat
    (simplex_base.py:44-66).  All dims but the last get u -> 1-(1-u)^(1/2).

    NOTE: the log-det here is the mathematically exact Jacobian
    sum(-log 2 - log(1 - u_new)); the reference's forward factor
    (simplex_base.py:64) uses -0.5*log(1-u_new) and a single -log 2, which is
    inconsistent with its own inverse (simplex_base.py:78) - we keep the flow
    exactly invertible instead.
    """
    if x.shape[1] > 1:
        head = 1.0 - jnp.sqrt(1.0 - x[:, :-1])
        log_det = log_det + jnp.sum(
            -jnp.log(jnp.maximum(1.0 - head, jnp.finfo(x.dtype).tiny)), axis=-1) \
            - math.log(2.0) * (x.shape[1] - 1)
        x = jnp.concatenate([head, x[:, -1:]], axis=1)
    return x, log_det


def skewed_box_to_box(x, log_det):
    if x.shape[1] > 1:
        log_det = log_det + jnp.sum(
            jnp.log(jnp.maximum(1.0 - x[:, :-1], jnp.finfo(x.dtype).tiny)), axis=-1) \
            + math.log(2.0) * (x.shape[1] - 1)
        head = 1.0 - (1.0 - x[:, :-1])**2
        x = jnp.concatenate([head, x[:, -1:]], axis=1)
    return x, log_det


def box_to_base_simplex(x, log_det):
    """Box -> axis-aligned base simplex (simplex_base.py:97-115).

    res[i] = x[i] * prod_{j<i}(1 - x[j]); log_det += sum_i sum_{j<i} log(1-x[j]).
    """
    d = x.shape[1]
    one_minus = 1.0 - x
    # exclusive cumulative product along dims
    cum = jnp.cumprod(one_minus, axis=1)
    excl = jnp.concatenate([jnp.ones_like(cum[:, :1]), cum[:, :-1]], axis=1)
    res = x * excl
    if d > 1:
        weights = jnp.arange(d - 1, 0, -1, dtype=x.dtype)  # dim j<d-1 counted (d-1-j) times
        log_det = log_det + jnp.sum(
            weights * jnp.log(jnp.maximum(one_minus[:, :-1], jnp.finfo(x.dtype).tiny)), axis=-1)
    return res, log_det


def base_simplex_to_box(x, log_det):
    """Base simplex -> box (simplex_base.py:117-139)."""
    d = x.shape[1]
    cums = jnp.cumsum(x, axis=1)
    excl = jnp.concatenate([jnp.zeros_like(cums[:, :1]), cums[:, :-1]], axis=1)
    denom = jnp.maximum(1.0 - excl, jnp.finfo(x.dtype).tiny)
    res = x / denom
    if d > 1:
        log_det = log_det - jnp.sum(jnp.log(denom[:, 1:]), axis=-1)
    return res, log_det


def simplex_projection_matrices(dim, dtype=jnp.float64):
    """(M, M_reverse) projecting base simplex <-> canonical simplex
    (simplex_base.py:25-36)."""
    import numpy as np
    m = np.zeros((dim, dim + 1))
    m[:, 0] = -1.0
    m[:, 1:] = np.eye(dim)
    m_rev = np.full((dim + 1, dim), -1.0)
    for ind in range(dim):
        m_rev[1 + ind, ind] = dim
    m_rev /= (1.0 + dim)
    return jnp.asarray(m, dtype=dtype), jnp.asarray(m_rev, dtype=dtype)


def base_simplex_to_canonical(x, log_det):
    dim = x.shape[1]
    m, _ = simplex_projection_matrices(dim, dtype=x.dtype)
    onehot = jnp.zeros((dim + 1,), dtype=x.dtype).at[0].set(1.0)
    res = onehot + jnp.einsum("bi,ij->bj", x, m, precision=jax.lax.Precision.HIGHEST)
    return res, log_det + 0.5 * math.log(dim + 1)


def canonical_simplex_to_base(x, log_det):
    dim = x.shape[1] - 1
    _, m_rev = simplex_projection_matrices(dim, dtype=x.dtype)
    onehot = jnp.zeros((dim + 1,), dtype=x.dtype).at[0].set(1.0)
    res = jnp.einsum("bi,ij->bj", x - onehot, m_rev, precision=jax.lax.Precision.HIGHEST)
    return res, log_det - 0.5 * math.log(dim + 1)


# ---------------------------------------------------------------------------
# Column variants: per-sample quantities as flat (B,) arrays.
#
# Rank-2 arrays with a tiny dimension - (B, 1), (B, 2), (2, B) - are
# tile-padded on TPU and run ~11x slower than flat (B,) arrays (measured
# v5e, 2026-08-20; see ops/splines.py column section).  These twins carry
# coordinates as tuples of (B,) columns; same math as above, parity-tested.
# ---------------------------------------------------------------------------

def plane_to_circle_cols(x, log_det):
    """Column twin of plane_to_circle: x (B,) -> angle (B,)."""
    radius = jnp.abs(x)
    keep_sign = x >= 0
    log_det = log_det + LOG_SQRT_2PI - 0.5 * radius**2
    angle = PI * (1.0 - jax.scipy.special.erf(radius / SQRT2))
    angle = jnp.where(keep_sign, angle, TWO_PI - angle)
    return angle, log_det


def circle_to_plane_cols(x, log_det):
    sign = jnp.where(x > PI, -1.0, 1.0)
    folded = jnp.where(sign > 0, x, TWO_PI - x)
    eps = 1e-8 if x.dtype == jnp.float64 else 1e-5
    folded = jnp.clip(folded, eps, TWO_PI - eps)
    r = SQRT2 * jax.scipy.special.erfinv(1.0 - folded / PI)
    log_det = log_det - LOG_SQRT_2PI + 0.5 * r**2
    return r * sign, log_det


def plane_to_sphere2_cols(x0, x1, log_det):
    """Column twin of plane_to_sphere2: (x0, x1) (B,) -> (theta, phi)."""
    radius = jnp.sqrt(x0**2 + x1**2)
    acos_arg = jnp.where(radius == 0.0, 1.0, x0 / jnp.maximum(radius, 1e-30))
    phi = jnp.arccos(_safe_acos_arg(acos_arg))
    phi = jnp.where(x1 < 0, TWO_PI - phi, phi)

    theta = jnp.arccos(_safe_acos_arg(1.0 - 2.0 * jnp.exp(-0.5 * radius**2)))
    theta = safe_angle_within_pi(theta)
    log_det = log_det + jnp.log(1.0 - jnp.cos(theta)) - jnp.log(jnp.sin(theta))
    return theta, phi, log_det


def sphere2_to_plane_cols(theta, phi, log_det):
    theta = safe_angle_within_pi(theta)
    cos_t = safe_costheta(jnp.cos(theta), margin=1e-6)
    r = jnp.sqrt(-2.0 * jnp.log(0.5 * (1.0 - cos_t)))
    log_det = log_det - jnp.log(1.0 - cos_t) + jnp.log(jnp.sin(theta))
    return r * jnp.cos(phi), r * jnp.sin(phi), log_det


def plane_to_zsphere2_cols(x0, x1, log_det):
    """Plane -> (z = cos(theta), phi) columns, log-det in the (z, phi)
    measure.  |d(z, phi)/d(x0, x1)| = (1/r) * dz/dr = 1 - z with
    z = 1 - 2 exp(-r^2/2): no trig at all (the (theta, phi) variant pays
    arccos + log(sin) here and the z-carrier needs neither)."""
    radius = jnp.sqrt(x0**2 + x1**2)
    acos_arg = jnp.where(radius == 0.0, 1.0, x0 / jnp.maximum(radius, 1e-30))
    phi = jnp.arccos(_safe_acos_arg(acos_arg))
    phi = jnp.where(x1 < 0, TWO_PI - phi, phi)
    z = safe_costheta(1.0 - 2.0 * jnp.exp(-0.5 * radius**2), margin=1e-6)
    log_det = log_det + jnp.log(1.0 - z)
    return z, phi, log_det


def zsphere2_to_plane_cols(z, phi, log_det):
    """(z, phi) columns -> plane, log-det in the (z, phi) measure."""
    z = safe_costheta(z, margin=1e-6)
    r = jnp.sqrt(-2.0 * jnp.log(0.5 * (1.0 - z)))
    log_det = log_det - jnp.log(1.0 - z)
    return r * jnp.cos(phi), r * jnp.sin(phi), log_det


def zphi_to_eucl_cols(z, phi):
    """(z, phi) -> embedding (x, y, z) columns.  NO log-det: the sphere
    area element is dA = dz dphi, so this is measure-preserving by
    construction (and rotations in between are too)."""
    z = safe_costheta(z, margin=1e-7)
    st = jnp.sqrt(jnp.maximum(1.0 - z * z, 1e-14))
    return st * jnp.cos(phi), st * jnp.sin(phi), z


def eucl_to_zphi_cols(x, y, z):
    """Embedding (x, y, z) columns -> (z, phi).  NO log-det (see
    zphi_to_eucl_cols)."""
    norm = jnp.sqrt(x**2 + y**2 + z**2)
    zn = safe_costheta(z / norm, margin=1e-7)
    xy_norm = jnp.sqrt(x**2 + y**2)
    acos_arg = _safe_acos_arg(x / jnp.maximum(xy_norm, 1e-30))
    phi = jnp.arccos(acos_arg)
    phi = jnp.where(y < 0, TWO_PI - phi, phi)
    return zn, phi


def spherical_to_eucl_cols(theta, phi, log_det):
    """Column twin of spherical_to_eucl (S2): angles -> (x, y, z) columns."""
    theta = safe_angle_within_pi(theta)
    st = jnp.sin(theta)
    log_det = log_det + jnp.log(st)
    return st * jnp.cos(phi), st * jnp.sin(phi), jnp.cos(theta), log_det


def eucl_to_spherical_cols(x, y, z, log_det):
    norm = jnp.sqrt(x**2 + y**2 + z**2)
    theta = jnp.arccos(_safe_acos_arg(z / norm))
    theta = safe_angle_within_pi(theta)
    log_det = log_det - jnp.log(jnp.sin(theta))
    xy_norm = jnp.sqrt(x**2 + y**2)
    acos_arg = _safe_acos_arg(x / jnp.maximum(xy_norm, 1e-30))
    phi = jnp.arccos(acos_arg)
    phi = jnp.where(y < 0, TWO_PI - phi, phi)
    return theta, phi, log_det


def circle_spherical_to_eucl_cols(angle, log_det):
    """S1 intrinsic angle -> (x, y) columns."""
    return jnp.cos(angle), jnp.sin(angle), log_det


def circle_eucl_to_spherical_cols(x, y, log_det):
    norm = jnp.sqrt(x**2 + y**2)
    ang = jnp.arccos(_safe_acos_arg(x / norm))
    ang = jnp.where(y < 0, TWO_PI - ang, ang)
    return ang, log_det


def real_line_to_interval_cols(x, log_det, low, high):
    """Column twin of real_line_to_interval: x (B,)."""
    width = high - low
    res = 0.5 + 0.5 * jax.scipy.special.erf(x / SQRT2)
    res = res * width + low
    log_det = log_det - 0.5 * x**2 - LOG_SQRT_2PI + math.log(width)
    return res, log_det


def interval_to_real_line_cols(x, log_det, low, high):
    width = high - low
    u = (x - low) / width
    res = jax.scipy.special.erfinv(2.0 * u - 1.0) * SQRT2
    log_det = log_det + 0.5 * res**2 + LOG_SQRT_2PI - math.log(width)
    return res, log_det
