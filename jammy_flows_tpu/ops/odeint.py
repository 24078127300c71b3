"""Adaptive ODE integration with adjoint gradients (TPU-native).

Embedded Runge-Kutta pairs with PI-free step control inside a bounded
``lax.while_loop`` (static trip limit, ``where``-masked accept/reject), and
reverse-mode gradients by the continuous adjoint method in a ``custom_vjp``
— the JAX equivalent of the reference's ``torchdiffeq.odeint_adjoint``
(cnf_sphere_charts.py:228-244).  All control flow is compiler-friendly:
no data-dependent shapes, one while_loop forward, one backward.

Implements the adaptive methods the reference's 'c' layer accepts
(flow_options.py:147): dopri5 (default), dopri8 (Prince-Dormand 8(7)13M),
bosh3 (Bogacki-Shampine 3(2)), fehlberg2 (RKF 2(1)), adaptive_heun
(Heun-Euler 2(1)).  Fixed-step euler/midpoint/rk4 live in the CNF layer.

The state may be any pytree; step-size control uses a joint RMS error norm
over the flattened state (torchdiffeq's convention for batched states).
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.flatten_util import ravel_pytree


class _Tableau(NamedTuple):
    c: Tuple[float, ...]
    a: Tuple[Tuple[float, ...], ...]
    b_sol: Tuple[float, ...]       # higher-order (propagating) weights
    b_err: Tuple[float, ...]       # b_sol - b_embedded (error-estimate weights)
    order: int                     # order of the propagating solution


def _make(c, a, b_sol, b_low, order):
    b_err = tuple(s - l for s, l in zip(b_sol, b_low))
    return _Tableau(tuple(c), tuple(tuple(r) for r in a), tuple(b_sol),
                    b_err, order)


# Dormand-Prince 5(4) — the classic dopri5 pair.
_DOPRI5 = _make(
    c=(0.0, 1 / 5, 3 / 10, 4 / 5, 8 / 9, 1.0, 1.0),
    a=(
        (),
        (1 / 5,),
        (3 / 40, 9 / 40),
        (44 / 45, -56 / 15, 32 / 9),
        (19372 / 6561, -25360 / 2187, 64448 / 6561, -212 / 729),
        (9017 / 3168, -355 / 33, 46732 / 5247, 49 / 176, -5103 / 18656),
        (35 / 384, 0.0, 500 / 1113, 125 / 192, -2187 / 6784, 11 / 84),
    ),
    b_sol=(35 / 384, 0.0, 500 / 1113, 125 / 192, -2187 / 6784, 11 / 84, 0.0),
    b_low=(5179 / 57600, 0.0, 7571 / 16695, 393 / 640, -92097 / 339200,
           187 / 2100, 1 / 40),
    order=5,
)

# Bogacki-Shampine 3(2).
_BOSH3 = _make(
    c=(0.0, 1 / 2, 3 / 4, 1.0),
    a=((), (1 / 2,), (0.0, 3 / 4), (2 / 9, 1 / 3, 4 / 9)),
    b_sol=(2 / 9, 1 / 3, 4 / 9, 0.0),
    b_low=(7 / 24, 1 / 4, 1 / 3, 1 / 8),
    order=3,
)

# Runge-Kutta-Fehlberg 2(1) (torchdiffeq's "fehlberg2").
_FEHLBERG2 = _make(
    c=(0.0, 1 / 2, 1.0),
    a=((), (1 / 2,), (1 / 256, 255 / 256)),
    b_sol=(1 / 512, 255 / 256, 1 / 512),
    b_low=(1 / 256, 255 / 256, 0.0),
    order=2,
)

# Heun-Euler 2(1) ("adaptive_heun").
_ADAPTIVE_HEUN = _make(
    c=(0.0, 1.0),
    a=((), (1.0,)),
    b_sol=(1 / 2, 1 / 2),
    b_low=(1.0, 0.0),
    order=2,
)

# Prince-Dormand 8(7)13M — the 13-stage pair behind torchdiffeq's "dopri8"
# (and GSL's rk8pd).
_DOPRI8 = _make(
    c=(0.0, 1 / 18, 1 / 12, 1 / 8, 5 / 16, 3 / 8, 59 / 400, 93 / 200,
       5490023248 / 9719169821, 13 / 20, 1201146811 / 1299019798, 1.0, 1.0),
    a=(
        (),
        (1 / 18,),
        (1 / 48, 1 / 16),
        (1 / 32, 0.0, 3 / 32),
        (5 / 16, 0.0, -75 / 64, 75 / 64),
        (3 / 80, 0.0, 0.0, 3 / 16, 3 / 20),
        (29443841 / 614563906, 0.0, 0.0, 77736538 / 692538347,
         -28693883 / 1125000000, 23124283 / 1800000000),
        (16016141 / 946692911, 0.0, 0.0, 61564180 / 158732637,
         22789713 / 633445777, 545815736 / 2771057229,
         -180193667 / 1043307555),
        (39632708 / 573591083, 0.0, 0.0, -433636366 / 683701615,
         -421739975 / 2616292301, 100302831 / 723423059,
         790204164 / 839813087, 800635310 / 3783071287),
        (246121993 / 1340847787, 0.0, 0.0, -37695042795 / 15268766246,
         -309121744 / 1061227803, -12992083 / 490766935,
         6005943493 / 2108947869, 393006217 / 1396673457,
         123872331 / 1001029789),
        (-1028468189 / 846180014, 0.0, 0.0, 8478235783 / 508512852,
         1311729495 / 1432422823, -10304129995 / 1701304382,
         -48777925059 / 3047939560, 15336726248 / 1032824649,
         -45442868181 / 3398467696, 3065993473 / 597172653),
        (185892177 / 718116043, 0.0, 0.0, -3185094517 / 667107341,
         -477755414 / 1098053517, -703635378 / 230739211,
         5731566787 / 1027545527, 5232866602 / 850066563,
         -4093664535 / 808688257, 3962137247 / 1805957418,
         65686358 / 487910083),
        (403863854 / 491063109, 0.0, 0.0, -5068492393 / 434740067,
         -411421997 / 543043805, 652783627 / 914296604,
         11173962825 / 925320556, -13158990841 / 6184727034,
         3936647629 / 1978049680, -160528059 / 685178525,
         248638103 / 1413531060, 0.0),
    ),
    b_sol=(14005451 / 335480064, 0.0, 0.0, 0.0, 0.0,
           -59238493 / 1068277825, 181606767 / 758867731,
           561292985 / 797845732, -1041891430 / 1371343529,
           760417239 / 1151165299, 118820643 / 751138087,
           -528747749 / 2220607170, 1 / 4),
    b_low=(13451932 / 455176623, 0.0, 0.0, 0.0, 0.0,
           -808719846 / 976000145, 1757004468 / 5645159321,
           656045339 / 265891186, -3867574721 / 1518517206,
           465885868 / 322736535, 53011238 / 667516719, 2 / 45, 0.0),
    order=8,
)

TABLEAUS = {
    "dopri5": _DOPRI5,
    "dopri8": _DOPRI8,
    "bosh3": _BOSH3,
    "fehlberg2": _FEHLBERG2,
    "adaptive_heun": _ADAPTIVE_HEUN,
}


def _rk_step(tab, f, t, y, h):
    """One embedded RK step on a flat state: returns (y_new, error_estimate).

    The stage/accumulation loops unroll at trace time; zero coefficients
    generate no ops.
    """
    ks = []
    for i in range(len(tab.c)):
        yi = y
        for j, aij in enumerate(tab.a[i]):
            if aij != 0.0:
                yi = yi + (h * aij) * ks[j]
        ks.append(f(t + tab.c[i] * h, yi))
    y_new = y
    err = jnp.zeros_like(y)
    for b, e, k in zip(tab.b_sol, tab.b_err, ks):
        if b != 0.0:
            y_new = y_new + (h * b) * k
        if e != 0.0:
            err = err + (h * e) * k
    return y_new, err


def _odeint_flat(tab, f, y0, t0, t1, rtol, atol, max_steps):
    """Adaptive integration of a flat state from t0 to t1 (either direction).

    Bounded while_loop: each iteration attempts one step; rejected steps
    shrink h and retry (both count toward max_steps).  The final partial
    step is clipped exactly onto t1.
    """
    dtype = y0.dtype
    t0 = jnp.asarray(t0, dtype)
    t1 = jnp.asarray(t1, dtype)
    span = t1 - t0
    direction = jnp.sign(span)
    h0 = span / 16.0
    tol_t = jnp.abs(span) * 1e-10 + 1e-12
    exponent = -1.0 / tab.order

    def cond(carry):
        t, y, h, steps = carry
        return (direction * (t1 - t) > tol_t) & (steps < max_steps)

    def body(carry):
        t, y, h, steps = carry
        overshoot = direction * (t + h - t1) > 0
        h_try = jnp.where(overshoot, t1 - t, h)
        y_new, y_err = _rk_step(tab, f, t, y, h_try)
        scale = atol + rtol * jnp.maximum(jnp.abs(y), jnp.abs(y_new))
        err = jnp.sqrt(jnp.mean((y_err / scale) ** 2))
        err = jnp.where(jnp.isfinite(err), err, jnp.asarray(2.0, dtype))
        accept = err <= 1.0
        factor = jnp.clip(0.9 * jnp.maximum(err, 1e-10) ** exponent, 0.2, 5.0)
        h_next = h_try * factor
        # never let |h| collapse below the time resolution
        h_min = tol_t * 10.0
        h_next = jnp.where(jnp.abs(h_next) < h_min, direction * h_min, h_next)
        t = jnp.where(accept, t + h_try, t)
        y = jnp.where(accept, y_new, y)
        return (t, y, h_next, steps + 1)

    _, y, _, steps = lax.while_loop(cond, body, (t0, y0, h0, jnp.int32(0)))
    return y, steps


@partial(jax.custom_vjp, nondiff_argnums=(0, 3, 4, 5, 6, 7, 8))
def odeint(func, y0, args, t0, t1, rtol=1e-7, atol=1e-7, max_steps=1000,
           method="dopri5"):
    """Integrate dy/dt = func(t, y, args) from t0 to t1 (pytree state).

    ``method`` picks the embedded pair (TABLEAUS keys).  Differentiable
    w.r.t. ``y0`` and ``args`` via the continuous adjoint method (backward
    adaptive solve of the augmented system).  ``t0``/``t1`` are static
    floats; t1 < t0 integrates backward in time.
    """
    tab = TABLEAUS[method]
    y_flat, unravel = ravel_pytree(y0)

    def f_flat(t, y):
        return ravel_pytree(func(t, unravel(y), args))[0]

    y1_flat, _ = _odeint_flat(tab, f_flat, y_flat, t0, t1, rtol, atol,
                              max_steps)
    return unravel(y1_flat)


def _odeint_fwd(func, y0, args, t0, t1, rtol, atol, max_steps, method):
    y1 = odeint(func, y0, args, t0, t1, rtol, atol, max_steps, method)
    return y1, (y1, args)


def _odeint_bwd(func, t0, t1, rtol, atol, max_steps, method, res, ct_y1):
    """Continuous adjoint: integrate (y, a, grad_args) from t1 back to t0.

    a(t) = dL/dy(t) with da/dt = -a^T df/dy; dL/dargs accumulates
    -a^T df/dargs along the backward pass (net + over [t0, t1]).
    """
    tab = TABLEAUS[method]
    y1, args = res
    args_flat, unravel_args = ravel_pytree(args)
    y1_flat, unravel_y = ravel_pytree(y1)
    ct_flat, _ = ravel_pytree(ct_y1)
    ga0 = jnp.zeros_like(args_flat)

    n_y = y1_flat.shape[0]
    n_a = ct_flat.shape[0]

    def aug_f(t, state):
        y = state[:n_y]
        a = state[n_y:n_y + n_a]

        def f_of(y_flat_in, args_flat_in):
            out = func(t, unravel_y(y_flat_in), unravel_args(args_flat_in))
            return ravel_pytree(out)[0]

        f_val, vjp_fn = jax.vjp(f_of, y, args_flat)
        ct_y, ct_args = vjp_fn(a)
        return jnp.concatenate([f_val, -ct_y, -ct_args])

    state1 = jnp.concatenate([y1_flat, ct_flat, ga0])
    state0, _ = _odeint_flat(tab, aug_f, state1, t1, t0, rtol, atol,
                             max_steps)
    ct_y0 = unravel_y(state0[n_y:n_y + n_a])
    ct_args = unravel_args(state0[n_y + n_a:])
    return (ct_y0, ct_args)


odeint.defvjp(_odeint_fwd, _odeint_bwd)


def odeint_dopri5(func, y0, args, t0, t1, rtol=1e-7, atol=1e-7,
                  max_steps=1000):
    """Backward-compatible dopri5 wrapper around :func:`odeint`."""
    return odeint(func, y0, args, t0, t1, rtol, atol, max_steps, "dopri5")
