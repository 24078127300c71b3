"""Adaptive ODE integration with adjoint gradients (TPU-native).

Dormand-Prince 5(4) with PI-free step control inside a bounded
``lax.while_loop`` (static trip limit, ``where``-masked accept/reject), and
reverse-mode gradients by the continuous adjoint method in a ``custom_vjp``
— the JAX equivalent of the reference's ``torchdiffeq.odeint_adjoint``
(cnf_sphere_charts.py:228-244).  All control flow is compiler-friendly:
no data-dependent shapes, one while_loop forward, one backward.

The state may be any pytree; step-size control uses a joint RMS error norm
over the flattened state (torchdiffeq's convention for batched states).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax
from jax.flatten_util import ravel_pytree

# Dormand-Prince 5(4) Butcher tableau
_C = (0.0, 1 / 5, 3 / 10, 4 / 5, 8 / 9, 1.0, 1.0)
_A = (
    (),
    (1 / 5,),
    (3 / 40, 9 / 40),
    (44 / 45, -56 / 15, 32 / 9),
    (19372 / 6561, -25360 / 2187, 64448 / 6561, -212 / 729),
    (9017 / 3168, -355 / 33, 46732 / 5247, 49 / 176, -5103 / 18656),
    (35 / 384, 0.0, 500 / 1113, 125 / 192, -2187 / 6784, 11 / 84),
)
_B5 = (35 / 384, 0.0, 500 / 1113, 125 / 192, -2187 / 6784, 11 / 84, 0.0)
_B4 = (5179 / 57600, 0.0, 7571 / 16695, 393 / 640, -92097 / 339200,
       187 / 2100, 1 / 40)


def _dopri5_step(f, t, y, h):
    """One Dormand-Prince step on a flat state: returns (y5, error_estimate)."""
    ks = []
    for i in range(7):
        yi = y
        for j, aij in enumerate(_A[i]):
            if aij != 0.0:
                yi = yi + (h * aij) * ks[j]
        ks.append(f(t + _C[i] * h, yi))
    y5 = y
    err = jnp.zeros_like(y)
    for b5, b4, k in zip(_B5, _B4, ks):
        if b5 != 0.0:
            y5 = y5 + (h * b5) * k
        if b5 - b4 != 0.0:
            err = err + (h * (b5 - b4)) * k
    return y5, err


def _odeint_flat(f, y0, t0, t1, rtol, atol, max_steps):
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

    def cond(carry):
        t, y, h, steps = carry
        return (direction * (t1 - t) > tol_t) & (steps < max_steps)

    def body(carry):
        t, y, h, steps = carry
        overshoot = direction * (t + h - t1) > 0
        h_try = jnp.where(overshoot, t1 - t, h)
        y_new, y_err = _dopri5_step(f, t, y, h_try)
        scale = atol + rtol * jnp.maximum(jnp.abs(y), jnp.abs(y_new))
        err = jnp.sqrt(jnp.mean((y_err / scale) ** 2))
        err = jnp.where(jnp.isfinite(err), err, jnp.asarray(2.0, dtype))
        accept = err <= 1.0
        factor = jnp.clip(0.9 * jnp.maximum(err, 1e-10) ** -0.2, 0.2, 5.0)
        h_next = h_try * factor
        # never let |h| collapse below the time resolution
        h_min = tol_t * 10.0
        h_next = jnp.where(jnp.abs(h_next) < h_min, direction * h_min, h_next)
        t = jnp.where(accept, t + h_try, t)
        y = jnp.where(accept, y_new, y)
        return (t, y, h_next, steps + 1)

    _, y, _, steps = lax.while_loop(cond, body, (t0, y0, h0, jnp.int32(0)))
    return y, steps


@partial(jax.custom_vjp, nondiff_argnums=(0, 3, 4, 5, 6, 7))
def odeint_dopri5(func, y0, args, t0, t1, rtol=1e-7, atol=1e-7,
                  max_steps=1000):
    """Integrate dy/dt = func(t, y, args) from t0 to t1 (pytree state).

    Differentiable w.r.t. ``y0`` and ``args`` via the continuous adjoint
    method (backward adaptive solve of the augmented system).  ``t0``/``t1``
    are static floats; t1 < t0 integrates backward in time.
    """
    y_flat, unravel = ravel_pytree(y0)

    def f_flat(t, y):
        return ravel_pytree(func(t, unravel(y), args))[0]

    y1_flat, _ = _odeint_flat(f_flat, y_flat, t0, t1, rtol, atol, max_steps)
    return unravel(y1_flat)


def _odeint_fwd(func, y0, args, t0, t1, rtol, atol, max_steps):
    y1 = odeint_dopri5(func, y0, args, t0, t1, rtol, atol, max_steps)
    return y1, (y1, args)


def _odeint_bwd(func, t0, t1, rtol, atol, max_steps, res, ct_y1):
    """Continuous adjoint: integrate (y, a, grad_args) from t1 back to t0.

    a(t) = dL/dy(t) with da/dt = -a^T df/dy; dL/dargs accumulates
    -a^T df/dargs along the backward pass (net + over [t0, t1]).
    """
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
    state0, _ = _odeint_flat(aug_f, state1, t1, t0, rtol, atol, max_steps)
    ct_y0 = unravel_y(state0[n_y:n_y + n_a])
    ct_args = unravel_args(state0[n_y + n_a:])
    return (ct_y0, ct_args)


odeint_dopri5.defvjp(_odeint_fwd, _odeint_bwd)
