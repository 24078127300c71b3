"""Differentiable numerical inversion: bisection + Newton with implicit grads.

TPU-native replacement for the reference's iterative inverse machinery
(jammy_flows/layers/bisection_n_newton.py:11-328).  Design differences from
the reference (see SURVEY.md section 7):

  * fixed trip counts via ``lax.fori_loop`` -> single compiled kernel, no
    data-dependent control flow;
  * convergence bookkeeping via ``where`` masking instead of masked_scatter;
  * gradients via the implicit-function theorem (``jax.custom_vjp``) instead
    of differentiating through the loop - the backward pass costs ONE
    function evaluation instead of num_iters of them (the reference's TODO at
    bisection_n_newton.py:40 acknowledges this as the better design).

The solver inverts a strictly monotonically increasing elementwise map
``f(x, params) -> y`` for x given y.  ``x`` and ``y`` have identical shapes;
``params`` is an arbitrary pytree broadcastable against x.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _bisection_newton_solve(value_fn, target, params, lo, hi,
                            num_bisection_iter, num_newton_iter,
                            value_and_grad_fn):
    """Pure solver (no gradient tracking; wrapped in custom_vjp below)."""
    dtype = target.dtype
    lo_arr = jnp.full_like(target, lo, dtype=dtype)
    hi_arr = jnp.full_like(target, hi, dtype=dtype)

    def bisect_body(_, carry):
        lo_c, hi_c = carry
        mid = 0.5 * (lo_c + hi_c)
        val = value_fn(mid, params)
        go_right = val < target
        return (jnp.where(go_right, mid, lo_c), jnp.where(go_right, hi_c, mid))

    lo_c, hi_c = jax.lax.fori_loop(0, num_bisection_iter, bisect_body,
                                   (lo_arr, hi_arr))
    x0 = 0.5 * (lo_c + hi_c)

    def newton_body(_, x):
        val, deriv = value_and_grad_fn(x, params)
        step = (val - target) / deriv
        x_new = x - step
        # NaN/Inf repair + keep iterates inside the bracket
        # (bisection_n_newton.py:84-91 equivalent)
        bad = ~jnp.isfinite(x_new)
        x_new = jnp.where(bad, x, x_new)
        return jnp.clip(x_new, lo, hi)

    return jax.lax.fori_loop(0, num_newton_iter, newton_body, x0)


def make_inverse_fn(value_fn, value_and_grad_fn=None, lo=-1e5, hi=1e5,
                    num_bisection_iter=25, num_newton_iter=20, solver=None):
    """Build an inverse function ``inv(target, params) -> x``.

    value_fn(x, params) must be elementwise strictly increasing in x.
    value_and_grad_fn(x, params) -> (value, dvalue/dx); if None it is derived
    with forward-mode autodiff.  ``solver(target, params) -> x`` optionally
    replaces the generic bisection+Newton forward solve (e.g. with a fused
    Pallas kernel); the implicit-gradient backward pass is shared.

    The returned function is differentiable w.r.t. both target and params via
    the implicit-function theorem.
    """
    if value_and_grad_fn is None:
        def value_and_grad_fn(x, params):
            val, dval = jax.jvp(lambda xx: value_fn(xx, params), (x,),
                                (jnp.ones_like(x),))
            return val, dval

    @jax.custom_vjp
    def inverse(target, params):
        if solver is not None:
            return solver(target, params)
        return _bisection_newton_solve(value_fn, target, params, lo, hi,
                                       num_bisection_iter, num_newton_iter,
                                       value_and_grad_fn)

    def fwd(target, params):
        x = inverse(target, params)
        return x, (x, params)

    def bwd(residuals, g):
        x, params = residuals
        _, deriv = value_and_grad_fn(x, params)
        cot = g / deriv                     # dL/dtarget
        # dL/dparams = -vjp_params(value_fn at solution) applied to cot
        _, vjp_fn = jax.vjp(lambda p: value_fn(x, p), params)
        (dparams,) = vjp_fn(-cot)
        return cot, dparams

    inverse.defvjp(fwd, bwd)
    return inverse


def make_sphere_inverse_fn(exp_map_and_jac_fn, exp_map_fn, max_iter=1000,
                           damping=0.4, tol=1e-12):
    """Invert a sphere diffeomorphism phi (an exponential-map flow) for x
    given y = phi(x, params).

    TPU-native replacement for inverse_bisection_n_newton_sphere[_fast]
    (bisection_n_newton.py:330-465): a bounded ``lax.while_loop`` walking the
    manifold via tangent-space exp-map steps with per-item convergence
    masking, wrapped in implicit-function gradients (one 2x2 tangent-plane
    solve in the backward pass instead of differentiating 1000 loop steps).

    exp_map_and_jac_fn(x, params) -> (phi(x), J (B,3,3), tangent_basis (B,3,2))
    exp_map_fn(x, v_unit, v_norm) -> point on sphere.
    """

    def _solve(target, params):
        b = target.shape[0]
        prev0 = jnp.zeros_like(target).at[:, 2].set(-1.0)
        active0 = jnp.ones((b,), dtype=bool)
        # dtype-aware guards: the reference's f64 constants (1e-15 clips,
        # 1e-12 tol) round to exact 1.0 / are unreachable in f32, turning
        # sqrt(1-cos^2) into 0/0 NaNs and the loop into max_iter spins
        eps = float(jnp.finfo(target.dtype).eps)
        edge = max(1e-15, 8.0 * eps)
        tiny = float(jnp.finfo(target.dtype).tiny)
        tol_eff = max(tol, 30.0 * eps)

        def cond(carry):
            i, _, active = carry
            return (i < max_iter) & jnp.any(active)

        def body(carry):
            i, prev, active = carry
            phi, jac, _ = exp_map_and_jac_fn(prev, params)
            fn_eval = 1.0 - jnp.sum(phi * target, axis=-1, keepdims=True)
            res_vec = -jnp.einsum("bji,bj->bi", jac, target)
            grad_norm = jnp.sqrt(jnp.sum(res_vec**2, axis=1, keepdims=True))
            direction = -res_vec / jnp.maximum(grad_norm, tiny)
            # tangent of the great circle from prev toward `direction`
            cos_a = jnp.sum(direction * prev, axis=1, keepdims=True)
            converged = cos_a >= 1.0 - edge
            cos_a_safe = jnp.clip(cos_a, -1.0 + edge, 1.0 - edge)
            sin_a = jnp.sqrt(jnp.maximum(1.0 - cos_a_safe**2, tiny))
            new_vs = (direction - prev * cos_a_safe) / sin_a
            gpnew = jnp.sum(new_vs * res_vec, axis=1, keepdims=True)
            safe_gpnew = jnp.where(jnp.abs(gpnew) < tiny,
                                   jnp.ones_like(gpnew), gpnew)
            proj = -fn_eval / safe_gpnew
            proj = jnp.where(converged, 0.0, proj)
            step = jnp.where(active[:, None], damping * proj, 0.0)
            prev_new = exp_map_fn(prev, new_vs, step)
            prev_new = prev_new / jnp.linalg.norm(prev_new, axis=-1,
                                                  keepdims=True)
            # NaN repair: keep the previous iterate on poisoned lanes
            bad = ~jnp.all(jnp.isfinite(prev_new), axis=-1, keepdims=True)
            prev_new = jnp.where(bad, prev, prev_new)
            active_new = active & (jnp.abs(proj[:, 0]) >= tol_eff) \
                & ~bad[:, 0]
            return i + 1, prev_new, active_new

        _, prev, _ = jax.lax.while_loop(cond, body, (0, prev0, active0))
        return prev

    @jax.custom_vjp
    def inverse(target, params):
        return _solve(target, params)

    def fwd(target, params):
        x = inverse(target, params)
        return x, (x, params)

    def bwd(residuals, g):
        x, params = residuals
        # phi(x*, params) = y.  Local coords: u in tangent basis B_x at x*,
        # y-perturbation dy = P du with P = J @ B_x (3x2).
        # vjp: u_bar = B_x^T g;  y_bar = P (P^T P)^{-T} u_bar;
        #      params_bar = -vjp_params(phi)(y_bar).
        _, jac, basis = exp_map_and_jac_fn(x, params)
        p_mat = jnp.einsum("bij,bjk->bik", jac, basis)            # (B,3,2)
        ptp = jnp.einsum("bij,bik->bjk", p_mat, p_mat)            # (B,2,2)
        u_bar = jnp.einsum("bij,bi->bj", basis, g)                # (B,2)
        sol = jnp.linalg.solve(jnp.swapaxes(ptp, -1, -2), u_bar[..., None])[..., 0]
        y_bar = jnp.einsum("bij,bj->bi", p_mat, sol)              # (B,3)
        phi_fn = lambda p: exp_map_and_jac_fn(x, p)[0]
        _, vjp_fn = jax.vjp(phi_fn, params)
        (params_bar,) = vjp_fn(-y_bar)
        # d x*/d y restricted to tangent planes: dx = B_x (P^T P)^{-1} P^T dy
        target_bar = y_bar
        return target_bar, params_bar

    inverse.defvjp(fwd, bwd)
    return inverse


def make_sphere_inverse_cols_fn(phi_cols_fn, max_iter=1000, damping=0.4,
                                tol=1e-12):
    """COLUMN twin of :func:`make_sphere_inverse_fn` (VERDICT r3 item 6).

    State is three flat (B,) coordinate columns instead of a tile-padded
    (B, 3) array, and each Newton iteration obtains J^T target from ONE
    ``jax.vjp`` of the column exp-map — the row path builds the full 3x3
    per-sample ``jacfwd`` Jacobian (3 forward passes) only to contract it
    once.  The implicit backward uses two jvps along the tangent basis (the
    same trick as the analytic column density path) plus one parameter vjp.

    phi_cols_fn((x, y, z), slab) -> (px, py, pz); slab (P, Bp).
    """

    def _tangent_cols(x, y, z):
        near_pole = jnp.abs(z) >= 0.9
        rx = jnp.where(near_pole, 1.0, 0.0)
        rz = jnp.where(near_pole, 0.0, 1.0)
        rdx = rx * x + rz * z
        t1x, t1y, t1z = rx - x * rdx, -y * rdx, rz - z * rdx
        t1n = jnp.sqrt(t1x * t1x + t1y * t1y + t1z * t1z)
        t1x, t1y, t1z = t1x / t1n, t1y / t1n, t1z / t1n
        return ((t1x, t1y, t1z),
                (y * t1z - z * t1y, z * t1x - x * t1z, x * t1y - y * t1x))

    def _solve(tx, ty, tz, slab):
        dtype = tx.dtype
        eps = float(jnp.finfo(dtype).eps)
        edge = max(1e-15, 8.0 * eps)
        tiny = float(jnp.finfo(dtype).tiny)
        tol_eff = max(tol, 30.0 * eps)
        x0 = jnp.zeros_like(tx)
        y0 = jnp.zeros_like(tx)
        z0 = jnp.full_like(tx, -1.0)
        active0 = jnp.ones(tx.shape, dtype=bool)

        def cond(carry):
            i = carry[0]
            return (i < max_iter) & jnp.any(carry[4])

        def body(carry):
            i, x, y, z, active = carry
            f = lambda xx, yy, zz: phi_cols_fn((xx, yy, zz), slab)
            (phx, phy, phz), vjp = jax.vjp(f, x, y, z)
            fn_eval = 1.0 - (phx * tx + phy * ty + phz * tz)
            gx, gy, gz = vjp((-tx, -ty, -tz))          # res_vec = -J^T t
            gn = jnp.sqrt(jnp.maximum(gx * gx + gy * gy + gz * gz, tiny))
            dx, dy, dz = -gx / gn, -gy / gn, -gz / gn  # -res_vec / |res|
            cos_a = dx * x + dy * y + dz * z
            converged = cos_a >= 1.0 - edge
            cos_s = jnp.clip(cos_a, -1.0 + edge, 1.0 - edge)
            sin_a = jnp.sqrt(jnp.maximum(1.0 - cos_s * cos_s, tiny))
            vx = (dx - x * cos_s) / sin_a
            vy = (dy - y * cos_s) / sin_a
            vz = (dz - z * cos_s) / sin_a
            gpnew = vx * gx + vy * gy + vz * gz
            safe = jnp.where(jnp.abs(gpnew) < tiny, 1.0, gpnew)
            proj = jnp.where(converged, 0.0, -fn_eval / safe)
            step = jnp.where(active, damping * proj, 0.0)
            cv, sv = jnp.cos(step), jnp.sin(step)
            nx, ny, nz = x * cv + vx * sv, y * cv + vy * sv, z * cv + vz * sv
            nrm = jnp.sqrt(nx * nx + ny * ny + nz * nz)
            nx, ny, nz = nx / nrm, ny / nrm, nz / nrm
            bad = ~(jnp.isfinite(nx) & jnp.isfinite(ny) & jnp.isfinite(nz))
            nx = jnp.where(bad, x, nx)
            ny = jnp.where(bad, y, ny)
            nz = jnp.where(bad, z, nz)
            active_new = active & (jnp.abs(proj) >= tol_eff) & ~bad
            return i + 1, nx, ny, nz, active_new

        _, x, y, z, _ = jax.lax.while_loop(
            cond, body, (0, x0, y0, z0, active0))
        return x, y, z

    @jax.custom_vjp
    def inverse(tx, ty, tz, slab):
        return _solve(tx, ty, tz, slab)

    def fwd(tx, ty, tz, slab):
        out = inverse(tx, ty, tz, slab)
        return out, (out, slab)

    def bwd(residuals, g):
        (x, y, z), slab = residuals
        gx_, gy_, gz_ = g
        t1, t2 = _tangent_cols(x, y, z)
        f = lambda xx, yy, zz: phi_cols_fn((xx, yy, zz), slab)
        # P = J @ B as two directional derivatives (columns)
        _, a = jax.jvp(f, (x, y, z), t1)
        _, b = jax.jvp(f, (x, y, z), t2)
        aa = a[0] * a[0] + a[1] * a[1] + a[2] * a[2]
        bb = b[0] * b[0] + b[1] * b[1] + b[2] * b[2]
        ab = a[0] * b[0] + a[1] * b[1] + a[2] * b[2]
        u1 = t1[0] * gx_ + t1[1] * gy_ + t1[2] * gz_   # u_bar = B^T g
        u2 = t2[0] * gx_ + t2[1] * gy_ + t2[2] * gz_
        det = aa * bb - ab * ab                         # PtP symmetric
        w1 = (bb * u1 - ab * u2) / det
        w2 = (aa * u2 - ab * u1) / det
        ybx = a[0] * w1 + b[0] * w2                     # y_bar = P w
        yby = a[1] * w1 + b[1] * w2
        ybz = a[2] * w1 + b[2] * w2
        _, vjp_p = jax.vjp(lambda s: phi_cols_fn((x, y, z), s), slab)
        (slab_bar,) = vjp_p((-ybx, -yby, -ybz))
        return ybx, yby, ybz, slab_bar

    inverse.defvjp(fwd, bwd)
    return inverse


def inverse_bisection_n_newton(value_fn, target, params, lo=-1e5, hi=1e5,
                               num_bisection_iter=25, num_newton_iter=20,
                               value_and_grad_fn=None):
    """One-shot convenience wrapper around :func:`make_inverse_fn`.

    NOTE: builds the custom_vjp wrapper at trace time; under jit this is free
    (traced once).  Replaces bisection_n_newton.py:11-256.
    """
    inv = make_inverse_fn(value_fn, value_and_grad_fn, lo=lo, hi=hi,
                          num_bisection_iter=num_bisection_iter,
                          num_newton_iter=num_newton_iter)
    return inv(target, params)
