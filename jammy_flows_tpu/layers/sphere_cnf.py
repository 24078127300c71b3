"""Continuous manifold normalizing flow on S2 - symbol "c".

TPU-native reimplementation of layers/spheres/cnf_sphere_charts.py (Neural
Manifold ODEs, arXiv:2006.10254).  Chart-wise integration of an MLP vector
field projected to the tangent space, with the log-density evolved by the
instantaneous divergence and corrected by the exp-map log-det per chart.

Design differences from the reference:
  * fixed-step solvers (euler/midpoint/rk4) are a ``lax.fori_loop`` with
    gradients by backprop through the (rematerializable) steps; adaptive
    solvers (dopri5 default, dopri8, bosh3, fehlberg2, adaptive_heun — each
    with its real embedded tableau) use ``ops.odeint.odeint`` — a
    bounded-while_loop embedded-RK integrator with continuous-adjoint
    gradients, the JAX equivalent of torchdiffeq's ``odeint_adjoint``;
  * the divergence is an exact 3x3 jacfwd trace instead of an autograd loop.
"""
from __future__ import annotations

import math

import numpy as np
import jax
import jax.numpy as jnp

from .sphere import SphereLayer
from ..ops import manifold
from ..ops.odeint import TABLEAUS, odeint
from ..models.amortizable_mlp import AmortizableMLP, list_from_str


def _eps(dtype):
    return 1e-8 if dtype == jnp.float64 else 1e-4


def sindiv(x):
    """sin(x)/x with Taylor limit at 0."""
    small = jnp.abs(x) < 1e-6
    x_safe = jnp.where(small, 1.0, x)
    return jnp.where(small, 1.0 - x**2 / 6.0, jnp.sin(x_safe) / x_safe)


def divsin(x):
    """x/sin(x) with Taylor limit at 0."""
    small = jnp.abs(x) < 1e-6
    x_safe = jnp.where(small, 1.0, x)
    return jnp.where(small, 1.0 + x**2 / 6.0, x_safe / jnp.sin(x_safe))


def _safe_norm(u, keepdims=True):
    """||u|| with finite gradient at u=0 (value error ~1e-15)."""
    return jnp.sqrt(jnp.sum(u**2, axis=-1, keepdims=keepdims) + 1e-30)


def sphere_exp(x, u):
    """Exponential map on S2 (cnf_sphere_manifold.py:63-65)."""
    norm_u = _safe_norm(u)
    return x * jnp.cos(norm_u) + u * sindiv(norm_u)


def sphere_log(x, y):
    """Logarithmic map (cnf_sphere_manifold.py:71-76)."""
    xy = jnp.sum(x * y, axis=-1, keepdims=True)
    xy = jnp.clip(xy, -1.0 + 1e-6, 1.0 - 1e-6)
    val = jnp.arccos(xy)
    return divsin(val) * (y - xy * x)


def sphere_proju(x, u):
    """Project u onto the tangent plane at x."""
    return u - jnp.sum(x * u, axis=-1, keepdims=True) * x


def logdetexp(u):
    """log-det of the exp map on S2: log|sin(|u|)/|u||
    (cnf_mf_base.py:119-122, emb_dim - 2 = 1)."""
    norm_u = _safe_norm(u, keepdims=False)
    return jnp.log(jnp.abs(sindiv(norm_u)))


def _first_jac_scalar(z, dtype):
    """d/dz of divsin(acos z) prefactor (cnf_sphere_manifold.py:15-28)."""
    eps = _eps(dtype)
    near = z > 1.0 - eps
    z_safe = jnp.where(near, 0.0, z)
    one_m = 1.0 - z_safe**2
    y = z_safe * jnp.arccos(z_safe) / one_m**1.5 - 1.0 / one_m
    return jnp.where(near, -1.0 / 3.0, y)


def jacoblog(x, y):
    """Jacobian of the log map w.r.t. y (cnf_sphere_manifold.py:79-85).

    x, y: (..., 3) -> (..., 3, 3).
    """
    z = jnp.sum(x * y, axis=-1, keepdims=True)
    z = jnp.clip(z, -1.0 + 1e-4, 1.0 - 1e-4)
    first = (_first_jac_scalar(z[..., None], x.dtype)
             * (y - z * x)[..., :, None] * x[..., None, :])
    eye = jnp.eye(3, dtype=x.dtype)
    second = divsin(jnp.arccos(z))[..., None] * (
        eye - x[..., :, None] * x[..., None, :])
    return first + second


_FIXED_SOLVERS = {"euler": 1, "midpoint": 2, "rk4": 4}


class CNFSphereCharts(SphereLayer):
    """Manifold CNF on S2 with chart switching - symbol "c"
    (cnf_sphere_charts.py:148-426)."""

    def __init__(self, dimension=2, euclidean_to_sphere_as_first=0,
                 cnf_network_hidden_dims="64-64", cnf_network_rank=0,
                 cnf_network_highway_mode=1, num_charts=6, solver="rk4",
                 atol=1e-7, rtol=1e-7, step_size=1.0 / 32.0, **kwargs):
        super().__init__(2, euclidean_to_sphere_as_first, add_rotation=0,
                         **kwargs)
        # 4 inputs (x,y,z,t) -> 3 outputs (ambient vector field)
        rank = cnf_network_rank if cnf_network_rank != -1 else 0
        self.mlp = AmortizableMLP(4, list_from_str(cnf_network_hidden_dims), 3,
                                  highway_mode=cnf_network_highway_mode,
                                  low_rank_approximations=rank)
        self.num_nn_params = self.mlp.num_params
        self.num_params += self.num_nn_params
        self.num_charts = num_charts
        self.step_size = step_size
        self.adaptive = solver not in _FIXED_SOLVERS
        if self.adaptive and solver not in TABLEAUS:
            solver = "dopri5"
        self.solver = solver
        # Low-order pairs need many more (cheap) accepted steps at a given
        # tolerance; the while_loop exits early, so a high cap is free.
        if self.adaptive:
            order = TABLEAUS[solver].order
            self._max_steps = 512 if order >= 5 else (
                2048 if order >= 3 else 8192)
        self.atol = float(atol)
        self.rtol = float(rtol)
        # steps per chart (chart spans 1/num_charts in time)
        self.steps_per_chart = max(1, int(round((1.0 / num_charts) / step_size)))

    # -- vector field ------------------------------------------------------
    def _ambient_field(self, t, x, flat_params):
        """f(t, x) = proju(x, MLP([x, t])) (cnf_sphere_charts.py:137-145)."""
        t_col = jnp.full_like(x[..., :1], t)
        inp = jnp.concatenate([x, t_col], axis=-1)
        v = self.mlp.apply(flat_params, inp)
        return sphere_proju(x, v)

    def _chart_rhs_single(self, t, y, loc, flat_params):
        """Tangent-space ODE rhs for ONE sample (3,): jacoblog(loc, exp) @ f."""
        x = sphere_exp(loc[None, :], y[None, :])[0]
        f = self._ambient_field(t, x[None, :], flat_params)[0]
        return jnp.einsum("ij,j->i", jacoblog(loc, x), f, precision=jax.lax.Precision.HIGHEST)

    def _rhs_and_div(self, t, y, loc, flat_params):
        """Batched rhs + exact divergence (trace of the 3x3 tangent Jacobian)."""
        def single(y1, loc1, fp):
            rhs = lambda yy: self._chart_rhs_single(t, yy, loc1, fp)
            val = rhs(y1)
            jac = jax.jacfwd(rhs)(y1)
            return val, jnp.trace(jac)
        fp = jnp.broadcast_to(flat_params, (y.shape[0],) + flat_params.shape[1:])
        return jax.vmap(single)(y, loc, fp)

    def _integrate_chart(self, t0, t1, loc, flat_params, batch, dtype):
        """Integrate (y, logp) from y=0 over [t0, t1]; adaptive dopri5 with
        adjoint gradients, or fixed steps for euler/midpoint/rk4."""
        if self.adaptive:
            y0 = jnp.zeros((batch, 3), dtype=dtype)
            div0 = jnp.zeros((batch,), dtype=dtype)

            def func(t, state, arg):
                y, _ = state
                loc_a, fp = arg
                return self._rhs_and_div(t, y, loc_a, fp)

            return odeint(func, (y0, div0), (loc, flat_params),
                          float(t0), float(t1), self.rtol, self.atol,
                          max_steps=self._max_steps, method=self.solver)
        n = self.steps_per_chart
        h = (t1 - t0) / n
        y0 = jnp.zeros((batch, 3), dtype=dtype)
        div0 = jnp.zeros((batch,), dtype=dtype)

        def rhs(t, y):
            return self._rhs_and_div(t, y, loc, flat_params)

        # Per-step rematerialization: without it, reverse-mode through the
        # unrolled steps stores every RK-stage intermediate (incl. the 3x3
        # jacfwd divergence internals) — measured 150 GB HBM for a 65k-batch
        # training step at 32 steps.  With jax.checkpoint only the (B, 3)
        # carry per step survives the forward; stages recompute in backward.
        @jax.checkpoint
        def step(carry, i):
            y, div = carry
            t = t0 + i * h
            if self.solver == "euler":
                k1, d1 = rhs(t, y)
                return (y + h * k1, div + h * d1), None
            if self.solver == "midpoint":
                k1, _ = rhs(t, y)
                k2, d2 = rhs(t + 0.5 * h, y + 0.5 * h * k1)
                return (y + h * k2, div + h * d2), None
            k1, d1 = rhs(t, y)
            k2, d2 = rhs(t + 0.5 * h, y + 0.5 * h * k1)
            k3, d3 = rhs(t + 0.5 * h, y + 0.5 * h * k2)
            k4, d4 = rhs(t + h, y + h * k3)
            y_new = y + (h / 6.0) * (k1 + 2 * k2 + 2 * k3 + k4)
            div_new = div + (h / 6.0) * (d1 + 2 * d2 + 2 * d3 + d4)
            return (y_new, div_new), None

        (y, div), _ = jax.lax.scan(step, (y0, div0),
                                   jnp.arange(n, dtype=jnp.int32))
        return y, div

    def _run(self, z, flat_params, reverse):
        """Chart-wise integration (cnf_sphere_charts.py:224-277).  Starting
        tangent value each chart is log(loc, loc) = 0, so logdetexp at chart
        entry vanishes."""
        nch = self.num_charts
        times = [((i) / nch, (i + 1) / nch) for i in range(nch)]
        if reverse:
            times = [(t1, t0) for (t0, t1) in reversed(times)]

        loc = z
        logp = jnp.zeros(z.shape[0], dtype=z.dtype)
        for (t0, t1) in times:
            y, div = self._integrate_chart(t0, t1, loc, flat_params,
                                           z.shape[0], z.dtype)
            y = sphere_proju(loc, y)
            # log|det dz_out/dz_in| = + int div_F dt + logdetexp(y_T)
            # (reference integrates -div and then subtracts it,
            #  cnf_sphere_charts.py:108,269)
            logp = logp + div + logdetexp(y)
            loc = sphere_exp(loc, y)
            loc = loc / jnp.linalg.norm(loc, axis=-1, keepdims=True)
        return loc, logp

    # -- mappings ---------------------------------------------------------
    def _inverse(self, params, x, log_det, rot_params=None):
        if not self.always_parametrize_in_embedding_space:
            x, log_det = manifold.spherical_to_eucl(2, x, log_det)
        res, dlogp = self._run(x, params, reverse=False)
        log_det = log_det + dlogp
        if not self.always_parametrize_in_embedding_space:
            res, log_det = manifold.eucl_to_spherical(2, res, log_det)
        return res, log_det

    def _forward(self, params, x, log_det, rot_params=None):
        if not self.always_parametrize_in_embedding_space:
            x, log_det = manifold.spherical_to_eucl(2, x, log_det)
        res, dlogp = self._run(x, params, reverse=True)
        log_det = log_det + dlogp
        if not self.always_parametrize_in_embedding_space:
            res, log_det = manifold.eucl_to_spherical(2, res, log_det)
        return res, log_det

    def _default_params(self, rng):
        return self.mlp.default_init(rng)

    def _child_param_structure(self):
        return [("vectorfield_nn_pars", self.num_nn_params)]
