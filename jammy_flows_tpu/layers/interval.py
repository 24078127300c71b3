"""Interval flow layers: RQ-spline (r), identity (z).

TPU-native reimplementation of layers/intervals/{interval_base.py,
rational_quadratic_spline.py,interval_do_nothing.py}.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from .base import FlowLayer
from ..ops import manifold
from ..ops.splines import (rq_spline, rq_spline_smooth,
                           rq_spline_cols, rq_spline_smooth_cols)


class IntervalLayer(FlowLayer):
    """Base: optional real-line <-> interval Gaussian-CDF projection as the
    first layer of an interval sub-manifold (interval_base.py:33-79)."""

    def __init__(self, dimension=1, euclidean_to_interval_as_first=0,
                 low_boundary=0.0, high_boundary=1.0):
        super().__init__(dimension)
        assert dimension == 1, "interval flows are 1-dimensional"
        assert high_boundary > low_boundary
        self.low = float(low_boundary)
        self.high = float(high_boundary)
        self.euclidean_to_interval_as_first = int(euclidean_to_interval_as_first)

    def forward(self, params, x, log_det):
        if self.euclidean_to_interval_as_first:
            x, log_det = manifold.real_line_to_interval(x, log_det, self.low,
                                                        self.high)
        return self._forward(params, x, log_det)

    def inverse(self, params, x, log_det):
        x, log_det = self._inverse(params, x, log_det)
        if self.euclidean_to_interval_as_first:
            x, log_det = manifold.interval_to_real_line(x, log_det, self.low,
                                                        self.high)
        return x, log_det

    def _forward(self, params, x, log_det):
        raise NotImplementedError

    def _inverse(self, params, x, log_det):
        raise NotImplementedError

    # -- column fast path (flat (B,) coordinate; see layers/base.py) -------
    def forward_cols(self, slab, cols, log_det):
        (x,) = cols
        if self.euclidean_to_interval_as_first:
            x, log_det = manifold.real_line_to_interval_cols(
                x, log_det, self.low, self.high)
        x, log_det = self._forward_col(slab, x, log_det)
        return (x,), log_det

    def inverse_cols(self, slab, cols, log_det):
        (x,) = cols
        x, log_det = self._inverse_col(slab, x, log_det)
        if self.euclidean_to_interval_as_first:
            x, log_det = manifold.interval_to_real_line_cols(
                x, log_det, self.low, self.high)
        return (x,), log_det


class RQSplineInterval(IntervalLayer):
    """Neural-spline-flow RQ spline on an interval - symbol "r".

    Reference: rational_quadratic_spline.py:61-427 including all the
    parameter-reduction options (fixed boundary derivatives, C^2-smooth
    variant, width/height-zero pinning, independent parametrization).
    """

    def __init__(self, dimension=1, num_basis_functions=10,
                 euclidean_to_interval_as_first=0, low_boundary=0.0,
                 high_boundary=1.0, min_width=1e-4, min_height=1e-4,
                 min_derivative=1e-4, fix_boundary_derivatives=-1.0,
                 smooth_second_derivative=0,
                 restrict_max_min_width_height_ratio=-1.0,
                 fix_first_width_n_height_to_zero=0,
                 also_fix_second_width_to_zero=0,
                 independent_width_height_parametrization=0):
        super().__init__(dimension, euclidean_to_interval_as_first,
                         low_boundary, high_boundary)
        k = num_basis_functions
        self.num_basis_functions = k
        self.min_width = min_width
        self.min_height = min_height
        self.min_derivative = min_derivative
        self.restrict_ratio = restrict_max_min_width_height_ratio
        self.fix_first = int(fix_first_width_n_height_to_zero)
        self.fix_second_w = int(also_fix_second_width_to_zero)
        self.independent_wh = int(independent_width_height_parametrization)
        self.smooth_second_derivative = int(smooth_second_derivative)
        self.fix_boundary_derivatives = fix_boundary_derivatives

        self.num_width_params = k
        self.num_height_params = k
        if self.fix_first:
            self.num_width_params = k - 1
            self.num_height_params = k - 1
            if self.fix_second_w:
                self.num_width_params -= 1

        self.boundary_log_derivs_fixed_value = None
        if fix_boundary_derivatives > 0.0:
            assert fix_boundary_derivatives > min_derivative
            # softplus^-1 so the spline sees exactly the requested derivative
            self.boundary_log_derivs_fixed_value = float(
                np.log(np.exp(fix_boundary_derivatives - min_derivative) - 1.0))

        if self.smooth_second_derivative == 1:
            assert k in (2, 3), "smooth 2nd derivative needs 2 or 3 bins"
            if fix_boundary_derivatives > 0.0:
                bd_sub = 3 if k == 2 else 4
            else:
                bd_sub = 1 if k == 2 else 2
            if k == 3:
                # symmetric case: mirror first width/height
                self.num_width_params -= 1
                self.num_height_params -= 1
        else:
            bd_sub = 2 if fix_boundary_derivatives > 0.0 else 0
        self.num_derivative_params = k + 1 - bd_sub

        self.num_params = (self.num_width_params + self.num_height_params
                           + self.num_derivative_params)

    def param_structure(self):
        """Names mirror rational_quadratic_spline.py's param_dict keys."""
        return [("widths", self.num_width_params),
                ("heights", self.num_height_params),
                ("derivatives", self.num_derivative_params)]

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
        if self.smooth_second_derivative == 1 and self.num_basis_functions == 3:
            w = jnp.concatenate([w, w[:, :1]], axis=1)
            h = jnp.concatenate([h, h[:, :1]], axis=1)
        return w, h, d

    def _spline(self, params, x, log_det, inverse):
        x = jnp.clip(x, self.low, self.high)
        w, h, d = self._unpack(params)
        # (B, 1, K) param layout for the 1-d interval coordinate
        w3, h3 = w[:, None, :], h[:, None, :]
        if self.smooth_second_derivative == 0:
            if self.fix_boundary_derivatives > 0:
                fixed = jnp.full_like(d[:, :1], self.boundary_log_derivs_fixed_value)
                d = jnp.concatenate([fixed, d, fixed], axis=1)
            res, ld = rq_spline(
                x, w3, h3, d[:, None, :], inverse=inverse,
                left=self.low, right=self.high, bottom=self.low, top=self.high,
                rel_min_bin_width=self.min_width,
                rel_min_bin_height=self.min_height,
                min_derivative=self.min_derivative,
                restrict_max_min_width_height_ratio=self.restrict_ratio)
        else:
            if self.fix_boundary_derivatives > 0:
                bd = jnp.full(w.shape[:-1] + (2,), self.boundary_log_derivs_fixed_value,
                              dtype=x.dtype)
            else:
                bd = d
            res, ld = rq_spline_smooth(
                x, w3, h3, bd[:, None, :], inverse=inverse,
                left=self.low, right=self.high, bottom=self.low, top=self.high,
                rel_min_bin_width=self.min_width,
                rel_min_bin_height=self.min_height,
                min_derivative=self.min_derivative,
                restrict_max_min_width_height_ratio=self.restrict_ratio)
        res = jnp.clip(res, self.low, self.high)
        return res, log_det + jnp.sum(ld, axis=-1)

    def _forward(self, params, x, log_det):
        return self._spline(params, x, log_det, inverse=False)

    def _inverse(self, params, x, log_det):
        return self._spline(params, x, log_det, inverse=True)

    # -- column fast path ---------------------------------------------------
    def supports_columns(self):
        return True

    def _unpack_cols(self, slab):
        """Column twin of _unpack: slab (P, Bp) -> (w, h, d) lists of (Bp,)
        columns (zero pinning / independent parametrization / 3-bin mirror
        applied)."""
        nw, nh = self.num_width_params, self.num_height_params
        w = [slab[i] for i in range(nw)]
        h = [slab[nw + i] for i in range(nh)]
        d = [slab[nw + nh + i] for i in range(self.num_derivative_params)]
        zero = jnp.zeros_like(slab[0]) if slab.shape[0] else None
        if self.fix_first:
            h = [zero] + h
            w = ([zero, zero] if self.fix_second_w else [zero]) + w
        if self.independent_wh:
            h = [wi + hi for wi, hi in zip(w, h)]
        if self.smooth_second_derivative == 1 and self.num_basis_functions == 3:
            w = w + [w[0]]
            h = h + [h[0]]
        return w, h, d

    def _spline_col(self, slab, x, log_det, inverse):
        x = jnp.clip(x, self.low, self.high)
        w, h, d = self._unpack_cols(slab)
        if self.smooth_second_derivative == 0:
            if self.fix_boundary_derivatives > 0:
                fixed = jnp.asarray(self.boundary_log_derivs_fixed_value,
                                    dtype=x.dtype)[None]
                d = [fixed] + d + [fixed]
            res, ld = rq_spline_cols(
                x, w, h, d, inverse=inverse,
                left=self.low, right=self.high, bottom=self.low,
                top=self.high, rel_min_bin_width=self.min_width,
                rel_min_bin_height=self.min_height,
                min_derivative=self.min_derivative,
                restrict_max_min_width_height_ratio=self.restrict_ratio)
        else:
            if self.fix_boundary_derivatives > 0:
                fixed = jnp.asarray(self.boundary_log_derivs_fixed_value,
                                    dtype=x.dtype)[None]
                bd = [fixed, fixed]
            else:
                bd = d
            res, ld = rq_spline_smooth_cols(
                x, w, h, bd, inverse=inverse,
                left=self.low, right=self.high, bottom=self.low,
                top=self.high, rel_min_bin_width=self.min_width,
                rel_min_bin_height=self.min_height,
                min_derivative=self.min_derivative,
                restrict_max_min_width_height_ratio=self.restrict_ratio)
        return jnp.clip(res, self.low, self.high), log_det + ld

    def _forward_col(self, slab, x, log_det):
        return self._spline_col(slab, x, log_det, inverse=False)

    def _inverse_col(self, slab, x, log_det):
        return self._spline_col(slab, x, log_det, inverse=True)

    def default_params(self, rng=None):
        if self.smooth_second_derivative:
            return np.zeros(self.num_params)
        return np.full(self.num_params, 0.54)


class IntervalIdentity(IntervalLayer):
    """Identity interval flow - symbol "z"."""

    def _forward(self, params, x, log_det):
        return x, log_det

    def _inverse(self, params, x, log_det):
        return x, log_det

    def supports_columns(self):
        return True

    def _forward_col(self, slab, x, log_det):
        return x, log_det

    def _inverse_col(self, slab, x, log_det):
        return x, log_det

    def default_params(self, rng=None):
        return np.zeros(0)
