"""Euclidean flow layers: Gaussianization flow (g/h), affine/MVN (t), identity (x).

TPU-native reimplementation of the reference Euclidean op set
(layers/euclidean/gaussianization_flow.py, multivariate_normal.py,
euclidean_do_nothing.py).  See SURVEY.md section 2.3 for the option surface
reproduced here.
"""
from __future__ import annotations

import math

import numpy as np
import jax
import jax.numpy as jnp

from .base import FlowLayer, split_params
from ..ops import logistic_kde, rotations, matrix
from ..ops.inverse import make_inverse_fn
from ..ops.lazy_params import LazyParamSlab, materialize_if_lazy
from ..ops.special import log_bounded_exp_fn, width_regulator_fn
from ..ops.splines import rq_spline_linear_ext


class EuclideanLayer(FlowLayer):
    """Shared offset ("mean") handling (euclidean_base.py:34-76).

    Parameter layout: [offset(dim) if model_offset] + child params.
    """

    def __init__(self, dimension, model_offset=0):
        super().__init__(dimension)
        self.model_offset = int(model_offset)
        if self.model_offset:
            self.num_params += dimension

    def forward(self, params, x, log_det):
        if self.model_offset:
            offset = materialize_if_lazy(params[:, :self.dimension])
            child = params[:, self.dimension:]
            y, log_det = self._forward(child, x, log_det)
            return y + offset, log_det
        return self._forward(params, x, log_det)

    def inverse(self, params, x, log_det):
        if self.model_offset:
            offset = materialize_if_lazy(params[:, :self.dimension])
            child = params[:, self.dimension:]
            return self._inverse(child, x - offset, log_det)
        return self._inverse(params, x, log_det)

    def default_params(self, rng=None):
        rng = rng or np.random.default_rng(0)
        parts = []
        if self.model_offset:
            parts.append(np.full(self.dimension, 0.001))
        parts.append(self._default_params(rng))
        return np.concatenate(parts) if parts else np.zeros(0)

    def param_structure(self):
        parts = []
        if self.model_offset:
            parts.append(("offset", self.dimension))
        parts += self._child_param_structure()
        assert sum(s for _, s in parts) == self.num_params, \
            (type(self).__name__, parts, self.num_params)
        return parts

    # hooks
    def _forward(self, params, x, log_det):
        raise NotImplementedError

    def _inverse(self, params, x, log_det):
        raise NotImplementedError

    def _child_param_structure(self):
        rest = self.num_params - self.model_offset * self.dimension
        return [("params", rest)] if rest else []

    def _default_params(self, rng):
        return rng.standard_normal(self.num_params - self.model_offset * self.dimension)


def _rotation_param_count(mode, dim, num_householder_iter):
    if mode == "householder":
        it = dim if num_householder_iter == -1 else num_householder_iter
        return (it * dim if it > 0 else 0), it
    if mode == "triangular_combination":
        return (dim - 1 + dim * (dim - 1) if dim > 1 else 0), 0
    if mode == "angles":
        return (dim * (dim - 1) // 2 if dim > 1 else 0), 0
    if mode == "cayley":
        if dim > 1:
            assert dim == 2, "Cayley rotation requires 2 dims"
            return 1, 0
        return 0, 0
    if mode == "none":
        return 0, 0
    raise ValueError(f"unknown rotation mode {mode}")


class GaussianizationFlow(EuclideanLayer):
    """Gaussianization flow - symbols "g" (and "h", the deprecated twin).

    Per-dimension logistic-mixture CDF -> inverse-Gaussian-CDF pass, followed
    by a rotation.  Reference: gaussianization_flow.py:50-1114 (the reference
    keeps a near-identical older implementation `gf_block_old` for symbol "h";
    regression tests show they are equivalent, so both symbols map here).
    """

    def __init__(self, dimension,
                 nonlinear_stretch_type="classic",
                 num_kde=5,
                 num_householder_iter=-1,
                 fit_normalization=0,
                 inverse_function_type="inormal_partly_precise",
                 model_offset=0,
                 softplus_for_width=0,
                 width_smooth_saturation=1,
                 lower_bound_for_widths=0.01,
                 upper_bound_for_widths=100,
                 lower_bound_for_norms=1,
                 upper_bound_for_norms=10,
                 center_mean=0,
                 clamp_widths=0,
                 regulate_normalization=0,
                 add_skewness=0,
                 rotation_mode="householder",
                 high_precision_tail_newton=0):
        super().__init__(dimension, model_offset=model_offset)
        # opt-in f64 refinement of the f32 sampling solve (see _forward)
        self.hp_tail_newton = int(high_precision_tail_newton)
        assert inverse_function_type in ("isigmoid", "inormal_partly_precise",
                                         "inormal_partly_crude", "inormal_full_pade")
        self.nonlinear_stretch_type = nonlinear_stretch_type
        self.num_kde = num_kde
        self.inverse_function_type = inverse_function_type
        self.fit_normalization = int(fit_normalization)
        self.regulate_normalization = int(regulate_normalization)
        self.add_skewness = int(add_skewness)
        self.center_mean = int(center_mean)
        self.rotation_mode = rotation_mode

        self.num_rotation_params, self.householder_iter = _rotation_param_count(
            rotation_mode, dimension, num_householder_iter)
        self.num_params += self.num_rotation_params

        self.width_regulator = width_regulator_fn(
            softplus_for_width, width_smooth_saturation, lower_bound_for_widths,
            upper_bound_for_widths, clamp_widths)
        self.norm_regulator = log_bounded_exp_fn(
            lower_bound_for_norms, upper_bound_for_norms)
        self.exponent_regulator = log_bounded_exp_fn(0.1, 9.0, center=True)
        # static prep spec for the raw-parameter fused kernels (regulators
        # run in VMEM); regulator closures are lru-cached in ops.special so
        # identically-configured layers share one compiled kernel.  5-tuple:
        # (width_reg, norm_reg|None, fit_norm, exp_reg|None, signs|None) -
        # the last two drive the skewed-mixture kernel variant.
        skew_signs_static = None
        if add_skewness:
            s = np.ones(num_kde)
            s[num_kde // 2:] = -1.0
            skew_signs_static = tuple(s.tolist())
        self._kernel_prep = (
            self.width_regulator,
            self.norm_regulator if (fit_normalization
                                    and regulate_normalization) else None,
            bool(fit_normalization),
            self.exponent_regulator if add_skewness else None,
            skew_signs_static)

        # Silverman-like bandwidth init (gaussianization_flow.py:233-234)
        bandwidth = (4.0 * math.sqrt(math.pi) / ((math.pi**4) * num_kde))**0.2
        self.init_log_width = math.log(bandwidth)

        kd = num_kde * dimension
        if nonlinear_stretch_type == "classic":
            self.num_mean_params = (num_kde - self.center_mean) * dimension
            self.num_params += self.num_mean_params + kd
            if self.fit_normalization:
                self.num_params += kd
            if self.add_skewness:
                self.num_params += kd
                # (K, 1, 1) in the B-minor (K, D, B) parameter layout
                signs = np.ones((num_kde, 1, 1))
                signs[num_kde // 2:, :, :] = -1.0
                self._skew_signs = signs
            else:
                self._skew_signs = np.ones((1, 1, 1))
        elif nonlinear_stretch_type == "rq_splines":
            self.num_params += 2 * kd + (num_kde + 1) * dimension + 4 * dimension
        else:
            raise ValueError(f"unknown stretch type {nonlinear_stretch_type}")

    # -- parameter unpacking ---------------------------------------------
    def _unpack(self, params, batch):
        """Split child-params into (stretch_params, rotation_params, raws).

        Classic-stretch params come out in the B-MINOR (K, D, Bp) layout: a
        cheap 2-D transpose of the (Bp, P) slab, so no (B, K, D) tensor ever
        materializes (XLA tile-pads (K, D) minor dims to (16, 128) - a ~50x
        bandwidth blowup on TPU).

        ``raws`` is a tagged tuple for the fused kernels, or None when the
        layer configuration needs the XLA path (XLA dead-code-eliminates
        whichever of the regulated/raw products goes unused):
          ("raw", means, lw_raw, ln_raw|None)  pre-regulator (K, D, Bp) slabs
          ("lazy", hidden, wm, bm, wlw, blw, wln|None, bln|None)  final MLP
            matmul deferred into the kernels (ops/lazy_params.py) - the
            (B, P) parameter slab never exists in HBM.
        """
        if isinstance(params, LazyParamSlab):
            lazy = self._unpack_lazy(params)
            if lazy is not None:
                return lazy
            params = params.materialize()
        rot = params[:, :self.num_rotation_params]
        rest = params[:, self.num_rotation_params:]
        d, k = self.dimension, self.num_kde
        if self.nonlinear_stretch_type == "classic":
            sizes = [self.num_mean_params, k * d]
            if self.fit_normalization:
                sizes.append(k * d)
            if self.add_skewness:
                sizes.append(k * d)
            parts = split_params(rest, sizes)

            def kdb(block, kk):
                # (Bp, kk*d) -> (kk, d, Bp); row-major (k, d) order preserved
                return block.T.reshape(kk, d, block.shape[0])

            means = kdb(parts[0], k - self.center_mean)
            lw_raw = kdb(parts[1], k)
            log_widths = self.width_regulator(lw_raw)
            if self.fit_normalization:
                ln_raw = kdb(parts[2], k)
                log_norms = self.norm_regulator(ln_raw) \
                    if self.regulate_normalization else ln_raw
            else:
                ln_raw = None
                log_norms = jnp.zeros_like(log_widths)
            se_raw = kdb(parts[-1], k) if self.add_skewness else None
            raws = None
            if not self.center_mean:
                slabs = [means, lw_raw]
                if ln_raw is not None:
                    slabs.append(ln_raw)
                if se_raw is not None:
                    slabs.append(se_raw)
                raws = ("raw", tuple(slabs))
            if self.center_mean:
                w = jnp.exp(log_norms)
                new_mean = -jnp.sum(means * w[:-1], axis=0, keepdims=True) \
                    / w[-1:]
                means = jnp.concatenate([means, new_mean], axis=0)
            if self.add_skewness:
                log_skew = self.exponent_regulator(se_raw)
            else:
                log_skew = jnp.zeros((1, 1, 1), dtype=params.dtype)
            skew_signs = jnp.asarray(self._skew_signs, dtype=params.dtype)
            return (means, log_widths, log_norms, log_skew, skew_signs), \
                rot, raws
        else:
            sizes = [d * k, d * k, d * (k + 1), d * 4]
            lw, lh, ld_, bp = split_params(rest, sizes)
            lw = lw.reshape(-1, d, k)
            lh = lh.reshape(-1, d, k)
            ld_ = ld_.reshape(-1, d, k + 1)
            bp = bp.reshape(-1, d, 4)
            min_abs_width = 0.5
            left = bp[..., 0]
            right = left + jnp.exp(bp[..., 1]) + min_abs_width
            bottom = bp[..., 2]
            top = bottom + jnp.exp(bp[..., 3]) + min_abs_width
            return (lw, lh, ld_, left, right, bottom, top), rot, None

    accepts_lazy_params = True  # _unpack handles LazyParamSlab directly

    def _unpack_lazy(self, params):
        """Lazy-slab unpack: keep the final MLP matmul symbolic so the fused
        kernels run it in VMEM.  Returns (None, rot, tagged_raws) or None
        when the configuration needs materialized params."""
        d, k = self.dimension, self.num_kde
        from ..ops import pallas_gf
        if not (self.nonlinear_stretch_type == "classic"
                and not self.center_mean
                and not self.hp_tail_newton
                and params.dtype == jnp.float32
                and pallas_gf.lazy_kernel_eligible(
                    k, d, params.hidden.shape[1])):
            return None
        nr = self.num_rotation_params
        rot = params[:, :nr].materialize() if nr else \
            jnp.zeros((params.shape[0], 0), dtype=params.dtype)
        rest = params[:, nr:]
        dk = d * k
        groups = [rest[:, :dk], rest[:, dk:2 * dk]]
        n = 2
        if self.fit_normalization:
            groups.append(rest[:, n * dk:(n + 1) * dk])
            n += 1
        if self.add_skewness:
            groups.append(rest[:, n * dk:(n + 1) * dk])
        ws = tuple(g.w for g in groups)
        bs = tuple(g.b for g in groups)
        raws = ("lazy", rest.hidden, ws, bs)
        return None, rot, raws

    def _kernel_eligible(self, dtype):
        if dtype != jnp.float32:
            return False
        from ..ops import pallas_gf
        if self.add_skewness and (
                self.center_mean or not pallas_gf.raw_kernel_eligible(
                    self.num_kde, self.dimension)):
            # the skewed chain runs only through the RAW kernel interface
            # (no prepared-kernel fallback above the VMEM guard, and
            # center_mean needs materialized means); XLA row path instead
            return False
        return pallas_gf.pallas_available()

    def _gf_density_pass(self, x, flow_params, raws=None):
        """(gaussianize(x), log|d/dx|): fused Pallas kernel when eligible
        (f32, no skewness, isigmoid/partly_precise - the same gate as the
        inverse kernel), XLA formulation otherwise.  Gradients are identical
        either way (the kernel's custom_vjp falls back to the XLA vjp).

        With ``raws`` (pre-regulator slabs from _unpack) the kernel also runs
        the width/norm regulators and weight normalization in VMEM, saving
        one HBM round trip per (K, D, B) array per op on amortized layers."""
        ift = self.inverse_function_type
        if self._kernel_eligible(x.dtype):
            from ..ops import pallas_gf
            if raws is not None and raws[0] == "lazy":
                return pallas_gf.gf_forward_lazy(
                    x, *raws[1:], ift, self._kernel_prep,
                    (self.num_kde, self.dimension))
            if raws is not None:
                return pallas_gf.gf_forward_raw(
                    x, raws[1], ift, self._kernel_prep)
            return pallas_gf.gf_forward_pallas(
                x, flow_params[0], flow_params[1], flow_params[2], ift)
        assert flow_params is not None, \
            "lazy params require the Pallas kernel path"
        return logistic_kde.gaussianize_forward(
            x, *flow_params, add_skewness=self.add_skewness,
            inverse_function_type=ift)

    def _apply_rotation(self, rot_params, x, inverse):
        d = self.dimension
        if self.num_rotation_params == 0:
            return x
        if self.rotation_mode == "householder":
            vs = rot_params.reshape(-1, self.householder_iter, d)
            return rotations.householder_apply(vs, x, inverse=inverse)
        elif self.rotation_mode == "angles":
            mat = rotations.givens_matrix(rot_params, d)
        elif self.rotation_mode == "cayley":
            mat = rotations.cayley_matrix(rot_params)
        elif self.rotation_mode == "triangular_combination":
            n_tri = d * (d - 1) // 2
            left = rot_params[:, :n_tri]
            diag = rot_params[:, n_tri:n_tri + d - 1]
            right = rot_params[:, n_tri + d - 1:2 * n_tri + d - 1]
            return matrix.triangular_combination_apply(d, left, diag, right, x,
                                                       inverse=inverse)
        else:
            return x
        return rotations.apply_rotation(mat, x, inverse=inverse)

    # -- mappings ---------------------------------------------------------
    def _forward(self, params, x, log_det):
        """Base -> target (sampling direction): iterative inverse of the
        gaussianization pass, then the rotation (gaussianization_flow.py:911-989)."""
        flow_params, rot, raws = self._unpack(params, x.shape[0])
        if self.nonlinear_stretch_type == "classic":
            ift = self.inverse_function_type

            def value_fn(xx, p):
                return logistic_kde.gaussianize_value(
                    xx, *p, add_skewness=self.add_skewness,
                    inverse_function_type=ift)

            def value_and_grad_fn(xx, p):
                val, log_deriv = logistic_kde.gaussianize_forward(
                    xx, *p, add_skewness=self.add_skewness,
                    inverse_function_type=ift)
                return val, jnp.exp(log_deriv)

            # f64 matches the reference trip counts; f32 converges to machine
            # precision in far fewer iterations (bisection halves the bracket,
            # Newton is quadratic) - 1.7x fewer inverse evaluations on TPU
            if x.dtype == jnp.float64:
                n_bis, n_newt = 25, 20
            else:
                n_bis, n_newt = 18, 8

            solver = None
            # partly_precise uses the same log-space erfinv-from-ln_fac
            # formulation in the kernel and the f32 XLA density pass, so the
            # solve target matches the analytic direction
            if self._kernel_eligible(x.dtype):
                from ..ops import pallas_gf
                if raws is not None and self.hp_tail_newton:
                    # tail refinement needs materialized params and the
                    # density pass evaluated AT the refined solution: take
                    # the solver-kernel + analytic-pass route below
                    raws = None
                if raws is not None:
                    # fully fused: Newton solve + density eval at the
                    # solution in ONE kernel launch (joint implicit-gradient
                    # custom_vjp); regulated flow_params are then dead code
                    if raws[0] == "lazy":
                        res, log_deriv = pallas_gf.gf_sample_lazy(
                            x, *raws[1:], ift, self._kernel_prep,
                            (self.num_kde, self.dimension))
                    else:
                        res, log_deriv = pallas_gf.gf_sample_raw(
                            x, raws[1], ift, self._kernel_prep)
                    log_det = log_det - jnp.sum(log_deriv, axis=-1)
                    res = self._apply_rotation(rot, res, inverse=False)
                    return res, log_det

                if not self.add_skewness:
                    # prepared-interface solver kernel (no skew support;
                    # the skewed solve runs only via the fused raw path)
                    def solver(target, p):
                        return pallas_gf.gf_inverse_pallas(
                            target, p[0], p[1], p[2], ift=ift)

            inv = make_inverse_fn(value_fn, value_and_grad_fn, lo=-1e5, hi=1e5,
                                  num_bisection_iter=n_bis,
                                  num_newton_iter=n_newt, solver=solver)
            res = inv(x, flow_params)
            res = self._maybe_tail_refine(res, x, flow_params)
            _, log_deriv = self._gf_density_pass(res, flow_params, raws)
            log_det = log_det - jnp.sum(log_deriv, axis=-1)
        else:
            lw, lh, ld_, left, right, bottom, top = flow_params
            res, log_deriv = rq_spline_linear_ext(
                x, lw, lh, ld_, left, right, bottom, top, inverse=True)
            log_det = log_det + jnp.sum(log_deriv, axis=-1)

        res = self._apply_rotation(rot, res, inverse=False)
        return res, log_det

    def _maybe_tail_refine(self, res, target, flow_params):
        """Opt-in f64 Newton refinement of the f32 sampling solve
        (high_precision_tail_newton option; TPU-side extension).

        The f32 solve converges to ~2e-4 q999 roundtrip |dlogp| — floored by
        f32 evaluation of the mixture chain, not by iteration count
        (BASELINE.md: N_NEWTON=5 ≡ 4).  Each refinement step re-evaluates
        value+derivative in float64 (TPU: software-emulated, ~1e-14
        accurate) and updates the f32 iterate, pushing the solution to the
        f32-nearest true root.  Requires jax_enable_x64 (f64 arrays cannot
        exist otherwise); measured cost/benefit in BASELINE.md."""
        if not self.hp_tail_newton or target.dtype != jnp.float32 \
                or not jax.config.jax_enable_x64:
            return res
        ps = [p.astype(jnp.float64) for p in flow_params]
        r = res.astype(jnp.float64)
        t = target.astype(jnp.float64)
        for _ in range(self.hp_tail_newton):
            val, logd = logistic_kde.gaussianize_forward(
                r, *ps, add_skewness=self.add_skewness,
                inverse_function_type=self.inverse_function_type)
            r = r - (val - t) * jnp.exp(-logd)
        return r.astype(target.dtype)

    def _inverse(self, params, x, log_det):
        """Target -> base (density direction): inverse rotation, then the
        analytic gaussianization pass (gaussianization_flow.py:995-1114)."""
        flow_params, rot, raws = self._unpack(params, x.shape[0])
        x = self._apply_rotation(rot, x, inverse=True)
        if self.nonlinear_stretch_type == "classic":
            val, log_deriv = self._gf_density_pass(x, flow_params, raws)
            log_det = log_det + jnp.sum(log_deriv, axis=-1)
            return val, log_det
        lw, lh, ld_, left, right, bottom, top = flow_params
        res, log_deriv = rq_spline_linear_ext(
            x, lw, lh, ld_, left, right, bottom, top, inverse=False)
        log_det = log_det + jnp.sum(log_deriv, axis=-1)
        return res, log_det

    def _child_param_structure(self):
        """Names mirror the reference's obtain_layer_param_structure
        (gaussianization_flow.py: "vs"/"anglepars"/"cayleypars"/
        "trianglepars", "means", "log_widths", "log_norms", "exponents";
        rq_splines stretch: "log_heights"/"log_derivatives"/"boundary_points")."""
        rot_name = {"householder": "vs", "angles": "anglepars",
                    "cayley": "cayleypars",
                    "triangular_combination": "trianglepars",
                    "none": "rotation"}[self.rotation_mode]
        parts = []
        if self.num_rotation_params:
            parts.append((rot_name, self.num_rotation_params))
        d, k = self.dimension, self.num_kde
        if self.nonlinear_stretch_type == "classic":
            parts.append(("means", self.num_mean_params))
            parts.append(("log_widths", k * d))
            if self.fit_normalization:
                parts.append(("log_norms", k * d))
            if self.add_skewness:
                parts.append(("exponents", k * d))
        else:
            parts += [("log_widths", d * k), ("log_heights", d * k),
                      ("log_derivatives", d * (k + 1)),
                      ("boundary_points", d * 4)]
        return parts

    def _default_params(self, rng):
        """gaussianization_flow.py:1116-1167."""
        parts = []
        if self.rotation_mode == "householder":
            if self.num_rotation_params > 0:
                parts.append(rng.standard_normal(self.num_rotation_params))
        else:
            parts.append(np.zeros(self.num_rotation_params))
        d, k = self.dimension, self.num_kde
        if self.nonlinear_stretch_type == "classic":
            parts.append(rng.standard_normal(self.num_mean_params))
            parts.append(np.full(k * d, self.init_log_width))
            if self.fit_normalization:
                parts.append(np.ones(k * d))
            if self.add_skewness:
                parts.append(np.zeros(k * d))
        else:
            parts.append(np.ones(k * d))
            parts.append(np.ones(k * d))
            parts.append(np.full((k + 1) * d, 0.54135))  # softplus^-1(1)
            parts.append(np.tile(np.array([-1.0, 1.0, -1.0, 1.0]), d))
        return np.concatenate(parts)


class MultivariateNormal(EuclideanLayer):
    """Affine flow / multivariate normal - symbol "t".

    Reference: multivariate_normal.py:58-312.
    """

    def __init__(self, dimension, cov_type="full", model_offset=0,
                 width_smooth_saturation=1, lower_bound_for_widths=0.01,
                 upper_bound_for_widths=100, softplus_for_width=0,
                 clamp_widths=0):
        super().__init__(dimension, model_offset=model_offset)
        assert cov_type in ("identity", "diagonal_symmetric", "diagonal", "full")
        self.cov_type = cov_type
        self.make_log_positive = width_regulator_fn(
            softplus_for_width, width_smooth_saturation, lower_bound_for_widths,
            upper_bound_for_widths, clamp_widths)
        if cov_type == "diagonal_symmetric":
            self.num_cov_params = 1
        elif cov_type == "diagonal":
            self.num_cov_params = dimension
        elif cov_type == "full":
            self.num_cov_params = dimension + dimension * (dimension - 1) // 2
        else:
            self.num_cov_params = 0
        self.num_params += self.num_cov_params

    def _unpack(self, params):
        d = self.dimension
        if self.cov_type == "identity":
            return (None, None, None)
        if self.cov_type == "diagonal_symmetric":
            return (self.make_log_positive(params[:, :1]), None, None)
        if self.cov_type == "diagonal":
            return (None, self.make_log_positive(params[:, :d]), None)
        return (None, self.make_log_positive(params[:, :d]), params[:, d:])

    def _forward(self, params, x, log_det):
        if self.cov_type == "identity":
            return x, log_det
        pt = self._unpack(params)
        res, ld = matrix.triangular_apply(self.dimension, self.cov_type, pt, x,
                                          inverse=False)
        return res, log_det + ld

    def _inverse(self, params, x, log_det):
        if self.cov_type == "identity":
            return x, log_det
        pt = self._unpack(params)
        res, ld = matrix.triangular_apply(self.dimension, self.cov_type, pt, x,
                                          inverse=True)
        return res, log_det + ld

    def _child_param_structure(self):
        """Names mirror multivariate_normal.py's param_dict keys, including
        the reference's "lower_trinagular_entries" spelling."""
        d = self.dimension
        if self.cov_type == "identity":
            return []
        if self.cov_type == "diagonal_symmetric":
            return [("log_diagonal_symmetric", 1)]
        if self.cov_type == "diagonal":
            return [("log_diagonal", d)]
        return [("log_diagonal", d),
                ("lower_trinagular_entries", d * (d - 1) // 2)]

    def _default_params(self, rng):
        return np.zeros(self.num_cov_params)


class EuclideanIdentity(EuclideanLayer):
    """Identity flow with optional offset - symbol "x"."""

    def __init__(self, dimension, add_offset=0, model_offset=0):
        super().__init__(dimension, model_offset=1 if (add_offset or model_offset) else 0)

    def _forward(self, params, x, log_det):
        return x, log_det

    def _inverse(self, params, x, log_det):
        return x, log_det

    def _default_params(self, rng):
        return np.zeros(0)
