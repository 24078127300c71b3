"""S2 flow layers: Fisher-von-Mises scaling flow (f) and exponential-map
flow (v).  The manifold CNF (c) lives in sphere_cnf.py.

TPU-native reimplementation of layers/spheres/{fvm_2d.py,exponential_map_s2.py}.
Design notes vs the reference:
  * the v-flow Jacobian is obtained with forward-mode autodiff of the
    exponential map (vmap(jacfwd)) instead of hand-derived chain-rule
    formulas - identical math, one fused XLA computation;
  * the sphere-Newton inverse is a bounded lax.while_loop with
    implicit-function gradients (ops/inverse.py:make_sphere_inverse_fn);
  * the boundary identity region uses where-masking instead of
    masked_scatter (static shapes).
"""
from __future__ import annotations

import math

import numpy as np
import jax
import jax.numpy as jnp

from .sphere import SphereLayer
from ..ops import manifold, rotations
from ..ops.inverse import make_sphere_inverse_fn
from ..ops.splines import rq_spline, rq_spline_cols

PI = math.pi


# ---------------------------------------------------------------------------
# Fisher-von-Mises 2-D flow - symbol "f"
# ---------------------------------------------------------------------------

def _azimuthal_flow_scaling(cos_theta):
    """C^2-smooth scaling in [0,1]: 1 at the equator, 0 at both poles
    (fvm_2d.py:267-271).  Used to switch the azimuthal spline flow off
    smoothly near the poles."""
    c = cos_theta
    neg = 6 * c**5 + 15 * c**4 + 10 * c**3 + 1.0
    pos = -6 * c**5 + 15 * c**4 - 10 * c**3 + 1.0
    return jnp.where(c <= 0, neg, pos)


def _vmf_log_expm1_2k(kappa):
    """Numerically stable log(e^{2 kappa} - 1) (fvm_2d.py:352-357)."""
    two_k = 2.0 * kappa
    small = two_k < 0.69
    small_val = jnp.log(jnp.expm1(jnp.where(small, two_k, 0.69)))
    large_val = two_k + jnp.log1p(-jnp.exp(-jnp.where(small, 0.69, two_k)))
    return jnp.where(small, small_val, large_val)


class FisherVonMises2D(SphereLayer):
    """S2 flow: vMF CDF scaling of z=cos(theta) + optional nested spline flows
    - symbol "f" (fvm_2d.py:28-824, arXiv:2002.02428 + smooth-spline variant).

    Parameter layout after the base rotation params:
      [log-kappa (0/1)] + [correlated flow params | vertical + circular params]
    The nested flows are passthrough PDF objects (recursive use of the
    orchestrator inside a layer, amortized by this layer's parameter slab).
    """

    def __init__(self, dimension=2, euclidean_to_sphere_as_first=0,
                 fisher_parametrization="split",
                 add_vertical_rq_spline_flow=0,
                 add_circular_rq_spline_flow=0,
                 vertical_flow_defs="rr",
                 circular_flow_defs="oo",
                 add_correlated_rq_spline_flow=0,
                 correlated_max_rank=3,
                 inverse_z_scaling=1,
                 spline_num_basis_functions=5,
                 boundary_cos_theta_identity_region=0.0,
                 vertical_smooth=0,
                 vertical_restrict_max_min_width_height_ratio=-1.0,
                 vertical_fix_boundary_derivative=1,
                 vertical_fix_first_width_n_height_to_zero=0,
                 vertical_also_fix_second_width_to_zero=0,
                 vertical_independent_width_height_parametrization=0,
                 circular_add_rotation=0,
                 min_kappa=1e-10,
                 kappa_prediction="direct_log_real_bounded",
                 add_extra_rotation_inbetween=0,
                 kappa_clamping=0,
                 add_rotation=1,
                 rotation_mode="householder",
                 num_householder_iter=-1, **kwargs):
        super().__init__(2, euclidean_to_sphere_as_first, add_rotation,
                         rotation_mode=rotation_mode,
                         num_householder_iter=num_householder_iter, **kwargs)
        assert fisher_parametrization == "split"
        self.z_scaling_factor = -1.0 if inverse_z_scaling else 1.0
        self.min_kappa = min_kappa
        self.kappa_prediction = kappa_prediction
        self.kappa_clamping = int(kappa_clamping)
        self.boundary = float(boundary_cos_theta_identity_region)
        self.add_extra_rotation_inbetween = int(add_extra_rotation_inbetween)

        self.has_kappa_param = kappa_prediction in (
            "direct_log_real_bounded", "softplus_real_bounded", "log_bounded")
        if kappa_prediction in ("mu", "mu_squared"):
            assert self.add_rotation and rotation_mode == "xyz"
        if kappa_prediction in ("quatvec", "quatvec_squared"):
            assert self.add_rotation and rotation_mode == "quaternion"
        self.num_kappa_params = 1 if self.has_kappa_param else 0
        self.num_params += self.num_kappa_params

        self.add_vertical = int(add_vertical_rq_spline_flow)
        self.add_circular = int(add_circular_rq_spline_flow)
        self.add_correlated = int(add_correlated_rq_spline_flow)

        from ..models.pdf import PDF  # deferred: avoids import cycle

        b = self.boundary
        interval_def = "i1_-%.2f_%.2f" % (1.0 - b, 1.0 - b)

        def vertical_overrides():
            d = {"r": {
                "fix_boundary_derivatives": -1.0 if vertical_fix_boundary_derivative == 0 else 1.0,
                "smooth_second_derivative": vertical_smooth,
                "restrict_max_min_width_height_ratio": vertical_restrict_max_min_width_height_ratio,
                "fix_first_width_n_height_to_zero": vertical_fix_first_width_n_height_to_zero,
                "also_fix_second_width_to_zero": vertical_also_fix_second_width_to_zero,
                "independent_width_height_parametrization": vertical_independent_width_height_parametrization,
            }}
            if spline_num_basis_functions == -1:
                # alternate 2/3 bins (requires smooth splines)
                assert vertical_smooth == 1
                for cur_r in range(len(vertical_flow_defs)):
                    d[(0, cur_r)] = {"r": dict(d["r"])}
                    d[(0, cur_r)]["r"]["num_basis_functions"] = 2 if cur_r % 2 == 0 else 3
            else:
                d["r"]["num_basis_functions"] = spline_num_basis_functions
            return d

        self.total_num_vertical = 0
        self.total_num_circular = 0
        self.total_num_correlated = 0
        self.vertical_flow = None
        self.circular_flow = None
        self.correlated_flow = None

        if self.add_correlated:
            assert not self.add_vertical and not self.add_circular
            self.correlated_flow = PDF(
                interval_def + "+s1",
                vertical_flow_defs + "+" + circular_flow_defs,
                amortize_everything=True,
                amortization_mlp_use_custom_mode=True,
                amortization_mlp_dims="64",
                amortization_mlp_ranks=correlated_max_rank,
                use_as_passthrough_instead_of_pdf=True)
            self.total_num_correlated = self.correlated_flow.total_number_amortizable_params
            self.num_params += self.total_num_correlated
        else:
            if self.add_vertical:
                self.vertical_flow = PDF(
                    interval_def, vertical_flow_defs,
                    options_overwrite=vertical_overrides(),
                    amortize_everything=True,
                    amortization_mlp_use_custom_mode=True,
                    use_as_passthrough_instead_of_pdf=True)
                self.total_num_vertical = self.vertical_flow.total_number_amortizable_params
                self.num_params += self.total_num_vertical
            if self.add_circular:
                assert circular_add_rotation == 0, \
                    "additional S1 rotations not allowed (pole complications)"
                self.circular_flow = PDF(
                    "s1", circular_flow_defs,
                    options_overwrite={"o": {
                        "num_basis_functions": 2,
                        "smooth_second_derivative": 1,
                        "fix_first_width_n_height_to_zero": vertical_fix_first_width_n_height_to_zero,
                        "also_fix_second_width_to_zero": vertical_also_fix_second_width_to_zero,
                        "independent_width_height_parametrization": vertical_independent_width_height_parametrization,
                        "add_rotation": circular_add_rotation,
                    }},
                    amortize_everything=True,
                    amortization_mlp_use_custom_mode=True,
                    use_as_passthrough_instead_of_pdf=True)
                self.total_num_circular = self.circular_flow.total_number_amortizable_params
                # scaling applies to non-rotation params only (fvm_2d.py:228-236)
                masks = []
                for flow_obj in self.circular_flow.layer_list[0]:
                    masks.append(np.zeros(flow_obj.num_rotation_params, dtype=bool))
                    masks.append(np.ones(flow_obj.num_params - flow_obj.num_rotation_params,
                                         dtype=bool))
                self._circular_scale_mask = np.concatenate(masks)
                self.num_params += self.total_num_circular

    # -- kappa ------------------------------------------------------------
    def _kappa(self, params, rot_params):
        if self.has_kappa_param:
            x = params[:, 0:1]
            if self.kappa_prediction == "direct_log_real_bounded":
                if self.kappa_clamping:
                    x = jnp.maximum(x, -5.0)
                return jnp.exp(x) + self.min_kappa
            if self.kappa_prediction == "softplus_real_bounded":
                if self.kappa_clamping:
                    x = jnp.maximum(x, -5.0)
                return jax.nn.softplus(x) + self.min_kappa
            # log_bounded
            sp = jax.nn.softplus(x)
            if self.kappa_clamping:
                sp = jnp.maximum(sp, -5.0)
            return jnp.exp(sp + math.log(self.min_kappa))
        # kappa derived from the rotation parameters (fvm_2d.py:289-306)
        if self.kappa_prediction == "mu":
            return jnp.sqrt(jnp.sum(rot_params**2, axis=-1, keepdims=True))
        if self.kappa_prediction == "mu_squared":
            return jnp.sum(rot_params**2, axis=-1, keepdims=True)
        if self.kappa_prediction == "quatvec":
            return jnp.sqrt(jnp.sum(rot_params[:, 1:]**2, axis=-1, keepdims=True))
        return jnp.sum(rot_params[:, 1:]**2, axis=-1, keepdims=True)

    def _split_nested(self, params):
        off = self.num_kappa_params
        if self.add_correlated:
            return params[:, off:off + self.total_num_correlated], None, None
        vert = circ = None
        if self.add_vertical:
            vert = params[:, off:off + self.total_num_vertical]
            off += self.total_num_vertical
        if self.add_circular:
            circ = params[:, off:off + self.total_num_circular]
        return None, vert, circ

    def _scaled_circular_params(self, circ, scalings, batch):
        mask = jnp.asarray(self._circular_scale_mask)
        circ = jnp.broadcast_to(circ, (batch, circ.shape[1]))
        return jnp.where(mask[None, :], circ * scalings, circ)

    # -- kappa z-transform ------------------------------------------------
    def _vmf_z_inverse(self, z, kappa, log_det):
        """Density-direction z transform + log-det (fvm_2d.py:352-374)."""
        s = self.z_scaling_factor
        small = kappa < (1e-8 if z.dtype == jnp.float64 else 1e-4)
        kappa_safe = jnp.where(small, 1.0, kappa)
        safe_part = _vmf_log_expm1_2k(kappa_safe)
        ld_update = (jnp.log(2.0 * kappa_safe) + kappa_safe * (s * z + 1.0)
                     - safe_part)
        ret = s * ((1.0 + jnp.exp(-2.0 * kappa_safe)
                    - 2.0 * jnp.exp(kappa_safe * (s * z - 1.0)))
                   / (-1.0 + jnp.exp(-2.0 * kappa_safe)))
        ret = jnp.where(small, z, ret)
        ld_update = jnp.where(small, 0.0, ld_update)
        return ret, log_det + ld_update[:, 0]

    def _vmf_z_forward(self, z, kappa, log_det):
        """Sampling-direction z transform + log-det (fvm_2d.py:690-710)."""
        s = self.z_scaling_factor
        small = kappa < (1e-8 if z.dtype == jnp.float64 else 1e-4)
        kappa_safe = jnp.where(small, 1.0, kappa)
        ld_update = -jnp.log(kappa_safe * s * z
                             + kappa_safe / jnp.tanh(kappa_safe))
        ret = s * (1.0 + (1.0 / kappa_safe) * jnp.log(
            0.5 * (1.0 + s * z) + (0.5 - 0.5 * s * z) * jnp.exp(-2.0 * kappa_safe)))
        ret = jnp.where(small, z, ret)
        ld_update = jnp.where(small, 0.0, ld_update)
        return ret, log_det + ld_update[:, 0]

    # -- nested flows with boundary masking -------------------------------
    def _contained_mask(self, z):
        """Points inside the non-identity region |z| < 1 - boundary."""
        b = self.boundary
        return (z[:, 0] > (-1.0 + b)) & (z[:, 0] < (1.0 - b))

    def _apply_nested(self, flow, x, log_det, amort, forward, contained=None):
        """Run a passthrough PDF on x; outside the boundary identity region
        (mask `contained` computed from z) the map is the identity -
        where-masking instead of the reference's masked_scatter."""
        zeros_ld = jnp.zeros_like(log_det)
        if forward:
            y, dld = flow.all_layer_forward({}, x, zeros_ld, None,
                                            amortization_parameters=amort)
        else:
            y, dld = flow.all_layer_inverse({}, x, zeros_ld, None,
                                            amortization_parameters=amort)
        if self.boundary == 0.0 or contained is None:
            return y, log_det + dld
        y = jnp.where(contained[:, None], y, x)
        return y, log_det + jnp.where(contained, dld, 0.0)

    def _extra_inbetween_rotation(self, z, angle, log_det, inverse):
        """Fixed 90-degree rotation about y between the vMF scaling and the
        nested flows (fvm_2d.py:381-402, 664-687)."""
        theta = jnp.arccos(manifold.safe_costheta(z))
        log_det = log_det - jnp.log(jnp.sin(
            manifold.safe_angle_within_pi(theta[:, 0])))
        comb = jnp.concatenate([theta, angle], axis=1)
        comb, log_det = manifold.spherical_to_eucl(2, comb, log_det)
        mat = jnp.asarray([[0.0, 0.0, 1.0], [0.0, 1.0, 0.0], [-1.0, 0.0, 0.0]],
                          dtype=z.dtype)
        if inverse:
            comb = comb @ mat
        else:
            comb = comb @ mat.T
        comb, log_det = manifold.eucl_to_spherical(2, comb, log_det)
        z = jnp.cos(comb[:, :1])
        log_det = log_det + jnp.log(jnp.sin(
            manifold.safe_angle_within_pi(comb[:, 0])))
        return z, comb[:, 1:], log_det

    # -- mappings ---------------------------------------------------------
    def _inverse(self, params, x, log_det, rot_params=None):
        if self.always_parametrize_in_embedding_space:
            x, log_det = manifold.eucl_to_spherical(2, x, log_det)
        kappa = self._kappa(params, rot_params)
        correlated, vertical, circular = self._split_nested(params)

        z = jnp.cos(x[:, :1])
        log_det = log_det + jnp.log(jnp.sin(
            manifold.safe_angle_within_pi(x[:, 0])))
        angle = x[:, 1:]

        z, log_det = self._vmf_z_inverse(z, kappa, log_det)
        z = manifold.safe_costheta(z)

        if self.add_extra_rotation_inbetween:
            z, angle, log_det = self._extra_inbetween_rotation(
                z, angle, log_det, inverse=True)

        batch = x.shape[0]
        contained = self._contained_mask(z) if self.boundary > 0.0 else None
        if correlated is not None:
            comb = jnp.concatenate([z, angle], axis=1)
            comb, log_det = self._apply_nested(self.correlated_flow, comb,
                                               log_det, correlated,
                                               forward=False,
                                               contained=contained)
            z, angle = comb[:, :1], comb[:, 1:]
        else:
            if circular is not None:
                scalings = _azimuthal_flow_scaling(z)
                circ_scaled = self._scaled_circular_params(circular, scalings,
                                                           batch)
                angle, log_det = self._apply_nested(
                    self.circular_flow, angle, log_det, circ_scaled,
                    forward=False, contained=contained)
            if vertical is not None:
                z, log_det = self._apply_nested(self.vertical_flow, z, log_det,
                                                vertical, forward=False,
                                                contained=contained)

        z = manifold.safe_costheta(z)
        theta = jnp.arccos(z)
        log_det = log_det - jnp.log(jnp.sin(
            manifold.safe_angle_within_pi(theta[:, 0])))
        ret = jnp.concatenate([theta, angle], axis=1)
        if self.always_parametrize_in_embedding_space:
            ret, log_det = manifold.spherical_to_eucl(2, ret, log_det)
        return ret, log_det

    def _forward(self, params, x, log_det, rot_params=None):
        if self.always_parametrize_in_embedding_space:
            x, log_det = manifold.eucl_to_spherical(2, x, log_det)
        kappa = self._kappa(params, rot_params)
        correlated, vertical, circular = self._split_nested(params)

        z = jnp.cos(x[:, :1])
        log_det = log_det + jnp.log(jnp.sin(
            manifold.safe_angle_within_pi(x[:, 0])))
        angle = x[:, 1:]
        batch = x.shape[0]

        contained = self._contained_mask(z) if self.boundary > 0.0 else None
        if correlated is not None:
            comb = jnp.concatenate([z, angle], axis=1)
            comb, log_det = self._apply_nested(self.correlated_flow, comb,
                                               log_det, correlated,
                                               forward=True,
                                               contained=contained)
            z, angle = comb[:, :1], comb[:, 1:]
        else:
            if vertical is not None:
                z, log_det = self._apply_nested(self.vertical_flow, z, log_det,
                                                vertical, forward=True,
                                                contained=contained)
            if circular is not None:
                scalings = _azimuthal_flow_scaling(z)
                circ_scaled = self._scaled_circular_params(circular, scalings,
                                                           batch)
                angle, log_det = self._apply_nested(
                    self.circular_flow, angle, log_det, circ_scaled,
                    forward=True, contained=contained)

        if self.add_extra_rotation_inbetween:
            z, angle, log_det = self._extra_inbetween_rotation(
                z, angle, log_det, inverse=False)

        z, log_det = self._vmf_z_forward(z, kappa, log_det)
        z = manifold.safe_costheta(z)
        theta = jnp.arccos(z)
        log_det = log_det - jnp.log(jnp.sin(
            manifold.safe_angle_within_pi(theta[:, 0])))
        ret = jnp.concatenate([theta, angle], axis=1)
        if self.always_parametrize_in_embedding_space:
            ret, log_det = manifold.spherical_to_eucl(2, ret, log_det)
        return ret, log_det

    # -- column fast path ---------------------------------------------------
    # Flat-(B,) coordinate columns; ~11x on elementwise math vs tile-padded
    # (B, 1)/(B, 2) arrays (layers/base.py supports_columns, measured v5e).
    def _supports_columns_child(self):
        if self.add_correlated or self.add_extra_rotation_inbetween:
            return False
        for flow in (self.vertical_flow, self.circular_flow):
            if flow is not None and not all(
                    l.supports_columns() for l in flow.layer_list[0]):
                return False
        return True

    def _kappa_cols(self, slab, rot_slab):
        """Column twin of _kappa: (Bp,) kappa column."""
        if self.has_kappa_param:
            x = slab[0]
            if self.kappa_prediction == "direct_log_real_bounded":
                if self.kappa_clamping:
                    x = jnp.maximum(x, -5.0)
                return jnp.exp(x) + self.min_kappa
            if self.kappa_prediction == "softplus_real_bounded":
                if self.kappa_clamping:
                    x = jnp.maximum(x, -5.0)
                return jax.nn.softplus(x) + self.min_kappa
            sp = jax.nn.softplus(x)
            if self.kappa_clamping:
                sp = jnp.maximum(sp, -5.0)
            return jnp.exp(sp + math.log(self.min_kappa))
        if self.kappa_prediction == "mu":
            return jnp.sqrt(sum(rot_slab[i]**2 for i in range(3)))
        if self.kappa_prediction == "mu_squared":
            return sum(rot_slab[i]**2 for i in range(3))
        if self.kappa_prediction == "quatvec":
            return jnp.sqrt(sum(rot_slab[i]**2 for i in range(1, 4)))
        return sum(rot_slab[i]**2 for i in range(1, 4))

    def _split_nested_cols(self, slab):
        off = self.num_kappa_params
        vert = circ = None
        if self.add_vertical:
            vert = slab[off:off + self.total_num_vertical]
            off += self.total_num_vertical
        if self.add_circular:
            circ = slab[off:off + self.total_num_circular]
        return vert, circ

    def _scaled_circ_slab(self, circ, scalings):
        """Scale the non-rotation rows of the circular slab by the
        azimuthal pole polynomial (fvm_2d.py:228-236); (P, Bp) x (B,) ->
        (P, B)."""
        mask = jnp.asarray(self._circular_scale_mask)
        return jnp.where(mask[:, None], circ * scalings[None, :], circ)

    def _vmf_z_inverse_cols(self, z, kappa, log_det):
        s = self.z_scaling_factor
        small = kappa < (1e-8 if z.dtype == jnp.float64 else 1e-4)
        kappa_safe = jnp.where(small, 1.0, kappa)
        safe_part = _vmf_log_expm1_2k(kappa_safe)
        ld_update = (jnp.log(2.0 * kappa_safe) + kappa_safe * (s * z + 1.0)
                     - safe_part)
        ret = s * ((1.0 + jnp.exp(-2.0 * kappa_safe)
                    - 2.0 * jnp.exp(kappa_safe * (s * z - 1.0)))
                   / (-1.0 + jnp.exp(-2.0 * kappa_safe)))
        ret = jnp.where(small, z, ret)
        ld_update = jnp.where(small, 0.0, ld_update)
        return ret, log_det + ld_update

    def _vmf_z_forward_cols(self, z, kappa, log_det):
        s = self.z_scaling_factor
        small = kappa < (1e-8 if z.dtype == jnp.float64 else 1e-4)
        kappa_safe = jnp.where(small, 1.0, kappa)
        ld_update = -jnp.log(kappa_safe * s * z
                             + kappa_safe / jnp.tanh(kappa_safe))
        ret = s * (1.0 + (1.0 / kappa_safe) * jnp.log(
            0.5 * (1.0 + s * z) + (0.5 - 0.5 * s * z) * jnp.exp(-2.0 * kappa_safe)))
        ret = jnp.where(small, z, ret)
        ld_update = jnp.where(small, 0.0, ld_update)
        return ret, log_det + ld_update

    def _apply_nested_cols(self, flow, x, log_det, slab, forward, contained):
        """Run a nested passthrough PDF's single sub-manifold layer stack in
        columns, reproducing all_layer_forward/inverse slicing (front for
        forward, back-reversed for inverse) with boundary where-masking."""
        layers = flow.layer_list[0]
        dld = jnp.zeros_like(log_det)
        cols = (x,)
        cnt = 0
        if forward:
            for layer in layers:
                p = layer.num_params
                cols, dld = layer.forward_cols(slab[cnt:cnt + p], cols, dld)
                cnt += p
        else:
            total = slab.shape[0]
            for layer in reversed(layers):
                p = layer.num_params
                hi = total - cnt
                cols, dld = layer.inverse_cols(slab[hi - p:hi], cols, dld)
                cnt += p
        y = cols[0]
        if self.boundary == 0.0 or contained is None:
            return y, log_det + dld
        y = jnp.where(contained, y, x)
        return y, log_det + jnp.where(contained, dld, 0.0)

    def _contained_mask_col(self, z):
        b = self.boundary
        return (z > (-1.0 + b)) & (z < (1.0 - b))

    def _inverse_cols(self, slab, cols, log_det, rot_slab=None):
        theta, angle = cols
        kappa = self._kappa_cols(slab, rot_slab)
        vert_slab, circ_slab = self._split_nested_cols(slab)

        z = jnp.cos(theta)
        log_det = log_det + jnp.log(jnp.sin(
            manifold.safe_angle_within_pi(theta)))

        z, log_det = self._vmf_z_inverse_cols(z, kappa, log_det)
        z = manifold.safe_costheta(z)

        contained = self._contained_mask_col(z) if self.boundary > 0.0 \
            else None
        if circ_slab is not None:
            scalings = _azimuthal_flow_scaling(z)
            scaled = self._scaled_circ_slab(circ_slab, scalings)
            angle, log_det = self._apply_nested_cols(
                self.circular_flow, angle, log_det, scaled, forward=False,
                contained=contained)
        if vert_slab is not None:
            z, log_det = self._apply_nested_cols(
                self.vertical_flow, z, log_det, vert_slab, forward=False,
                contained=contained)

        z = manifold.safe_costheta(z)
        theta = jnp.arccos(z)
        log_det = log_det - jnp.log(jnp.sin(
            manifold.safe_angle_within_pi(theta)))
        return (theta, angle), log_det

    def _forward_cols(self, slab, cols, log_det, rot_slab=None):
        theta, angle = cols
        kappa = self._kappa_cols(slab, rot_slab)
        vert_slab, circ_slab = self._split_nested_cols(slab)

        z = jnp.cos(theta)
        log_det = log_det + jnp.log(jnp.sin(
            manifold.safe_angle_within_pi(theta)))

        contained = self._contained_mask_col(z) if self.boundary > 0.0 \
            else None
        if vert_slab is not None:
            z, log_det = self._apply_nested_cols(
                self.vertical_flow, z, log_det, vert_slab, forward=True,
                contained=contained)
        if circ_slab is not None:
            scalings = _azimuthal_flow_scaling(z)
            scaled = self._scaled_circ_slab(circ_slab, scalings)
            angle, log_det = self._apply_nested_cols(
                self.circular_flow, angle, log_det, scaled, forward=True,
                contained=contained)

        z, log_det = self._vmf_z_forward_cols(z, kappa, log_det)
        z = manifold.safe_costheta(z)
        theta = jnp.arccos(z)
        log_det = log_det - jnp.log(jnp.sin(
            manifold.safe_angle_within_pi(theta)))
        return (theta, angle), log_det

    # -- (z, phi)-carrier twins: identical math minus the per-layer
    # theta <-> z trig and log(sin) bookkeeping (the carrier's measure IS
    # dz dphi; see layers/sphere.py supports_zphi_dir) ---------------------
    def supports_zphi_dir(self, direction):
        return self.supports_columns_dir(direction)

    def _inverse_cols_z(self, slab, cols, log_det, rot_slab=None):
        z, angle = cols
        kappa = self._kappa_cols(slab, rot_slab)
        vert_slab, circ_slab = self._split_nested_cols(slab)

        z, log_det = self._vmf_z_inverse_cols(z, kappa, log_det)
        z = manifold.safe_costheta(z)

        contained = self._contained_mask_col(z) if self.boundary > 0.0 \
            else None
        if circ_slab is not None:
            scalings = _azimuthal_flow_scaling(z)
            scaled = self._scaled_circ_slab(circ_slab, scalings)
            angle, log_det = self._apply_nested_cols(
                self.circular_flow, angle, log_det, scaled, forward=False,
                contained=contained)
        if vert_slab is not None:
            z, log_det = self._apply_nested_cols(
                self.vertical_flow, z, log_det, vert_slab, forward=False,
                contained=contained)

        z = manifold.safe_costheta(z)
        return (z, angle), log_det

    def _forward_cols_z(self, slab, cols, log_det, rot_slab=None):
        z, angle = cols
        kappa = self._kappa_cols(slab, rot_slab)
        vert_slab, circ_slab = self._split_nested_cols(slab)

        contained = self._contained_mask_col(z) if self.boundary > 0.0 \
            else None
        if vert_slab is not None:
            z, log_det = self._apply_nested_cols(
                self.vertical_flow, z, log_det, vert_slab, forward=True,
                contained=contained)
        if circ_slab is not None:
            scalings = _azimuthal_flow_scaling(z)
            scaled = self._scaled_circ_slab(circ_slab, scalings)
            angle, log_det = self._apply_nested_cols(
                self.circular_flow, angle, log_det, scaled, forward=True,
                contained=contained)

        z, log_det = self._vmf_z_forward_cols(z, kappa, log_det)
        z = manifold.safe_costheta(z)
        return (z, angle), log_det

    def _child_param_structure(self):
        """Names mirror fvm_2d.py: loglike_kappa, vertical_params,
        circular_params, correlated_params (nested flows expose their full
        amortization slab under one name, as the reference does)."""
        parts = []
        if self.num_kappa_params:
            parts.append(("loglike_kappa", self.num_kappa_params))
        if self.add_correlated:
            parts.append(("correlated_params", self.total_num_correlated))
        else:
            if self.add_vertical:
                parts.append(("vertical_params", self.total_num_vertical))
            if self.add_circular:
                parts.append(("circular_params", self.total_num_circular))
        return parts

    def _default_params(self, rng):
        parts = []
        if self.has_kappa_param:
            parts.append(rng.standard_normal(1) - 3.0)
        # nested flows need their FULL amortization slab (incl. any internal
        # MLPs of the correlated flow), not just raw layer params
        if self.add_correlated:
            parts.append(self.correlated_flow.default_amortization_params(rng))
        else:
            if self.add_vertical:
                parts.append(self.vertical_flow.default_amortization_params(rng))
            if self.add_circular:
                parts.append(self.circular_flow.default_amortization_params(rng))
        if not parts:
            return np.zeros(0)
        return np.concatenate(parts)


# ---------------------------------------------------------------------------
# Exponential-map S2 flow - symbol "v"
# ---------------------------------------------------------------------------

def _mu_norm_function_old(x, stretch_factor=10.0, max_value=1.0):
    """Bounds positive input below max_value (exponential_map_s2.py:32-43)."""
    return -jnp.log(1.0 + (math.e - 1.0) * jnp.exp(-x / stretch_factor)) + max_value


class ExponentialMapS2(SphereLayer):
    """S2 exponential-map flow - symbol "v" (exponential_map_s2.py:73-553,
    arXiv:0906.0874 / 2002.02428).

    phi(x) = exp_x(tangent projection of grad Phi(x)) with Phi a convex
    potential (linear / quadratic / exponential / splines mixture).  The
    non-analytic direction is inverted by Newton iteration on the sphere.
    """

    NUM_SPLINE_BASIS = 10

    def __init__(self, dimension=2, euclidean_to_sphere_as_first=0,
                 exp_map_type="exponential", natural_direction=0,
                 num_components=10, add_rotation=0, max_num_newton_iter=1000,
                 mean_parametrization="old", **kwargs):
        super().__init__(2, euclidean_to_sphere_as_first, add_rotation,
                         rotation_mode="householder", **kwargs)
        self.exp_map_type = exp_map_type
        self.natural_direction = int(natural_direction)
        self.num_components = num_components
        self.max_num_newton_iter = max_num_newton_iter
        self.mean_parametrization = mean_parametrization

        if mean_parametrization == "old":
            self.num_mu_params = 3
        else:  # householder: 3x3 reflections + 1 norm param
            self.num_mu_params = 10

        if exp_map_type in ("linear", "quadratic"):
            self.num_potential_pars = self.num_mu_params + 1
        elif exp_map_type == "exponential":
            self.num_potential_pars = self.num_mu_params + 2
        elif exp_map_type == "splines":
            self.num_potential_pars = (self.num_mu_params + 1
                                       + self.NUM_SPLINE_BASIS * 3 + 1)
        else:
            raise ValueError(f"unknown exp_map_type {exp_map_type}")
        self.num_params += self.num_potential_pars * self.num_components

    # -- potential gradient field ----------------------------------------
    def _mu_and_weights(self, pp):
        """pp: (P, K) single-sample potential params -> (mu (3,K), w (1,K),
        rest)."""
        m = self.num_mu_params
        if self.mean_parametrization == "old":
            raw = pp[:3, :]
            norm = jnp.sqrt(jnp.sum(raw**2, axis=0, keepdims=True))
            mu = raw / norm
            fake_norm = _mu_norm_function_old(norm)
        else:
            vs = pp[:9, :].T.reshape(-1, 3, 3)          # (K,3,3)
            hh = rotations.householder_matrix(vs)       # (K,3,3)
            mu = hh[:, :, 2].T                          # rotate e_z -> (3,K)
            fake_norm = jax.nn.sigmoid(pp[9:10, :])
        log_w = pp[m:m + 1, :] - jax.scipy.special.logsumexp(
            pp[m:m + 1, :], axis=1, keepdims=True) + jnp.log(fake_norm)
        return mu, jnp.exp(log_w), pp

    def _grad_field(self, x, pp):
        """Gradient of the convex potential at a single point x (3,)."""
        m = self.num_mu_params
        mu, w, pp = self._mu_and_weights(pp)
        x_mu = jnp.sum(x[:, None] * mu, axis=0, keepdims=True)   # (1,K)
        if self.exp_map_type == "linear":
            return jnp.sum(w * mu, axis=-1)
        if self.exp_map_type == "quadratic":
            return jnp.sum(w * mu * x_mu, axis=-1)
        if self.exp_map_type == "exponential":
            beta = jnp.exp(pp[m + 1:m + 2, :])
            return jnp.sum(w * mu * jnp.exp(beta * (x_mu - 1.0)), axis=-1)
        # splines: potential gradient = RQ spline of x.mu on [-1,1]
        nb = self.NUM_SPLINE_BASIS
        uw = pp[m + 1:m + 1 + nb, :].T[None, :, :]               # (1,K,nb)
        uh = pp[m + 1 + nb:m + 1 + 2 * nb, :].T[None, :, :]
        ud = pp[m + 1 + 2 * nb:m + 2 + 3 * nb, :].T[None, :, :]
        res, _ = rq_spline(x_mu, uw, uh, ud, inverse=False,
                           left=-1.0, right=1.0, bottom=-1.0, top=1.0)
        return jnp.sum(w * mu * res, axis=-1)

    def _phi_single(self, x, pp):
        """Exponential-map flow at a single point: exp_x of the tangent
        projection of the gradient field (exponential_map_s2.py:153-219).

        Guards are dtype-aware: f64 constants like 1-1e-14 round to exactly
        1.0 in f32, turning sqrt(1-cos^2) into 0/0 NaNs when the gradient
        field aligns (anti-)radially."""
        eps = jnp.finfo(x.dtype).eps
        tiny = jnp.finfo(x.dtype).tiny
        g = self._grad_field(x, pp)
        g_norm = jnp.sqrt(jnp.maximum(jnp.sum(g**2), tiny))
        g_unit = g / g_norm
        edge = jnp.maximum(1e-14, 8.0 * eps)
        cos_a = jnp.clip(jnp.sum(g_unit * x), -1.0 + edge, 1.0 - edge)
        sin_a = jnp.sqrt(jnp.maximum(1.0 - cos_a**2, tiny))
        tangent = (g_unit - x * cos_a) / sin_a
        v_norm = jnp.sum(g * tangent)
        return x * jnp.cos(v_norm) + tangent * jnp.sin(v_norm)

    def _tangent_basis(self, x):
        """Any orthonormal basis of the tangent plane (det(P^T P) is
        basis-independent)."""
        ref = jnp.where(jnp.abs(x[:, 2:3]) < 0.9,
                        jnp.asarray([0.0, 0.0, 1.0], dtype=x.dtype),
                        jnp.asarray([1.0, 0.0, 0.0], dtype=x.dtype))
        t1 = ref - x * jnp.sum(ref * x, axis=1, keepdims=True)
        t1 = t1 / jnp.linalg.norm(t1, axis=1, keepdims=True)
        t2 = jnp.cross(x, t1)
        return jnp.stack([t1, t2], axis=-1)   # (B,3,2)

    def _exp_map_and_jac(self, x, potential_pars):
        """(phi, J (B,3,3), tangent basis (B,3,2)); J via vmap(jacfwd)."""
        pp = jnp.broadcast_to(potential_pars,
                              (x.shape[0],) + potential_pars.shape[1:])
        phi = jax.vmap(self._phi_single)(x, pp)
        jac = jax.vmap(jax.jacfwd(self._phi_single, argnums=0))(x, pp)
        return phi, jac, self._tangent_basis(x)

    def _basic_exp_map(self, start, v_unit, v_norm):
        return start * jnp.cos(v_norm) + v_unit * jnp.sin(v_norm)

    def _logdet_at(self, x, potential_pars):
        phi, jac, basis = self._exp_map_and_jac(x, potential_pars)
        p_mat = jnp.einsum("bij,bjk->bik", jac, basis)
        ptp = jnp.einsum("bij,bik->bjk", p_mat, p_mat)
        _, slog = jnp.linalg.slogdet(ptp)
        return phi, 0.5 * slog

    def _solve_inverse(self, target, potential_pars):
        inv = make_sphere_inverse_fn(self._exp_map_and_jac,
                                     self._basic_exp_map,
                                     max_iter=self.max_num_newton_iter,
                                     damping=0.4)
        return inv(target, potential_pars)

    # -- mappings ---------------------------------------------------------
    def _potential_pars(self, params):
        return params.reshape(-1, self.num_potential_pars, self.num_components)

    def _inverse(self, params, x, log_det, rot_params=None):
        pot = self._potential_pars(params)
        if not self.always_parametrize_in_embedding_space:
            x, log_det = manifold.spherical_to_eucl(2, x, log_det)
        if self.natural_direction:
            result = self._solve_inverse(x, pot)
            _, ld = self._logdet_at(result, pot)
            log_det = log_det - ld
        else:
            result, ld = self._logdet_at(x, pot)
            log_det = log_det + ld
        if not self.always_parametrize_in_embedding_space:
            result, log_det = manifold.eucl_to_spherical(2, result, log_det)
        return result, log_det

    def _forward(self, params, x, log_det, rot_params=None):
        pot = self._potential_pars(params)
        if not self.always_parametrize_in_embedding_space:
            x, log_det = manifold.spherical_to_eucl(2, x, log_det)
        if self.natural_direction:
            result, ld = self._logdet_at(x, pot)
            log_det = log_det + ld
        else:
            result = self._solve_inverse(x, pot)
            _, ld = self._logdet_at(result, pot)
            log_det = log_det - ld
        if not self.always_parametrize_in_embedding_space:
            result, log_det = manifold.eucl_to_spherical(2, result, log_det)
        return result, log_det

    # -- column fast path (both directions, round 4) -------------------------
    # The exp-map itself is analytic; its inversion runs the COLUMN
    # sphere-Newton solver (ops/inverse.py make_sphere_inverse_cols_fn):
    # flat (B,) state columns and one vjp per iteration instead of the row
    # path's per-sample 3x3 vmap(jacfwd) Jacobians (the machinery that
    # measured 0.72M evals/s before the analytic-direction column fix).
    def _supports_columns_child(self):
        return True

    def _pot_cols(self, slab):
        """slab (npp*K, Bp) -> nested [p][k] columns (row path packs
        params.reshape(-1, npp, K): flat index p*K + k)."""
        K = self.num_components
        return [[slab[p * K + k] for k in range(K)]
                for p in range(self.num_potential_pars)]

    def _mu_w_cols(self, pp):
        """Column twin of _mu_and_weights: per-component mu (3 columns
        each) and weights."""
        m = self.num_mu_params
        K = self.num_components
        mus, fake_norms = [], []
        for k in range(K):
            if self.mean_parametrization == "old":
                rx, ry, rz = pp[0][k], pp[1][k], pp[2][k]
                norm = jnp.sqrt(rx * rx + ry * ry + rz * rz)
                mus.append((rx / norm, ry / norm, rz / norm))
                fake_norms.append(_mu_norm_function_old(norm))
            else:
                # mu = (Q0 Q1 Q2) e_z: apply reflections in reverse order
                w = (jnp.zeros_like(pp[0][k]), jnp.zeros_like(pp[0][k]),
                     jnp.ones_like(pp[0][k]))
                for i in reversed(range(3)):
                    v = (pp[3 * i][k], pp[3 * i + 1][k], pp[3 * i + 2][k])
                    nrm = jnp.sqrt(sum(c * c for c in v) + 1e-20)
                    v = tuple(c / nrm for c in v)
                    dot = sum(vc * wc for vc, wc in zip(v, w))
                    w = tuple(wc - 2.0 * vc * dot for vc, wc in zip(v, w))
                mus.append(w)
                fake_norms.append(jax.nn.sigmoid(pp[9][k]))
        lw = [pp[m][k] for k in range(K)]
        mx = lw[0]
        for l in lw[1:]:
            mx = jnp.maximum(mx, l)
        lse = mx + jnp.log(sum(jnp.exp(l - mx) for l in lw))
        ws = [jnp.exp(lw[k] - lse) * fake_norms[k] for k in range(K)]
        return mus, ws

    def _grad_field_cols(self, x3, pp):
        """Column twin of _grad_field: x3 = (x, y, z) columns -> g as 3
        columns."""
        m = self.num_mu_params
        mus, ws = self._mu_w_cols(pp)
        gx = gy = gz = None

        def acc(g, term):
            return term if g is None else g + term

        for k, ((mx_, my_, mz_), w) in enumerate(zip(mus, ws)):
            if self.exp_map_type == "linear":
                scale = w
            else:
                x_mu = x3[0] * mx_ + x3[1] * my_ + x3[2] * mz_
                if self.exp_map_type == "quadratic":
                    scale = w * x_mu
                elif self.exp_map_type == "exponential":
                    beta = jnp.exp(pp[m + 1][k])
                    scale = w * jnp.exp(beta * (x_mu - 1.0))
                else:                                   # splines
                    nb = self.NUM_SPLINE_BASIS
                    uw = [pp[m + 1 + j][k] for j in range(nb)]
                    uh = [pp[m + 1 + nb + j][k] for j in range(nb)]
                    ud = [pp[m + 1 + 2 * nb + j][k] for j in range(nb + 1)]
                    res, _ = rq_spline_cols(x_mu, uw, uh, ud, inverse=False,
                                            left=-1.0, right=1.0,
                                            bottom=-1.0, top=1.0)
                    scale = w * res
            gx = acc(gx, scale * mx_)
            gy = acc(gy, scale * my_)
            gz = acc(gz, scale * mz_)
        return gx, gy, gz

    def _phi_cols(self, x3, pp):
        """Column twin of _phi_single (same dtype-aware guards)."""
        x, y, z = x3
        eps = jnp.finfo(x.dtype).eps
        tiny = jnp.finfo(x.dtype).tiny
        gx, gy, gz = self._grad_field_cols(x3, pp)
        g_norm = jnp.sqrt(jnp.maximum(gx * gx + gy * gy + gz * gz, tiny))
        ux, uy, uz = gx / g_norm, gy / g_norm, gz / g_norm
        edge = jnp.maximum(1e-14, 8.0 * eps)
        cos_a = jnp.clip(ux * x + uy * y + uz * z, -1.0 + edge, 1.0 - edge)
        sin_a = jnp.sqrt(jnp.maximum(1.0 - cos_a ** 2, tiny))
        tx = (ux - x * cos_a) / sin_a
        ty = (uy - y * cos_a) / sin_a
        tz = (uz - z * cos_a) / sin_a
        v_norm = gx * tx + gy * ty + gz * tz
        cv, sv = jnp.cos(v_norm), jnp.sin(v_norm)
        return x * cv + tx * sv, y * cv + ty * sv, z * cv + tz * sv

    def _logdet_cols(self, x3, pp):
        """(phi columns, 0.5*log det(P^T P)) with P = J @ tangent basis;
        directional derivatives via two jvp calls (column twin of
        _logdet_at)."""
        x, y, z = x3
        # tangent basis (column twin of _tangent_basis)
        near_pole = jnp.abs(z) >= 0.9
        rx = jnp.where(near_pole, 1.0, 0.0)
        rz = jnp.where(near_pole, 0.0, 1.0)
        rdx = rx * x + rz * z                      # ref . x  (ref_y = 0)
        t1x, t1y, t1z = rx - x * rdx, -y * rdx, rz - z * rdx
        t1n = jnp.sqrt(t1x ** 2 + t1y ** 2 + t1z ** 2)
        t1x, t1y, t1z = t1x / t1n, t1y / t1n, t1z / t1n
        t2x = y * t1z - z * t1y
        t2y = z * t1x - x * t1z
        t2z = x * t1y - y * t1x

        def f(xc, yc, zc):
            return self._phi_cols((xc, yc, zc), pp)

        phi, a = jax.jvp(f, (x, y, z), (t1x, t1y, t1z))
        _, b = jax.jvp(f, (x, y, z), (t2x, t2y, t2z))
        aa = a[0] ** 2 + a[1] ** 2 + a[2] ** 2
        bb = b[0] ** 2 + b[1] ** 2 + b[2] ** 2
        ab = a[0] * b[0] + a[1] * b[1] + a[2] * b[2]
        return phi, 0.5 * jnp.log(aa * bb - ab ** 2)

    def _analytic_cols(self, slab, cols, log_det):
        pp = self._pot_cols(slab)
        theta, phi_ang = cols
        x, y, z, log_det = manifold.spherical_to_eucl_cols(theta, phi_ang,
                                                           log_det)
        (px, py, pz), ld = self._logdet_cols((x, y, z), pp)
        log_det = log_det + ld
        theta, phi_ang, log_det = manifold.eucl_to_spherical_cols(
            px, py, pz, log_det)
        return (theta, phi_ang), log_det

    def _solver_cols(self, slab, cols, log_det):
        """Sphere-Newton inversion on columns + log-det at the solution
        (column twin of the _solve_inverse branches of _forward/_inverse)."""
        from ..ops.inverse import make_sphere_inverse_cols_fn
        theta, phi_ang = cols
        x, y, z, log_det = manifold.spherical_to_eucl_cols(theta, phi_ang,
                                                           log_det)
        inv = make_sphere_inverse_cols_fn(
            lambda x3, s: self._phi_cols(x3, self._pot_cols(s)),
            max_iter=self.max_num_newton_iter, damping=0.4)
        sx, sy, sz = inv(x, y, z, slab)
        _, ld = self._logdet_cols((sx, sy, sz), self._pot_cols(slab))
        log_det = log_det - ld
        theta, phi_ang, log_det = manifold.eucl_to_spherical_cols(
            sx, sy, sz, log_det)
        return (theta, phi_ang), log_det

    def _forward_cols(self, child_slab, cols, log_det, rot_slab=None):
        if self.natural_direction:
            return self._analytic_cols(child_slab, cols, log_det)
        return self._solver_cols(child_slab, cols, log_det)

    def _inverse_cols(self, child_slab, cols, log_det, rot_slab=None):
        if not self.natural_direction:
            return self._analytic_cols(child_slab, cols, log_det)
        return self._solver_cols(child_slab, cols, log_det)

    def _default_params(self, rng):
        return rng.standard_normal(self.num_potential_pars * self.num_components)

    def _child_param_structure(self):
        return [("potential_pars",
                 self.num_potential_pars * self.num_components)]
