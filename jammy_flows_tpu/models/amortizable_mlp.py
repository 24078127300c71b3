"""AmortizableMLP: an MLP whose entire weight set is a flat parameter vector.

TPU-native reimplementation of the reference amortizable_mlp.py:9-682.
Every parameter (weights, biases, low-rank factors) lives in one packed
vector of length ``num_params``; ``apply(flat_params, x)`` consumes it.
"Permanent" use just means the flat vector comes from the trainable pytree;
amortized use feeds it in per-sample - one code path for both, which is also
what makes `amortize_everything` trivial.

Supports the reference's 5 highway connectivity modes and per-matrix low-rank
U*V factorizations with the "smart" fallback to full matrices when low rank
would not save parameters.  The final bias always sits at the very end of the
packed vector (reference convention, needed for the damped-final-bias init of
pdf.init_params, default.py:1880-1950).
"""
from __future__ import annotations

import math

import numpy as np
import jax
import jax.numpy as jnp


def list_from_str(s):
    if isinstance(s, int):
        return [s]
    if isinstance(s, (list, tuple)):
        return list(s)
    s = str(s).strip()
    if not s:
        return []
    return [int(tok) for tok in s.replace("-", " ").split()]


def _make_block(inputs, outputs, low_rank, add_final_bias, svd_mode):
    """Describe one chain of linear maps; compute packed sizes.

    Mirrors AmortizableMLP._initialize_uv_structure (amortizable_mlp.py:272-375).
    """
    num_u, num_v, num_b, full_flags, used_ranks = [], [], [], [], []
    total = 0
    n = len(inputs)
    for i in range(n):
        max_rank = min(inputs[i], outputs[i])
        lr = low_rank[i]
        if lr > 0:
            used_rank = min(max_rank, lr)
        else:
            used_rank = 0 if svd_mode == "naive" else max_rank
        used_ranks.append(used_rank)
        full_np = inputs[i] * outputs[i]
        use_low_rank = (lr > 0 and used_rank * (inputs[i] + outputs[i]) < full_np) \
            if svd_mode == "smart" else (svd_mode == "naive" and used_rank > 0)
        if use_low_rank:
            num_u.append(used_rank * outputs[i])
            num_v.append(used_rank * inputs[i])
            full_flags.append(False)
            total += num_u[-1] + num_v[-1]
        else:
            num_u.append(full_np)
            num_v.append(0)
            full_flags.append(True)
            total += full_np
        if i == n - 1:
            nb = outputs[i] if add_final_bias else 0
        else:
            nb = outputs[i]
        num_b.append(nb)
        total += nb
    return dict(inputs=list(inputs), outputs=list(outputs), num_u=num_u,
                num_v=num_v, num_b=num_b, full_flags=full_flags,
                used_ranks=used_ranks, num_params=total)


class AmortizableMLP:
    """Static MLP configuration; parameters always arrive packed."""

    def __init__(self, input_dim, hidden_dims, output_dim, highway_mode=0,
                 low_rank_approximations=0, nonlinearity="tanh",
                 svd_mode="smart", precise_mlp_structure=None):
        self.input_dim = input_dim
        self.output_dim = output_dim
        self.highway_mode = highway_mode
        self.nonlinearity = nonlinearity
        hidden = list_from_str(hidden_dims)
        self.hidden_dims = hidden

        if precise_mlp_structure:
            # Custom per-matrix structure (amortizable_mlp.py:56-62): a dict
            # {"mlp_list": [{inputs, outputs, low_rank_approximations,
            #   add_final_bias?, svd_mode?}, ...], "linear_highway": {...}}
            # bypassing the automatic hidden_dims construction.
            assert "mlp_list" in precise_mlp_structure
            if highway_mode > 0:
                assert "linear_highway" in precise_mlp_structure

            def block_from(entry, default_final_bias):
                return _make_block(
                    entry["inputs"], entry["outputs"],
                    list(entry["low_rank_approximations"]),
                    entry.get("add_final_bias", default_final_bias),
                    entry.get("svd_mode", svd_mode))

            self.mlp_list = [
                block_from(e, highway_mode == 0)
                for e in precise_mlp_structure["mlp_list"]]
            self.linear_highway = None
            if "linear_highway" in precise_mlp_structure:
                self.linear_highway = block_from(
                    precise_mlp_structure["linear_highway"], True)
            self.num_params = sum(b["num_params"] for b in self.mlp_list)
            if self.linear_highway is not None:
                self.num_params += self.linear_highway["num_params"]
            return

        if highway_mode == 0:
            num_matrices = len(hidden) + 1
        elif highway_mode == 1:
            num_matrices = len(hidden) + 2
        else:
            num_matrices = 2 * len(hidden) + 1
        assert 0 <= highway_mode <= 4

        if isinstance(low_rank_approximations, int):
            ranks = [low_rank_approximations] * num_matrices
        elif isinstance(low_rank_approximations, str):
            ranks = list_from_str(low_rank_approximations)
        else:
            ranks = list(low_rank_approximations)
        assert len(ranks) == num_matrices

        self.mlp_list = []
        self.linear_highway = None

        if highway_mode < 2:
            ins = [input_dim] + hidden
            outs = hidden + [output_dim]
            if highway_mode == 0:
                self.mlp_list.append(_make_block(ins, outs, ranks, True, svd_mode))
            else:
                if hidden:
                    self.mlp_list.append(
                        _make_block(ins, outs, ranks[:-1], False, svd_mode))
                self.linear_highway = _make_block(
                    [input_dim], [output_dim], ranks[-1:], True, svd_mode)
        else:
            mlp_start = {2: input_dim, 3: output_dim,
                         4: input_dim + output_dim}[highway_mode]
            for i, h in enumerate(hidden):
                ins = [input_dim if i == 0 else mlp_start, h]
                outs = [h, output_dim]
                self.mlp_list.append(
                    _make_block(ins, outs, ranks[2 * i:2 * i + 2], False, svd_mode))
            self.linear_highway = _make_block(
                [input_dim], [output_dim], ranks[-1:], True, svd_mode)

        self.num_params = sum(b["num_params"] for b in self.mlp_list)
        if self.linear_highway is not None:
            self.num_params += self.linear_highway["num_params"]

    # -- application ------------------------------------------------------
    def _activation(self, x):
        if self.nonlinearity == "tanh":
            return jnp.tanh(x)
        return getattr(jax.nn, self.nonlinearity)(x)

    def _apply_block(self, block, x, params):
        """Run one chain of (optionally low-rank) linear maps."""
        idx = 0
        prev = x
        n = len(block["inputs"])
        for i in range(n):
            nu, nv, nb = block["num_u"][i], block["num_v"][i], block["num_b"][i]
            u = params[:, idx:idx + nu]; idx += nu
            v = params[:, idx:idx + nv]; idx += nv
            b = params[:, idx:idx + nb]; idx += nb
            # broadcast (Bp=1) weights use a plain 2-D matmul: the batched
            # einsum would make XLA materialize the (B, out, in) broadcast -
            # measured 134 GB of HBM traffic per 1M samples on the flagship
            def matvec(w_flat, rows, cols, vec):
                if w_flat.shape[0] == 1:
                    return jnp.matmul(vec, w_flat[0].reshape(rows, cols).T,
                                      precision=jax.lax.Precision.HIGHEST)
                w = w_flat.reshape(-1, rows, cols)
                return jnp.einsum("...ij,...j->...i", w, vec,
                                  precision=jax.lax.Precision.HIGHEST)

            if block["full_flags"][i]:
                out = matvec(u, block["outputs"][i], block["inputs"][i], prev)
            else:
                r = block["used_ranks"][i]
                out = matvec(u, block["outputs"][i], r,
                             matvec(v, r, block["inputs"][i], prev))
            if nb > 0:
                out = out + b
            prev = out if i == n - 1 else self._activation(out)
        return prev, params[:, idx:]

    def apply(self, flat_params, x):
        """flat_params: (Bp, num_params) with Bp in {1, B}; x: (B, D)."""
        assert flat_params.shape[-1] == self.num_params, \
            (flat_params.shape, self.num_params)
        if flat_params.ndim == 1:
            flat_params = flat_params[None, :]
        params = flat_params
        prev = 0.0
        if self.linear_highway is not None:
            nlh = self.linear_highway["num_params"]
            lin_params = params[:, -nlh:]
            params = params[:, :-nlh]
            prev, rest = self._apply_block(self.linear_highway, x, lin_params)
            assert rest.shape[1] == 0

        if self.highway_mode < 2:
            if self.mlp_list:
                nonlinear, params = self._apply_block(self.mlp_list[0], x, params)
                prev = prev + nonlinear
        else:
            if self.mlp_list:
                nonlinear, params = self._apply_block(self.mlp_list[0], x, params)
                prev = prev + nonlinear
                for block in self.mlp_list[1:]:
                    if self.highway_mode == 2:
                        nxt = x
                    elif self.highway_mode == 3:
                        nxt = prev
                    else:
                        nxt = jnp.concatenate([x, prev], axis=1)
                    nonlinear, params = self._apply_block(block, nxt, params)
                    prev = prev + nonlinear
        return prev

    __call__ = apply

    # -- penultimate split (for kernel-fused final matmuls) ----------------
    def supports_penultimate(self, flat_params):
        """True when apply() factorizes exactly as
        ``final_w @ hidden(x) + final_b`` with broadcast (Bp=1) weights and a
        full-rank final matrix: plain highway_mode-0 single-block MLPs.

        Used by the lazy-parameter path: the Pallas GF kernels then run the
        final (hidden -> params) matmul in VMEM so the (B, P) parameter slab
        never touches HBM (models/pdf.py:_predict_extra_params)."""
        if self.highway_mode != 0 or self.linear_highway is not None:
            return False
        if len(self.mlp_list) != 1:
            return False
        block = self.mlp_list[0]
        if not block["full_flags"][-1] or block["num_b"][-1] == 0:
            return False
        fp = flat_params
        return fp.ndim == 1 or fp.shape[0] == 1

    def supports_full_fusion(self, flat_params):
        """True when the WHOLE MLP factorizes as
        ``(tanh(x @ w1.T + b1)) @ w_final.T + b_final`` — a plain
        one-hidden-layer full-rank tanh MLP.  The whole-block Pallas kernels
        then fuse BOTH matmuls in VMEM and read only the narrow conditional
        summary from HBM instead of the (B, H) hidden activations
        (ops/pallas_gf_block.py "lazy2" interface)."""
        if not self.supports_penultimate(flat_params):
            return False
        block = self.mlp_list[0]
        return (len(block["inputs"]) == 2 and block["full_flags"][0]
                and block["num_b"][0] > 0 and self.nonlinearity == "tanh")

    def first_layer_weights(self, flat_params):
        """(w1 (H, In), b1 (H,)) with hidden = tanh(x @ w1.T + b1).

        Caller must have checked supports_full_fusion()."""
        if flat_params.ndim == 1:
            flat_params = flat_params[None, :]
        block = self.mlp_list[0]
        nu0, nb0 = block["num_u"][0], block["num_b"][0]
        w1 = flat_params[0, :nu0].reshape(block["outputs"][0],
                                          block["inputs"][0])
        b1 = flat_params[0, nu0:nu0 + nb0]
        return w1, b1

    def apply_penultimate(self, flat_params, x):
        """Return (hidden, w_final (P, H), b_final (P,)) such that
        ``apply(flat_params, x) == hidden @ w_final.T + b_final``.

        Caller must have checked supports_penultimate()."""
        if flat_params.ndim == 1:
            flat_params = flat_params[None, :]
        assert flat_params.shape == (1, self.num_params)
        block = self.mlp_list[0]
        n = len(block["inputs"])
        nu, nb = block["num_u"][-1], block["num_b"][-1]
        n_final = nu + nb
        head = flat_params[:, :self.num_params - n_final]
        w_flat = flat_params[0, self.num_params - n_final:
                             self.num_params - nb]
        b = flat_params[0, self.num_params - nb:]
        w = w_flat.reshape(block["outputs"][-1], block["inputs"][-1])
        if n == 1:
            hidden = x
        else:
            sub = dict(block, inputs=block["inputs"][:-1],
                       outputs=block["outputs"][:-1],
                       num_u=block["num_u"][:-1], num_v=block["num_v"][:-1],
                       num_b=block["num_b"][:-1],
                       full_flags=block["full_flags"][:-1],
                       used_ranks=block["used_ranks"][:-1])
            out, rest = self._apply_block(sub, x, head)
            assert rest.shape[1] == 0
            hidden = self._activation(out)
        return hidden, w, b

    # -- initialization ---------------------------------------------------
    def default_init(self, rng=None, fix_final_bias=None,
                     prev_damping_factor=1000.0):
        """Packed init vector: kaiming-uniform full matrices, randn low-rank
        factors, uniform biases; optionally pin the final bias and damp all
        upstream parameters (amortizable_mlp.py:377-462)."""
        rng = rng or np.random.default_rng(0)
        init = rng.standard_normal(self.num_params)

        def init_block(block, offset):
            idx = offset
            for i in range(len(block["inputs"])):
                nu, nv, nb = block["num_u"][i], block["num_v"][i], block["num_b"][i]
                if block["full_flags"][i]:
                    fan_in = block["inputs"][i]
                    gain = math.sqrt(2.0 / (1.0 + 5.0))  # leaky_relu, a=sqrt(5)
                    bound = math.sqrt(3.0) * gain / math.sqrt(fan_in)
                    init[idx:idx + nu] = rng.uniform(-bound, bound, nu)
                    if nb > 0:
                        bb = 1.0 / math.sqrt(fan_in)
                        init[idx + nu + nv:idx + nu + nv + nb] = rng.uniform(
                            -bb, bb, nb)
                idx += nu + nv + nb
            return idx

        offset = 0
        for block in self.mlp_list:
            offset = init_block(block, offset)
        if self.linear_highway is not None:
            init_block(self.linear_highway, offset)

        if fix_final_bias is not None:
            init = init / prev_damping_factor
            relevant = self.linear_highway if self.linear_highway is not None \
                else self.mlp_list[-1]
            nb_final = relevant["num_b"][-1]
            assert nb_final == len(fix_final_bias), (nb_final, len(fix_final_bias))
            init[-nb_final:] = np.asarray(fix_final_bias)
        return init
