"""Whole-block Gaussianization-flow kernels: an entire `gggg` sub-manifold
block in ONE Pallas launch per direction.

Motivation (BASELINE.md, measured 2026-08-19 on v5e): the per-layer lazy
kernels already keep the (K, D, B) mixture math in VMEM, but an amortized
4-layer gggg block still costs ~13.6 ms per 262k-row training step vs
1.4 ms for the identical permanent block — the difference is glue: the
(B, H) hidden activations are re-read from HBM by every per-layer kernel
(4 forward + 4 backward launches), the householder rotations and offsets
run as separate XLA ops over tile-padded (B, 4) arrays, and each layer
boundary costs an HBM round trip of x.

These kernels run the WHOLE block in VMEM:

  density direction (target -> base, log_prob):
      for layer in reversed(layers):
          x -= offset;  x = R_l^T x;  (x, ld_l) = mixture_icdf_pass(x)
      outputs (x, sum_l ld_l)
  sampling direction (base -> target):
      for layer in layers:
          x = newton_solve(x);  ld += ld_l(x);  x = R_l x;  x += offset
      outputs (x, sum_l ld_l)

with the amortization MLP's final matmul (lazy-parameter interface,
ops/lazy_params.py) computed ONCE in-kernel for all layers, and the
householder reflections / offsets fused on the sublane-folded layout.
Backward passes run in-kernel: trace-time jax.vjp through the whole chain
for the density direction, and a per-layer implicit-function chain for the
sampling direction (intermediates reconstructed analytically from the
output — each reconstruction is one cheap mixture pass, no re-solving).

Parameter packing per layer matches layers/euclidean.GaussianizationFlow:
[offset (d, if model_offset)] + [rot vs (it*d)] + [means (k*d)] +
[log_width raw (k*d)] + [log_norm raw (k*d, if fit_normalization)], layers
concatenated front-to-back — i.e. the rows of the amortization MLP's final
weight matrix in their natural order, so the lazy interface passes the
whole (P_block, H) weight as-is.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_gf import (
    _fold_factor, _fold_rows, _unfold_rows, _fold_param, _fold_triple,
    _mixture_value_deriv, _mixture_value_deriv_solve, _prep_raw_params,
    _solve, pallas_available,
    _pallas_call, MAX_KERNEL_KD, MAX_KERNEL_H,
)

BLK = 1024
# the backward kernels differentiate the whole multi-layer chain in-kernel:
# the vjp keeps per-layer mixture residuals live, so the block width must
# shrink to fit scoped VMEM (1024 lanes measured 18.9M > the 16M limit on
# a 4-layer lazy block).  Measured on the amortized e4/gggg training step:
# 512 -> 5.7 ms bwd, 768 -> 6.9, 256 -> 7.0; fwd 1024 -> 2.5, 2048 -> 2.6.
BLK_BWD = 512


# ---------------------------------------------------------------------------
# static layout bookkeeping
# ---------------------------------------------------------------------------

def layer_meta(has_offset, rot_it, has_ln, ift):
    return (bool(has_offset), int(rot_it), bool(has_ln), str(ift))


def _layer_rows(k, d, lm):
    has_off, rot_it, has_ln = lm[:3]
    return (d if has_off else 0) + rot_it * d + (2 + has_ln) * k * d


def block_rows(k, d, layers):
    return sum(_layer_rows(k, d, lm) for lm in layers)


def _slice_layer(rows2d, k, d, lm):
    """Split one layer's (rows, C) slab rows into (off, rot, means, lw, ln),
    each still row-major (groups stacked along axis 0)."""
    has_off, rot_it, has_ln = lm[:3]
    kd = k * d
    i = 0

    def take(n):
        nonlocal i
        out = rows2d[i:i + n]
        i += n
        return out

    off = take(d) if has_off else None
    rot = take(rot_it * d) if rot_it else None
    means = take(kd)
    lw = take(kd)
    ln = take(kd) if has_ln else None
    return off, rot, means, lw, ln


# ---------------------------------------------------------------------------
# folded-layout per-layer ops
# ---------------------------------------------------------------------------

def _fold_vec_rows(v, f):
    """(R, 1|f*C) -> (f*R, 1|C), chunk-major rows (matches _fold_rows)."""
    if f == 1:
        return v
    if v.shape[-1] == 1:
        return jnp.concatenate([v] * f, axis=0)
    return _fold_rows(v, f)


def _hh_rotate_folded(x_f, rot_f, it, d, f, inverse):
    """Householder product on the sublane-folded layout.

    x_f: (f*d, C); rot_f: (f*it*d, 1|C) chunk-major.  Matches
    ops/rotations.householder_apply: forward applies reflections in
    REVERSED registration order, inverse in ascending order.
    """
    c = x_f.shape[-1]
    xg = x_f.reshape(f, d, c)
    rg = rot_f.reshape(f, it, d, rot_f.shape[-1])
    order = range(it) if inverse else reversed(range(it))
    for i in order:
        v = rg[:, i]                                     # (f, d, 1|C)
        v = v / jnp.sqrt(jnp.sum(v * v, axis=1, keepdims=True) + 1e-20)
        xg = xg - 2.0 * v * jnp.sum(v * xg, axis=1, keepdims=True)
    return xg.reshape(f * d, c)


def _mixture_from_rows(means, lw, ln, k, d, f, prep, broadcast):
    """Row-major (k*d, 1|C) group slabs -> folded (k, f*d, 1|C) prepared
    mixture triple (regulators + weight normalization in VMEM)."""
    cols = means.shape[-1]
    m3 = means.reshape(k, d, cols)
    lw3 = lw.reshape(k, d, cols)
    slabs = (m3, lw3) if ln is None else (m3, lw3, ln.reshape(k, d, cols))
    m3, iw3, lnw3 = _prep_raw_params(slabs, prep)[:3]
    return _fold_triple((m3, iw3, lnw3), f)


# ---------------------------------------------------------------------------
# slab construction (lazy matmul or broadcast vector), fold-chunked
# ---------------------------------------------------------------------------

def _block_slabs_lazy(hidden, w, b, k, d, layers, f):
    """In-kernel final matmul for the WHOLE block, fold-chunked so mixture
    slabs are born in the (k, f*d, C) folded layout and offset/rot rows in
    chunk-major (f*R, C) layout.

    hidden: (H, BLK); w: (P, H); b: (P, 1).  Returns per-layer tuples
    (off (f*d, C)|None, rot (f*it*d, C)|None, means/iw/lnw folded triple).
    """
    c = hidden.shape[-1] // f
    per_chunk = []
    for i in range(f):
        p = jnp.dot(w, hidden[:, i * c:(i + 1) * c],
                    preferred_element_type=hidden.dtype) + b       # (P, C)
        row = 0
        lays = []
        for lm in layers:
            n = _layer_rows(k, d, lm)
            lays.append(_slice_layer(p[row:row + n], k, d, lm))
            row += n
        per_chunk.append(lays)

    out = []
    for li, lm in enumerate(layers):
        def cat(gi):
            parts = [per_chunk[i][li][gi] for i in range(f)]
            if parts[0] is None:
                return None
            return parts[0] if f == 1 else jnp.concatenate(parts, axis=0)

        off, rot = cat(0), cat(1)
        # mixture groups: per-chunk (k*d, C) -> (k, d, C), concat along d
        def cat_mix(gi):
            parts = [per_chunk[i][li][gi] for i in range(f)]
            if parts[0] is None:
                return None
            parts = [pp.reshape(k, d, c) for pp in parts]
            return parts[0] if f == 1 else jnp.concatenate(parts, axis=1)

        m3, lw3, ln3 = cat_mix(2), cat_mix(3), cat_mix(4)
        out.append((off, rot, (m3, lw3, ln3)))
    return out


def _block_slabs_vec(pvec, k, d, layers, f):
    """Broadcast (P, 1) parameter vector -> per-layer folded slabs."""
    row = 0
    out = []
    for lm in layers:
        n = _layer_rows(k, d, lm)
        off, rot, means, lw, ln = _slice_layer(pvec[row:row + n], k, d, lm)
        row += n
        off_f = _fold_vec_rows(off, f) if off is not None else None
        rot_f = _fold_vec_rows(rot, f) if rot is not None else None
        m3 = _fold_param(means.reshape(k, d, 1), f)
        lw3 = _fold_param(lw.reshape(k, d, 1), f)
        ln3 = _fold_param(ln.reshape(k, d, 1), f) if ln is not None else None
        out.append((off_f, rot_f, (m3, lw3, ln3)))
    return out


def _prep_mix(slab, prep):
    """Apply regulators to a folded raw mixture triple."""
    m3, lw3, ln3 = slab
    slabs = (m3, lw3) if ln3 is None else (m3, lw3, ln3)
    return _prep_raw_params(slabs, prep)[:3]


def _make_slabs(param_arrays, k, d, layers, f, lazy):
    """Dispatch the per-layer slab construction.

    lazy=False: broadcast (P, 1) vector.  lazy=True: [hidden (H, BLK),
    w (P, H), b (P, 1)].  lazy="lazy2" (FULL MLP fusion): [summary
    (In, BLK), w1 (H, In), b1 (H, 1), w (P, H), b (P, 1)] — the whole
    one-hidden-layer tanh MLP runs in VMEM, so only the narrow conditional
    summary is read from HBM instead of the (B, H) hidden activations.
    """
    if lazy == "lazy2":
        summary, w1, b1, w, b = param_arrays
        hidden = jnp.tanh(
            jnp.dot(w1, summary, preferred_element_type=summary.dtype) + b1)
        return _block_slabs_lazy(hidden, w, b, k, d, layers, f)
    if lazy:
        return _block_slabs_lazy(*param_arrays, k, d, layers, f)
    return _block_slabs_vec(param_arrays[0], k, d, layers, f)


# ---------------------------------------------------------------------------
# pure block functions (differentiation targets; all VMEM math)
# ---------------------------------------------------------------------------

def _block_density_local(x, param_arrays, prep, meta, lazy):
    """(x (d, BLK), params) -> (base (d, BLK), ld_sum (d, BLK)).

    Density direction: layers processed in REVERSED packing order."""
    k, d, layers = meta
    f = _fold_factor(d, x.shape[-1])
    xf = _fold_rows(x, f)
    slabs = _make_slabs(param_arrays, k, d, layers, f, lazy)
    ld_sum = jnp.zeros_like(xf)
    for li in reversed(range(len(layers))):
        off, rot, mix = slabs[li]
        _, rot_it, _, ift_l = layers[li]
        if off is not None:
            xf = xf - off
        if rot is not None:
            xf = _hh_rotate_folded(xf, rot, rot_it, d, f, inverse=True)
        m3, iw3, lnw3 = _prep_mix(mix, prep)
        xf, ld = _mixture_value_deriv(xf, (m3, iw3, lnw3, None, None), "log", ift_l)
        ld_sum = ld_sum + ld
    return _unfold_rows(xf, f), _unfold_rows(ld_sum, f)


def _block_sample_local(z, param_arrays, prep, meta, lazy):
    """(z (d, BLK), params) -> (target (d, BLK), ld_sum (d, BLK)).

    Sampling direction: per-layer bracketed Newton solves, forward order.
    ld_sum is sum_l log|d gauss_l/dx|(x_l) — the caller SUBTRACTS it."""
    k, d, layers = meta
    f = _fold_factor(d, z.shape[-1])
    xf = _fold_rows(z, f)
    slabs = _make_slabs(param_arrays, k, d, layers, f, lazy)
    ld_sum = jnp.zeros_like(xf)
    for li in range(len(layers)):
        off, rot, mix = slabs[li]
        _, rot_it, _, ift_l = layers[li]
        m3, iw3, lnw3 = _prep_mix(mix, prep)
        xf = _solve(xf, (m3, iw3, lnw3, None, None), ift_l)
        _, ld = _mixture_value_deriv_solve(xf, (m3, iw3, lnw3, None, None), "log", ift_l)
        ld_sum = ld_sum + ld
        if rot is not None:
            xf = _hh_rotate_folded(xf, rot, rot_it, d, f, inverse=False)
        if off is not None:
            xf = xf + off
    return _unfold_rows(xf, f), _unfold_rows(ld_sum, f)


# ---------------------------------------------------------------------------
# kernels
# ---------------------------------------------------------------------------

def _make_block_kernel(direction, prep, meta, lazy):
    local = _block_density_local if direction == "density" \
        else _block_sample_local

    def kernel(x_ref, *refs):
        param_refs, val_ref, ld_ref = refs[:-2], refs[-2], refs[-1]
        val, ld = local(x_ref[:], [r[:] for r in param_refs], prep,
                        meta, lazy)
        val_ref[:] = val
        ld_ref[:] = ld
    return kernel


def _write_grads(grefs, grads, accum):
    for gref, g, acc in zip(grefs, grads, accum):
        if acc:
            @pl.when(pl.program_id(0) == 0)
            def _(gref=gref):
                gref[:] = jnp.zeros_like(gref)
            gref[:] += g
        else:
            gref[:] = g


def _make_block_density_bwd(prep, meta, lazy, n_params, accum):
    def kernel(*refs):
        x_ref = refs[0]
        param_refs = refs[1:1 + n_params]
        gval_ref, gld_ref = refs[1 + n_params], refs[2 + n_params]
        gx_ref = refs[3 + n_params]
        gparam_refs = refs[4 + n_params:]
        loaded = [r[:] for r in param_refs]
        _, vjp = jax.vjp(
            lambda xx, *ps: _block_density_local(xx, list(ps), prep,
                                                 meta, lazy),
            x_ref[:], *loaded)
        grads = vjp((gval_ref[:], gld_ref[:]))
        gx_ref[:] = grads[0]
        _write_grads(gparam_refs, grads[1:], accum)
    return kernel


def _make_block_sample_bwd(prep, meta, lazy, n_params, accum):
    """Backward of the multi-layer sampling pass.

    Residual = the block OUTPUT y.  Intermediates are reconstructed
    analytically (one mixture pass per layer, no re-solving), then the
    cotangents chain through per-layer implicit-function vjps; the slab
    construction (matmul + slicing + regulators live inside the per-layer
    closures) receives its cotangents through the same jax.vjp calls.
    """
    k, d, layers = meta

    def kernel(*refs):
        y_ref = refs[0]
        param_refs = refs[1:1 + n_params]
        gy_ref, gld_ref = refs[1 + n_params], refs[2 + n_params]
        gz_ref = refs[3 + n_params]
        gparam_refs = refs[4 + n_params:]

        f = _fold_factor(d, y_ref.shape[-1])
        loaded = [r[:] for r in param_refs]

        # slab construction under vjp so parameter cotangents flow through
        # the in-kernel matmul exactly once
        def build(*ps):
            return _make_slabs(list(ps), k, d, layers, f, lazy)

        slabs, vjp_slabs = jax.vjp(build, *loaded)

        # reconstruct per-layer solve outputs s_l from the block output:
        #   out_n = y;  s_l = R_l^T (out_l - off_l);  out_{l-1} = gauss_l(s_l)
        yf = _fold_rows(y_ref[:], f)
        s_list = [None] * len(layers)
        out = yf
        for li in reversed(range(len(layers))):
            off, rot, mix = slabs[li]
            _, rot_it, _, ift_l = layers[li]
            s = out
            if off is not None:
                s = s - off
            if rot is not None:
                s = _hh_rotate_folded(s, rot, rot_it, d, f, inverse=True)
            s_list[li] = s
            if li > 0:
                m3, iw3, lnw3 = _prep_mix(mix, prep)
                out, _ = _mixture_value_deriv(s, (m3, iw3, lnw3, None, None), None, ift_l)

        gld = _fold_rows(gld_ref[:], f)
        g_out = _fold_rows(gy_ref[:], f)
        slab_cts = [jax.tree.map(jnp.zeros_like, sl) for sl in slabs]

        def acc(ct, new):
            return jax.tree.map(
                lambda a, b: a if b is None else a + b, ct, new,
                is_leaf=lambda v: v is None)

        for li in reversed(range(len(layers))):
            s = s_list[li]
            _, rot_it, _, ift_l = layers[li]

            # out-ops: y_l = rotate(s) + off — vjp for (slab, s)
            def out_ops(sl, ss, rot_it=rot_it):
                off, rot, _ = sl
                yy = ss
                if rot is not None:
                    yy = _hh_rotate_folded(yy, rot, rot_it, d, f,
                                           inverse=False)
                if off is not None:
                    yy = yy + off
                return yy

            _, vjp_out = jax.vjp(out_ops, slabs[li], s)
            ct_sl, gs = vjp_out(g_out)
            slab_cts[li] = acc(slab_cts[li], ct_sl)

            # implicit-function step through the solve + its ld output:
            # t = gauss(s; slab), ld = L(s; slab)
            def gauss_ld(sl, ss, ift_l=ift_l):
                m3, iw3, lnw3 = _prep_mix(sl[2], prep)
                return _mixture_value_deriv(ss, (m3, iw3, lnw3, None, None), "log", ift_l)

            _, (fp, lx) = jax.jvp(
                lambda ss: gauss_ld(slabs[li], ss), (s,),
                (jnp.ones_like(s),))
            c = (gs + gld * lx) / fp
            _, vjp_g = jax.vjp(lambda sl: gauss_ld(sl, s), slabs[li])
            (ct_sl2,) = vjp_g((-c, gld))
            slab_cts[li] = acc(slab_cts[li], ct_sl2)
            g_out = c                      # cotangent of layer li's input

        gz_ref[:] = _unfold_rows(g_out, f)
        grads = vjp_slabs(slab_cts)
        _write_grads(gparam_refs, grads, accum)
    return kernel


def _make_block_density_fused(prep, meta, lazy, n_params, accum, wv, wl,
                              b_valid):
    """ONE launch for the NLL training objective: the density chain forward
    AND its vjp with ANALYTIC cotangents (gval = wv*val, gld = wl).

    Valid because in the density direction the autoregressive conditioning
    consumes raw data, so a block's outputs feed ONLY the standard-normal
    base logprob and the log-det sum: dL/dval = val/B and dL/dld = -1/B are
    known before the loss value exists.  Skips the separate forward kernel
    launch of the custom_vjp path (measured 2.9 ms of the 8.4 ms e4/gggg
    conditional step at 262k).  Padded lanes (batch rounded up to BLK_BWD)
    are masked out of the cotangents so accumulated broadcast-parameter
    grads stay exact.
    """
    def kernel(*refs):
        x_ref = refs[0]
        param_refs = refs[1:1 + n_params]
        val_ref = refs[1 + n_params]
        ld_ref = refs[2 + n_params]
        gx_ref = refs[3 + n_params]
        gparam_refs = refs[4 + n_params:]
        loaded = [r[:] for r in param_refs]
        (val, ld), vjp = jax.vjp(
            lambda xx, *ps: _block_density_local(xx, list(ps), prep,
                                                 meta, lazy),
            x_ref[:], *loaded)
        val_ref[:] = val
        ld_ref[:] = ld
        lane = jax.lax.broadcasted_iota(jnp.int32, val.shape, 1)
        valid = (pl.program_id(0) * val.shape[1] + lane) < b_valid
        gval = jnp.where(valid, wv * val, 0.0)
        gld = jnp.where(valid, jnp.full_like(ld, wl), 0.0)
        grads = vjp((gval, gld))
        gx_ref[:] = grads[0]
        _write_grads(gparam_refs, grads[1:], accum)
    return kernel


# ---------------------------------------------------------------------------
# call plumbing
# ---------------------------------------------------------------------------

def _block_specs(params, blk, lazy):
    if lazy:
        specs = [pl.BlockSpec((params[0].shape[0], blk), lambda i: (0, i),
                              memory_space=pltpu.VMEM)]
        accum = [False]
        for q in params[1:]:
            specs.append(pl.BlockSpec(q.shape, lambda i: (0, 0),
                                      memory_space=pltpu.VMEM))
            accum.append(True)
        return specs, accum
    return [pl.BlockSpec(params[0].shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM)], [True]


@functools.partial(jax.jit, static_argnames=("prep", "meta", "lazy",
                                             "direction"))
def _block_call(x_t, params, prep, meta, lazy, direction):
    d, b = x_t.shape
    grid = (b // BLK,)
    io = pl.BlockSpec((d, BLK), lambda i: (0, i), memory_space=pltpu.VMEM)
    p_specs, _ = _block_specs(params, BLK, lazy)
    out = jax.ShapeDtypeStruct((d, b), x_t.dtype)
    return _pallas_call(
        _make_block_kernel(direction, prep, meta, lazy),
        out_shape=[out, out], grid=grid,
        in_specs=[io] + p_specs, out_specs=[io, io],
    )(x_t, *params)


@functools.partial(jax.jit, static_argnames=("prep", "meta", "lazy",
                                             "direction"))
def _block_bwd_call(x_t, params, g1_t, g2_t, prep, meta, lazy,
                    direction):
    d, b = x_t.shape
    grid = (b // BLK_BWD,)
    io = pl.BlockSpec((d, BLK_BWD), lambda i: (0, i),
                      memory_space=pltpu.VMEM)
    p_specs, accum = _block_specs(params, BLK_BWD, lazy)
    if lazy:
        gshapes = [jax.ShapeDtypeStruct((params[0].shape[0], b),
                                        params[0].dtype)] + [
            jax.ShapeDtypeStruct(q.shape, q.dtype) for q in params[1:]]
    else:
        gshapes = [jax.ShapeDtypeStruct(params[0].shape, params[0].dtype)]
    body = (_make_block_density_bwd if direction == "density"
            else _make_block_sample_bwd)(prep, meta, lazy, len(params),
                                         tuple(accum))
    return _pallas_call(
        body, out_shape=[jax.ShapeDtypeStruct((d, b), x_t.dtype)] + gshapes,
        grid=grid, in_specs=[io] + p_specs + [io, io],
        out_specs=[io] + p_specs,
    )(x_t, *params, g1_t, g2_t)


@functools.partial(jax.jit, static_argnames=("prep", "meta", "lazy", "wv",
                                             "wl", "b_valid"))
def _block_fused_call(x_t, params, prep, meta, lazy, wv, wl, b_valid):
    d, b = x_t.shape
    grid = (b // BLK_BWD,)
    io = pl.BlockSpec((d, BLK_BWD), lambda i: (0, i),
                      memory_space=pltpu.VMEM)
    p_specs, accum = _block_specs(params, BLK_BWD, lazy)
    if lazy:
        gshapes = [jax.ShapeDtypeStruct((params[0].shape[0], b),
                                        params[0].dtype)] + [
            jax.ShapeDtypeStruct(q.shape, q.dtype) for q in params[1:]]
    else:
        gshapes = [jax.ShapeDtypeStruct(params[0].shape, params[0].dtype)]
    out = jax.ShapeDtypeStruct((d, b), x_t.dtype)
    return _pallas_call(
        _make_block_density_fused(prep, meta, lazy, len(params),
                                  tuple(accum), wv, wl, b_valid),
        out_shape=[out, out, out] + gshapes,
        grid=grid, in_specs=[io] + p_specs,
        out_specs=[io, io, io] + p_specs,
    )(x_t, *params)


def _run_block_fused(x, params, prep, meta, lazy, wv, wl):
    b, d = x.shape
    pad = (-b) % BLK_BWD
    xt = x.T
    if pad:
        xt = jnp.pad(xt, ((0, 0), (0, pad)))
        if lazy:
            params = (jnp.pad(params[0], ((0, 0), (0, pad))),) + \
                tuple(params[1:])
    outs = _block_fused_call(xt, tuple(params), prep, meta, lazy,
                             float(wv), float(wl), b)
    val = outs[0][:, :b].T
    ld = outs[1][:, :b].T
    gx = outs[2][:, :b].T
    if lazy:
        return val, ld, gx, (outs[3][:, :b],) + tuple(outs[4:])
    return val, ld, gx, (outs[3],)


def gf_block_nll_lazy2(x, summary, w1, b1, w, b, prep, meta, wv, wl):
    """Fused NLL value+grad, full-MLP-fusion interface.  Returns
    (base (B, d), ld_rows (B, d), gx (B, d),
     (gsummary (B, In), gw1, gb1, gw, gb)) with the parameter grads already
    weighted by the analytic NLL cotangents gval = wv*base, gld = wl."""
    val, ld, gx, gp = _run_block_fused(
        x, (summary.T, w1, b1[:, None], w, b), prep, meta, "lazy2", wv, wl)
    return val, ld, gx, (gp[0].T, gp[1], gp[2][:, 0], gp[3], gp[4])


def gf_block_nll_perm(x, pvec, prep, meta, wv, wl):
    """Fused NLL value+grad, permanent-parameter interface.  Returns
    (base, ld_rows, gx, (gpvec (P,),))."""
    val, ld, gx, gp = _run_block_fused(x, (pvec[:, None],), prep, meta,
                                       False, wv, wl)
    return val, ld, gx, (gp[0][:, 0],)


def _pad_block(x, params, lazy):
    b, d = x.shape
    pad = (-b) % BLK
    xt = x.T
    if pad:
        xt = jnp.pad(xt, ((0, 0), (0, pad)))
        if lazy:
            params = (jnp.pad(params[0], ((0, 0), (0, pad))),) + \
                tuple(params[1:])
    return xt, params, b


def _run_block(x, params, prep, meta, lazy, direction):
    xt, params, b = _pad_block(x, params, lazy)
    val, ld = _block_call(xt, tuple(params), prep, meta, lazy,
                          direction)
    return val[:, :b].T, ld[:, :b].T


def _run_block_bwd(x_res, params, g1, g2, prep, meta, lazy, direction):
    b = x_res.shape[0]
    pad = (-b) % BLK_BWD
    xt, g1t, g2t = x_res.T, g1.T, g2.T
    if pad:
        xt = jnp.pad(xt, ((0, 0), (0, pad)))
        g1t = jnp.pad(g1t, ((0, 0), (0, pad)))
        g2t = jnp.pad(g2t, ((0, 0), (0, pad)))
        if lazy:
            params = (jnp.pad(params[0], ((0, 0), (0, pad))),) + \
                tuple(params[1:])
    outs = _block_bwd_call(xt, tuple(params), g1t, g2t, prep, meta,
                           lazy, direction)
    gx = outs[0][:, :b].T
    if lazy:
        return gx, (outs[1][:, :b],) + tuple(outs[2:])
    return gx, (outs[1],)


# ---------------------------------------------------------------------------
# public custom-vjp entry points
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def gf_block_density_lazy(x, hidden, w, b, prep, meta):
    """x (B, d), hidden (B, H), w (P, H), b (P, 1) -> (base, ld_sum), both
    (B, d).  Caller ADDS sum(ld_sum, -1) to its log-det."""
    return _run_block(x, (hidden.T, w, b), prep, meta, True, "density")


def _bdl_fwd(x, hidden, w, b, prep, meta):
    out = gf_block_density_lazy(x, hidden, w, b, prep, meta)
    return out, (x, hidden, w, b)


def _bdl_bwd(prep, meta, res, cts):
    x, hidden, w, b = res
    gx, gp = _run_block_bwd(x, (hidden.T, w, b), cts[0], cts[1], prep,
                            meta, True, "density")
    return gx, gp[0].T, gp[1], gp[2]


gf_block_density_lazy.defvjp(_bdl_fwd, _bdl_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def gf_block_sample_lazy(z, hidden, w, b, prep, meta):
    """z (B, d) base draws -> (target, ld_sum), both (B, d).  Caller
    SUBTRACTS sum(ld_sum, -1) from its log-det."""
    return _run_block(z, (hidden.T, w, b), prep, meta, True, "sample")


def _bsl_fwd(z, hidden, w, b, prep, meta):
    out = gf_block_sample_lazy(z, hidden, w, b, prep, meta)
    return out, (out[0], hidden, w, b)


def _bsl_bwd(prep, meta, res, cts):
    y, hidden, w, b = res
    gz, gp = _run_block_bwd(y, (hidden.T, w, b), cts[0], cts[1], prep,
                            meta, True, "sample")
    return gz, gp[0].T, gp[1], gp[2]


gf_block_sample_lazy.defvjp(_bsl_fwd, _bsl_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def gf_block_density_perm(x, pvec, prep, meta):
    """Permanent-parameter block: pvec (P,) broadcast slab."""
    return _run_block(x, (pvec[:, None],), prep, meta, False, "density")


def _bdp_fwd(x, pvec, prep, meta):
    return gf_block_density_perm(x, pvec, prep, meta), (x, pvec)


def _bdp_bwd(prep, meta, res, cts):
    x, pvec = res
    gx, gp = _run_block_bwd(x, (pvec[:, None],), cts[0], cts[1], prep,
                            meta, False, "density")
    return gx, gp[0][:, 0]


gf_block_density_perm.defvjp(_bdp_fwd, _bdp_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def gf_block_sample_perm(z, pvec, prep, meta):
    return _run_block(z, (pvec[:, None],), prep, meta, False, "sample")


def _bsp_fwd(z, pvec, prep, meta):
    out = gf_block_sample_perm(z, pvec, prep, meta)
    return out, (out[0], pvec)


def _bsp_bwd(prep, meta, res, cts):
    y, pvec = res
    gz, gp = _run_block_bwd(y, (pvec[:, None],), cts[0], cts[1], prep,
                            meta, False, "sample")
    return gz, gp[0][:, 0]


gf_block_sample_perm.defvjp(_bsp_fwd, _bsp_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7))
def gf_block_density_lazy2(x, summary, w1, b1, w, b, prep, meta):
    """FULL-MLP-fusion density block: x (B, d), summary (B, In),
    w1 (H, In), b1 (H,), w (P, H), b (P, 1) -> (base, ld_sum)."""
    return _run_block(x, (summary.T, w1, b1[:, None], w, b), prep, meta,
                      "lazy2", "density")


def _bdl2_fwd(x, summary, w1, b1, w, b, prep, meta):
    out = gf_block_density_lazy2(x, summary, w1, b1, w, b, prep, meta)
    return out, (x, summary, w1, b1, w, b)


def _bdl2_bwd(prep, meta, res, cts):
    x, summary, w1, b1, w, b = res
    gx, gp = _run_block_bwd(x, (summary.T, w1, b1[:, None], w, b),
                            cts[0], cts[1], prep, meta, "lazy2", "density")
    return gx, gp[0].T, gp[1], gp[2][:, 0], gp[3], gp[4]


gf_block_density_lazy2.defvjp(_bdl2_fwd, _bdl2_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7))
def gf_block_sample_lazy2(z, summary, w1, b1, w, b, prep, meta):
    """FULL-MLP-fusion sampling block (see gf_block_density_lazy2)."""
    return _run_block(z, (summary.T, w1, b1[:, None], w, b), prep, meta,
                      "lazy2", "sample")


def _bsl2_fwd(z, summary, w1, b1, w, b, prep, meta):
    out = gf_block_sample_lazy2(z, summary, w1, b1, w, b, prep, meta)
    return out, (out[0], summary, w1, b1, w, b)


def _bsl2_bwd(prep, meta, res, cts):
    y, summary, w1, b1, w, b = res
    gz, gp = _run_block_bwd(y, (summary.T, w1, b1[:, None], w, b),
                            cts[0], cts[1], prep, meta, "lazy2", "sample")
    return gz, gp[0].T, gp[1], gp[2][:, 0], gp[3], gp[4]


gf_block_sample_lazy2.defvjp(_bsl2_fwd, _bsl2_bwd)


# ---------------------------------------------------------------------------
# eligibility
# ---------------------------------------------------------------------------

def block_meta(layers_objs):
    """Return (prep, meta) when a sub-manifold's layer list can run as one
    fused block, else None.

    Requirements: every layer a GaussianizationFlow with classic stretch,
    no skewness/center_mean, identical (num_kde, dim, regulators), rotation
    householder or none, and kernel-eligible sizes.  The iCDF type may vary
    per layer (the orchestrator swaps the FIRST g layer of a sub-manifold
    to inormal_partly_precise, flow_options.py:446-448 behavior).
    """
    from ..layers.euclidean import GaussianizationFlow
    if not layers_objs:
        return None
    metas = []
    first = layers_objs[0]
    for lay in layers_objs:
        if type(lay) is not GaussianizationFlow:
            return None
        if (lay.nonlinear_stretch_type != "classic" or lay.add_skewness
                or lay.center_mean or getattr(lay, "hp_tail_newton", 0)):
            return None
        if lay.inverse_function_type not in (
                "isigmoid", "inormal_partly_precise",
                "inormal_partly_crude", "inormal_full_pade"):
            return None
        if lay.rotation_mode not in ("householder", "none"):
            return None
        if (lay.num_kde != first.num_kde
                or lay.dimension != first.dimension
                or lay._kernel_prep != first._kernel_prep):
            return None
        if lay.num_kde * lay.dimension > MAX_KERNEL_KD:
            return None
        metas.append(layer_meta(lay.model_offset,
                                lay.householder_iter
                                if lay.rotation_mode == "householder" else 0,
                                bool(lay.fit_normalization),
                                lay.inverse_function_type))
    meta = (first.num_kde, first.dimension, tuple(metas))
    return first._kernel_prep, meta
