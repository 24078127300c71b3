"""Roofline grounding for the benched configs (BASELINE.md).

For each headline config this measures wall time with the same
on-device-scan methodology as bench.py, pulls FLOPs / HBM bytes from XLA's
compiled cost analysis, and reports achieved GFLOP/s and GB/s as a
percentage of the chip's peaks, plus which resource the kernel is bound by
(arithmetic intensity vs machine balance).

Caveats recorded in the output:
  * XLA cost analysis does not see inside Pallas custom calls; for configs
    that use the fused block kernels we also report an analytic
    lower-bound byte count (program inputs + outputs) and flag the
    cost-analysis numbers as partial.
  * "bytes accessed" is XLA's HBM-traffic model (counts re-reads between
    fusions), an upper-ish bound on true traffic.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/roofline.py
"""
import json
import os
import pathlib
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      "/tmp/jammy_flows_tpu_jaxcache")
import jax
import jax.numpy as jnp
import optax

from jammy_flows_tpu import pdf

# Public per-chip peaks (dense bf16 matmul TFLOP/s, HBM GB/s).  The VPU
# (vector unit) peak for f32 elementwise math is far lower than the MXU
# number — ~4 ops/cycle/lane * 8 sublanes * 128 lanes * ~0.94-1.05 GHz ≈
# 4-5 TFLOP/s class — so elementwise-dominated flows should be judged
# against the HBM and VPU ceilings, not the MXU's.
PEAKS = {
    "TPU v4": {"mxu_tflops": 275.0, "hbm_gbs": 1228.0, "vpu_tflops": 4.3},
    "TPU v5e": {"mxu_tflops": 197.0, "hbm_gbs": 819.0, "vpu_tflops": 3.9},
    "TPU v5 lite": {"mxu_tflops": 197.0, "hbm_gbs": 819.0,
                    "vpu_tflops": 3.9},
    "TPU v5p": {"mxu_tflops": 459.0, "hbm_gbs": 2765.0, "vpu_tflops": 7.4},
    "TPU v6e": {"mxu_tflops": 918.0, "hbm_gbs": 1640.0, "vpu_tflops": 7.4},
    "TPU v6 lite": {"mxu_tflops": 918.0, "hbm_gbs": 1640.0,
                    "vpu_tflops": 7.4},
}

PRODUCTION_F = {"f": {
    "add_vertical_rq_spline_flow": 1,
    "add_circular_rq_spline_flow": 1,
    "spline_num_basis_functions": -1,
    "vertical_smooth": 1,
    "vertical_flow_defs": "rr",
    "circular_flow_defs": "oo",
    "vertical_fix_boundary_derivative": 1,
    "vertical_fix_first_width_n_height_to_zero": 1,
    "vertical_also_fix_second_width_to_zero": 1,
    "vertical_independent_width_height_parametrization": 1,
    "circular_add_rotation": 0,
    "kappa_prediction": "direct_log_real_bounded",
    "rotation_mode": "householder",
}}


def device_peaks():
    d = jax.devices()[0]
    kind = getattr(d, "device_kind", "unknown")
    for k, v in PEAKS.items():
        if k.lower() in str(kind).lower() or str(kind).lower() in k.lower():
            return kind, v
    # default: the chip this project benches on (axon tunnel, v5e class)
    return f"{kind} (peaks assumed v5e-class)", PEAKS["TPU v5e"]


def _sync(x):
    return float(x)


def make_sample_fn(p, params, n, reps):
    @jax.jit
    def run(pp, key):
        keys = jax.random.split(key, reps)
        acc, _ = jax.lax.scan(
            lambda c, k: (c + p.sample(pp, k, samplesize=n)[0].sum(), None),
            jnp.float32(0.0), keys)
        return acc

    return run, (params, jax.random.PRNGKey(0))


def make_train_fn(p, params, n, reps, cond_dim=None):
    opt = optax.adam(1e-3)
    x = jnp.zeros((n, p.total_target_dim), jnp.float32)
    for k, d in enumerate(p.pdf_defs_list):
        if d == "s2":
            lo, hi = p.target_dim_indices[k]
            x = x.at[:, lo].set(1.0).at[:, lo + 1].set(1.0)
    ci = None if cond_dim is None else jnp.ones((n, cond_dim), jnp.float32)

    def body(carry, eps):
        params, opt_state = carry
        xx = x + eps

        def loss(pp):
            return -p.log_prob(pp, xx, conditional_input=ci)[0].mean()

        l, g = jax.value_and_grad(loss)(params)
        u, opt_state = opt.update(g, opt_state)
        return (optax.apply_updates(params, u), opt_state), l

    @jax.jit
    def run(params, key):
        eps = 1e-6 * jax.random.normal(key, (reps, 1, 1), jnp.float32)
        (params, _), ls = jax.lax.scan(body, (params, opt.init(params)), eps)
        return ls.sum()

    return run, (params, jax.random.PRNGKey(0))


def measure(name, run, args, n, reps, peaks, trials=3, pallas_opaque=False):
    lowered = run.lower(*args)
    compiled = lowered.compile()
    ca = compiled.cost_analysis() or {}
    flops = float(ca.get("flops", 0.0))
    bytes_acc = float(ca.get("bytes accessed", 0.0))

    _sync(run(*args))                      # warmup (already compiled)
    best = float("inf")
    for i in range(trials):
        t0 = time.time()
        _sync(run(args[0], jax.random.PRNGKey(i + 1)))
        best = min(best, time.time() - t0)

    per_s = reps * n / best
    row = {
        "config": name,
        "throughput_per_s": round(per_s, 1),
        "ms_per_step": round(best * 1e3 / reps, 3),
    }
    if pallas_opaque:
        # XLA cost analysis cannot see inside Pallas custom calls: the
        # flops/bytes it reports for these configs are junk (e.g. 2.4
        # flops/item) — publish null, not data.  The measured compute
        # ceiling for these kernels lives in TRANSCENDENTAL.json.
        row.update({"flops_per_item": None, "bytes_per_item": None,
                    "achieved_gflops": None, "achieved_gbs": None,
                    "pct_vpu_peak": None, "pct_mxu_peak": None,
                    "pct_hbm_peak": None, "intensity_flops_per_byte": None,
                    "bound_by": "VPU-elementwise (Pallas interior opaque to "
                                "cost analysis; measured two-resource bound "
                                "in TRANSCENDENTAL.json)"})
        print(f"{name:34s} {per_s/1e6:8.2f}M/s  "
              f"{row['ms_per_step']:7.2f} ms/step  (Pallas-opaque; see "
              f"TRANSCENDENTAL.json)", flush=True)
        return row

    gflops = flops / best / 1e9
    gbs = bytes_acc / best / 1e9
    # intensity in flops/byte vs machine balance; judged against VPU (these
    # are elementwise-dominated kernels, the MXU only sees the small
    # amortization matmuls)
    intensity = flops / bytes_acc if bytes_acc else float("nan")
    balance_vpu = peaks["vpu_tflops"] * 1e12 / (peaks["hbm_gbs"] * 1e9)
    bound = "HBM-bandwidth" if intensity < balance_vpu else "VPU-compute"
    pct_vpu = 100 * gflops / (peaks["vpu_tflops"] * 1e3)
    pct_hbm = 100 * gbs / peaks["hbm_gbs"]
    # honesty check: if neither resource is meaningfully utilized, the
    # intensity-derived label is meaningless — say so.  (The XLA "flops"
    # metric also counts a generic elementwise op as 1 flop while the real
    # cost is dominated by transcendentals and AD chains, so low % here is
    # an under-ESTIMATE of true VPU pressure — see TRANSCENDENTAL.json for
    # the measured op-mix bound.)
    if pct_vpu < 10 and pct_hbm < 10:
        bound = ("VPU-elementwise (cost-analysis flops under-count the "
                 "transcendental/AD op mix; see TRANSCENDENTAL.json)")
    row.update({
        "flops_per_item": round(flops / (reps * n), 1),
        "bytes_per_item": round(bytes_acc / (reps * n), 1),
        "achieved_gflops": round(gflops, 1),
        "achieved_gbs": round(gbs, 1),
        "pct_vpu_peak": round(pct_vpu, 1),
        "pct_mxu_peak": round(100 * gflops / (peaks["mxu_tflops"] * 1e3), 2),
        "pct_hbm_peak": round(pct_hbm, 1),
        "intensity_flops_per_byte": round(intensity, 2),
        "bound_by": bound,
    })
    print(f"{name:34s} {per_s/1e6:8.2f}M/s  {row['ms_per_step']:7.2f} ms/step"
          f"  {gflops:8.1f} GFLOP/s ({row['pct_vpu_peak']:.0f}% VPU)"
          f"  {gbs:7.1f} GB/s ({row['pct_hbm_peak']:.0f}% HBM)"
          f"  -> {bound}", flush=True)
    return row


def main():
    kind, peaks = device_peaks()
    print(f"device: {kind}  peaks: MXU {peaks['mxu_tflops']} TF/s bf16, "
          f"VPU ~{peaks['vpu_tflops']} TF/s f32, HBM {peaks['hbm_gbs']} GB/s",
          flush=True)
    n, reps = 262144, 80
    rows = []

    p_flag = pdf("e4+s2+e4", "gggg+f+gggg")
    prm = p_flag.init_params(seed=0, dtype=jnp.float32)
    rows.append(measure("flagship sampling",
                        *make_sample_fn(p_flag, prm, n, reps),
                        n=n, reps=reps, peaks=peaks, pallas_opaque=True))
    rows.append(measure("flagship NLL value+grad",
                        *make_train_fn(p_flag, prm, n, reps),
                        n=n, reps=reps, peaks=peaks, pallas_opaque=True))

    p_e4 = pdf("e4", "gggg")
    prm_e4 = p_e4.init_params(seed=0, dtype=jnp.float32)
    rows.append(measure("e4/gggg sampling (block kernel)",
                        *make_sample_fn(p_e4, prm_e4, n, reps),
                        n=n, reps=reps, peaks=peaks, pallas_opaque=True))
    rows.append(measure("e4/gggg NLL value+grad",
                        *make_train_fn(p_e4, prm_e4, n, reps),
                        n=n, reps=reps, peaks=peaks, pallas_opaque=True))

    p_prod = pdf("s2", "f" * 15, options_overwrite=PRODUCTION_F)
    prm_p = p_prod.init_params(seed=0, dtype=jnp.float32)
    rows.append(measure("s2/f15 production sampling",
                        *make_sample_fn(p_prod, prm_p, n, reps),
                        n=n, reps=reps, peaks=peaks))
    rows.append(measure("s2/f15 production NLL value+grad",
                        *make_train_fn(p_prod, prm_p, n, reps),
                        n=n, reps=reps, peaks=peaks))

    out = {
        "device_kind": str(kind),
        "peaks": peaks,
        "note": ("flops/bytes from XLA compiled cost analysis; Pallas "
                 "custom-call interiors are invisible to it, so configs "
                 "using the fused block kernels (flagship, e4/gggg) "
                 "under-count flops and bytes — their achieved-% rows are "
                 "lower bounds. Elementwise-dominated flows are judged "
                 "against VPU + HBM ceilings, not the MXU."),
        "rows": rows,
    }
    path = pathlib.Path(__file__).resolve().parent.parent / "ROOFLINE.json"
    path.write_text(json.dumps(out, indent=1))
    print("wrote", path)


if __name__ == "__main__":
    main()
