"""Measure the VPU's TRANSCENDENTAL throughput ceiling and the GF kernels'
utilization of it (VERDICT r3 item 2: the "transcendental-bound" claim must
carry a measured number, not inference from negatives).

Three parts:

1. **Peak**: Pallas chain kernels of pure exp / log / softplus ops on a
   lane-aligned f32 block, swept over chain length; the marginal cost per
   chain step gives ops/s free of launch overhead.  A mul-add chain of the
   same shape calibrates against the ALU peak (sanity: should approach the
   ~3.9 TF/s f32 VPU number / 2 ops per FMA chain step).
2. **Counts**: element-weighted transcendental counts of the benched
   programs, from a recursive jaxpr walk of the pure-XLA formulation
   (Pallas disabled; the kernel path computes the same math — parity-tested
   — so density-direction counts transfer; the XLA sampling solve does ~26
   mixture evaluations vs the kernel's 6, noted per row).
3. **Utilization**: measured step time + counts -> achieved transcendental
   ops/s as a fraction of the measured peak.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/transcendental_peak.py
Writes TRANSCENDENTAL.json next to ROOFLINE.json.
"""
import json
import os
import pathlib
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      "/tmp/jammy_flows_tpu_jaxcache")
import jax
import jax.numpy as jnp
import numpy as np
import optax

from jax.experimental import pallas as pl

# ---------------------------------------------------------------- part 1

ROWS, LANES = 8, 1024          # one VMEM block: 8192 f32 elements
GRID = 128                     # blocks per launch -> 1.05M elements


def _chain_kernel(n_ops, op):
    def kernel(x_ref, o_ref):
        x = x_ref[...]
        for _ in range(n_ops):
            if op == "exp":
                x = jnp.exp(x) * (-0.4)           # keeps x in [-e^0.4*0.4, 0)
            elif op == "log":
                x = jnp.log(x) * (-0.3) + 1.0     # keeps x ~ O(1) positive
            elif op == "softplus":
                x = jax.nn.softplus(x) * (-0.5)   # exp + log1p per step
            elif op == "sin":
                x = jnp.sin(x) + 0.1              # stays in [-0.9, 1.1]
            elif op == "arccos":
                x = jnp.arccos(x * 0.6) - 1.0     # stays in ~[-1, 1.2]
            else:                                  # fma
                x = x * 1.0000001 + 1e-7
        o_ref[...] = x
    return kernel


SCAN_REPS = 12                 # pallas launches per dispatch (amortizes the
                               # ~30 ms tunnel sync to <1% of the signal)


def _time_chain(n_ops, op, trials=5):
    x = jnp.full((ROWS, GRID * LANES), -0.5 if op != "log" else 0.7,
                 jnp.float32)
    spec = pl.BlockSpec((ROWS, LANES), lambda i: (0, i))

    if op == "arccos":
        # Mosaic has no acos lowering (verified 2026-08-21): measure the
        # arccos-class rate through plain XLA with the same marginal-slope
        # methodology (the slope subtracts the launch/loop overhead)
        @jax.jit
        def run(x):
            def body(carry, _):
                y = carry
                for _ in range(n_ops):
                    y = jnp.arccos(y * 0.6) - 1.0
                return 0.5 * y + x * 0.25, None
            y, _ = jax.lax.scan(body, x, None, length=SCAN_REPS)
            return y.sum()
    else:
        @jax.jit
        def run(x):
            def body(carry, _):
                y = pl.pallas_call(
                    _chain_kernel(n_ops, op),
                    out_shape=jax.ShapeDtypeStruct(carry.shape, carry.dtype),
                    grid=(GRID,), in_specs=[spec], out_specs=spec)(carry)
                # feed the output back (bounded values) so XLA cannot hoist
                return 0.5 * y + x * 0.25, None
            y, _ = jax.lax.scan(body, x, None, length=SCAN_REPS)
            return y.sum()

    float(run(x))
    best = float("inf")
    for _ in range(trials):
        t0 = time.time()
        float(run(x))
        best = min(best, time.time() - t0)
    return best


def measure_peak(op, reps=64):
    """Marginal per-op cost from a chain-length sweep (slope, launch-free).
    The chain is elementwise over 8192 lanes per block — far more ILP than
    the VPU pipeline depth, so this measures throughput, not latency."""
    n_lo, n_hi = reps, 8 * reps
    t_lo = _time_chain(n_lo, op)
    t_hi = _time_chain(n_hi, op)
    elems = ROWS * GRID * LANES * SCAN_REPS
    per_op = (t_hi - t_lo) / ((n_hi - n_lo) * elems)
    return 1.0 / per_op          # ops/s


# ---------------------------------------------------------------- part 2

TRANSC_PRIMS = {
    "exp": 1.0, "log": 1.0, "log1p": 1.0, "expm1": 1.0, "logistic": 1.0,
    "tanh": 1.0, "erf": 1.0, "erfc": 1.0, "erf_inv": 1.0, "pow": 1.0,
    "sin": 1.0, "cos": 1.0, "atan2": 1.0, "acos": 1.0, "asin": 1.0,
    "atan": 1.0,
    # cheap-ish but same functional-unit class on the VPU
    "rsqrt": 0.5, "sqrt": 0.5, "cbrt": 1.0,
}

# plain VPU ALU ops (1 op each); used for the two-resource lower bound
ALU_PRIMS = {
    "add", "sub", "mul", "div", "max", "min", "neg", "abs", "sign",
    "select_n", "and", "or", "xor", "not", "eq", "ne", "lt", "le", "gt",
    "ge", "floor", "ceil", "round", "is_finite", "clamp", "rem",
    "integer_pow", "square", "convert_element_type",
}


def _eqn_elems(eqn):
    n = 0
    for v in eqn.outvars:
        aval = v.aval
        n = max(n, int(np.prod(aval.shape)) if aval.shape else 1)
    return n


def count_transcendentals(closed_jaxpr, mult=1.0, acc=None):
    """Element-weighted transcendental count, recursing through pjit/scan/
    custom_vjp/checkpoint/pallas sub-jaxprs (scan multiplies by length)."""
    acc = acc if acc is not None else {}
    jaxpr = closed_jaxpr.jaxpr if hasattr(closed_jaxpr, "jaxpr") \
        else closed_jaxpr
    for eqn in jaxpr.eqns:
        name = eqn.primitive.name
        if name in TRANSC_PRIMS:
            acc[name] = acc.get(name, 0.0) + \
                mult * TRANSC_PRIMS[name] * _eqn_elems(eqn)
            continue
        if name in ALU_PRIMS:
            acc["_alu"] = acc.get("_alu", 0.0) + mult * _eqn_elems(eqn)
            continue
        sub_mult = mult
        if name == "scan":
            sub_mult = mult * eqn.params.get("length", 1)
        for key in ("jaxpr", "call_jaxpr", "cond_jaxpr", "body_jaxpr",
                    "fwd_jaxpr_thunk"):
            sub = eqn.params.get(key)
            if sub is None or not (hasattr(sub, "eqns")
                                   or hasattr(sub, "jaxpr")):
                continue        # thunks/WrappedFun etc: not a jaxpr
            count_transcendentals(sub, sub_mult, acc)
        for key in ("branches",):
            for sub in eqn.params.get(key, ()):  # cond: count worst branch
                count_transcendentals(sub, sub_mult, acc)
    return acc


# ---------------------------------------------------------------- part 3

def flagship_programs(n):
    """(name, jaxpr-fn, args, note) for the ceiling-relevant programs,
    pure-XLA path (Pallas disabled via env before import would be cleaner,
    but pallas gates on pallas_available which we monkeypatch here)."""
    import jammy_flows_tpu.ops.pallas_gf as pg
    from jammy_flows_tpu import pdf
    if not hasattr(pg, "_orig_pallas_available"):
        pg._orig_pallas_available = pg.pallas_available
    pg.pallas_available = lambda: False        # XLA formulation for counting

    progs = []

    p = pdf("e4", "gggg", conditional_input_dim=3)
    params = p.init_params(seed=0, dtype=jnp.float32)
    x = jnp.zeros((n, 4), jnp.float32)
    ci = jnp.ones((n, 3), jnp.float32)
    opt = optax.adam(1e-3)

    def train(params, opt_state, x, ci):
        def loss(pp):
            return -p.log_prob(pp, x, conditional_input=ci)[0].mean()
        l, g = jax.value_and_grad(loss)(params)
        u, opt_state = opt.update(g, opt_state)
        return optax.apply_updates(params, u), opt_state, l

    progs.append(("e4/gggg conditional NLL value+grad (XLA math)",
                  train, (params, opt.init(params), x, ci),
                  "density-direction counts transfer to the kernel path"))

    def sample(params, key):
        return p.sample(params, key, samplesize=n, conditional_input=ci)[0]

    progs.append(("e4/gggg conditional sampling (XLA math)",
                  sample, (params, jax.random.PRNGKey(0)),
                  "XLA solve does ~26 mixture evals vs the kernel's 6: "
                  "kernel-path count is ~0.3x this row"))

    # flagship + production f, and the s2/f15 production recipe (VERDICT r4
    # item 2: the null ROOFLINE rows get a measured-census two-resource
    # bound instead)
    from bench_production import PRODUCTION_F

    p2 = pdf("e4+s2+e4", "gggg+f+gggg", conditional_input_dim=3,
             options_overwrite=PRODUCTION_F)
    params2 = p2.init_params(seed=0, dtype=jnp.float32)
    x2 = np.zeros((n, p2.total_target_dim), np.float32)
    x2[:, 4] = 1.2
    x2[:, 5] = 1.0
    x2 = jnp.asarray(x2)
    ci2 = jnp.ones((n, 3), jnp.float32)

    def train2(params, opt_state, x, ci):
        def loss(pp):
            return -p2.log_prob(pp, x, conditional_input=ci)[0].mean()
        l, g = jax.value_and_grad(loss)(params)
        u, opt_state = opt.update(g, opt_state)
        return optax.apply_updates(params, u), opt_state, l

    progs.append(("flagship+prodf conditional NLL value+grad (XLA math)",
                  train2, (params2, opt.init(params2), x2, ci2),
                  "density-direction counts transfer to the kernel path"))

    def sample2(params, key):
        return p2.sample(params, key, samplesize=n,
                         conditional_input=ci2)[0]

    progs.append(("flagship+prodf conditional sampling (XLA math)",
                  sample2, (params2, jax.random.PRNGKey(0)),
                  "XLA gggg solves do ~26 mixture evals vs the kernel's 6"))

    p3 = pdf("s2", "f" * 15, options_overwrite=PRODUCTION_F)
    params3 = p3.init_params(seed=0, dtype=jnp.float32)
    x3 = np.zeros((n, 2), np.float32)
    x3[:, 0] = 1.2
    x3[:, 1] = 1.0
    x3 = jnp.asarray(x3)

    def train3(params, opt_state, x):
        def loss(pp):
            return -p3.log_prob(pp, x)[0].mean()
        l, g = jax.value_and_grad(loss)(params)
        u, opt_state = opt.update(g, opt_state)
        return optax.apply_updates(params, u), opt_state, l

    progs.append(("s2/f15 production NLL value+grad (XLA=production math)",
                  train3, (params3, opt.init(params3), x3),
                  "the production f path IS the XLA column path - counts "
                  "are exact for the benched program"))

    def sample3(params, key):
        return p3.sample(params, key, samplesize=n, dtype=jnp.float32)[0]

    progs.append(("s2/f15 production sampling (XLA=production math)",
                  sample3, (params3, jax.random.PRNGKey(0)),
                  "exact: sampling also runs the column XLA path"))
    return progs


def time_kernel_train(n, reps=20):
    """Honest e4/gggg conditional Adam-step time per sample, kernels ON."""
    import jammy_flows_tpu.ops.pallas_gf as pg
    if hasattr(pg, "_orig_pallas_available"):  # undo the counting monkeypatch
        pg.pallas_available = pg._orig_pallas_available
    jax.clear_caches()
    from jammy_flows_tpu import pdf
    p = pdf("e4", "gggg", conditional_input_dim=3)
    params = p.init_params(seed=0, dtype=jnp.float32)
    x = jnp.zeros((n, 4), jnp.float32)
    ci = jnp.ones((n, 3), jnp.float32)
    opt = optax.adam(1e-3)

    def body(carry, eps):
        params, opt_state = carry

        def loss(pp):
            return -p.log_prob(pp, x + eps, conditional_input=ci)[0].mean()
        l, g = jax.value_and_grad(loss)(params)
        u, opt_state = opt.update(g, opt_state)
        return (optax.apply_updates(params, u), opt_state), l

    @jax.jit
    def run(params, key):
        eps = 1e-6 * jax.random.normal(key, (reps, 1, 1), jnp.float32)
        (params, _), ls = jax.lax.scan(body, (params, opt.init(params)), eps)
        return ls.sum()

    float(run(params, jax.random.PRNGKey(0)))
    best = float("inf")
    for t in range(3):
        t0 = time.time()
        float(run(params, jax.random.PRNGKey(1 + t)))
        best = min(best, time.time() - t0)
    return best / (reps * n)


def main():
    out = {"methodology": __doc__.strip().split("\n\n")[1]}

    print("=== measured VPU chain throughput (marginal, launch-free) ===",
          flush=True)
    peaks = {}
    for op in ("fma", "exp", "log", "softplus", "sin", "arccos"):
        # chain lengths sized so the slope is >>the ~5 ms dispatch noise
        # floor (fma is ~50x faster per op than the transcendentals)
        rate = measure_peak(op, reps=1024 if op == "fma" else 192)
        peaks[op] = rate
        print(f"  {op:9s}: {rate/1e12:7.3f} Tops/s", flush=True)
    out["measured_chain_tops_per_s"] = {k: round(v / 1e12, 4)
                                        for k, v in peaks.items()}

    # per-op rates for the mix-weighted bound: log1p/softplus-class ops at
    # the softplus rate, log-class at log, everything exotic at exp
    rate_of = {"exp": peaks["exp"], "log": peaks["log"],
               "log1p": peaks["softplus"], "tanh": peaks["exp"],
               "sqrt": peaks["log"], "rsqrt": peaks["log"],
               "sin": peaks["sin"], "cos": peaks["sin"],
               "atan2": peaks["arccos"], "erf_inv": peaks["arccos"],
               "erf": peaks["arccos"], "erfc": peaks["arccos"],
               "cbrt": peaks["arccos"], "pow": peaks["softplus"],
               "expm1": peaks["softplus"], "acos": peaks["arccos"],
               "asin": peaks["arccos"], "atan": peaks["arccos"]}
    # arccos/acos-class ops (incl. the arccos-based angle reconstructions)
    # measured directly; sin/cos at the sin chain rate
    alu_rate = max(peaks["fma"], 1e12)   # floor: never below 1 Tops/s

    n = 262144
    print("=== program op counts (element-weighted) + two-resource bound ===",
          flush=True)
    rows = []
    for name, fn, args, note in flagship_programs(n):
        jx = jax.make_jaxpr(fn)(*args)
        counts = count_transcendentals(jx)
        alu = counts.pop("_alu", 0.0) / n
        total = sum(counts.values())
        per_item = total / n
        # mix-weighted time lower bounds (per sample)
        t_transc = sum((v / n) / rate_of.get(k, peaks["exp"])
                       for k, v in counts.items())
        t_alu = alu / alu_rate
        print(f"  {name}:\n"
              f"    {per_item:,.0f} transc/sample "
              f"({ {k: round(v/n, 1) for k, v in sorted(counts.items())} })\n"
              f"    {alu:,.0f} ALU ops/sample\n"
              f"    transcendental-only bound {t_transc*1e9:.1f} ns/sample, "
              f"ALU-only bound {t_alu*1e9:.1f} ns/sample, "
              f"sum {1e9*(t_transc+t_alu):.1f} ns/sample", flush=True)
        rows.append({"name": name, "transc_per_item": round(per_item, 1),
                     "alu_per_item": round(alu, 1),
                     "counts_per_item": {k: round(v / n, 2)
                                         for k, v in counts.items()},
                     "bound_ns_per_item": {
                         "transcendental": round(t_transc * 1e9, 2),
                         "alu": round(t_alu * 1e9, 2),
                         "sum": round((t_transc + t_alu) * 1e9, 2)},
                     "note": note})
    out["programs"] = rows

    # measured kernel-path step vs the bound
    t_meas = time_kernel_train(1048576)
    density_bound = rows[0]["bound_ns_per_item"]
    util = density_bound["sum"] / (t_meas * 1e9)
    print(f"=== measured kernel-path e4/gggg conditional Adam step: "
          f"{t_meas*1e9:.1f} ns/sample "
          f"({1e3/ (t_meas*1e9) * 1e3 / 1e3:.1f}M evals/s); "
          f"two-resource bound {density_bound['sum']:.1f} ns/sample -> "
          f"utilization {100*util:.0f}%", flush=True)
    out["measured_kernel_train_ns_per_item"] = round(t_meas * 1e9, 2)
    out["two_resource_utilization_pct"] = round(100 * util, 1)

    # flagship + s2/f15 kernel-path measurements vs their census bounds
    # (fills the null ROOFLINE rows; VERDICT r4 item 2)
    import jammy_flows_tpu.ops.pallas_gf as pg
    from jammy_flows_tpu import pdf
    from bench_production import PRODUCTION_F, time_sampling, time_train
    if hasattr(pg, "_orig_pallas_available"):
        pg.pallas_available = pg._orig_pallas_available
    jax.clear_caches()

    n = 262144
    p2 = pdf("e4+s2+e4", "gggg+f+gggg", conditional_input_dim=3,
             options_overwrite=PRODUCTION_F)
    params2 = p2.init_params(seed=0, dtype=jnp.float32)
    p3 = pdf("s2", "f" * 15, options_overwrite=PRODUCTION_F)
    params3 = p3.init_params(seed=0, dtype=jnp.float32)

    bound_of = {r["name"]: r["bound_ns_per_item"]["sum"] for r in rows}
    meas = {}
    meas["flagship+prodf NLL value+grad"] = (
        1e9 / time_train(p2, params2, n, cond_dim=3),
        bound_of["flagship+prodf conditional NLL value+grad (XLA math)"],
        "census transfers (kernel computes the same density math + vjp)")
    meas["flagship+prodf sampling"] = (
        1e9 / time_sampling(p2, params2, n, cond_dim=3),
        bound_of["flagship+prodf conditional sampling (XLA math)"],
        "census counts the XLA 26-eval solve; the kernels do 6 - the "
        "bound is ~3x loose for the gggg half")
    meas["s2/f15 production NLL value+grad"] = (
        1e9 / time_train(p3, params3, n, cond_dim=None),
        bound_of["s2/f15 production NLL value+grad (XLA=production math)"],
        "exact: the production path IS the counted program")
    meas["s2/f15 production sampling"] = (
        1e9 / time_sampling(p3, params3, n, cond_dim=None),
        bound_of["s2/f15 production sampling (XLA=production math)"],
        "exact: the production path IS the counted program")

    out["kernel_path_measurements"] = {}
    for name, (ns_item, bound_ns, note) in meas.items():
        pct = 100.0 * bound_ns / ns_item
        out["kernel_path_measurements"][name] = {
            "measured_ns_per_item": round(ns_item, 2),
            "two_resource_bound_ns_per_item": round(bound_ns, 2),
            "pct_of_two_resource_bound": round(pct, 1),
            "note": note,
        }
        print(f"  {name}: {ns_item:.1f} ns/item measured, bound "
              f"{bound_ns:.1f} -> {pct:.0f}% of two-resource bound "
              f"({note})", flush=True)

    path = pathlib.Path(__file__).resolve().parent.parent / \
        "TRANSCENDENTAL.json"
    path.write_text(json.dumps(out, indent=1))
    print("wrote", path, flush=True)

    # patch the null ROOFLINE rows with the measured-census bound data
    rpath = pathlib.Path(__file__).resolve().parent.parent / "ROOFLINE.json"
    roof = json.loads(rpath.read_text())
    patch = {
        "flagship sampling": "flagship+prodf sampling",
        "flagship NLL value+grad": "flagship+prodf NLL value+grad",
        "s2/f15 production sampling": "s2/f15 production sampling",
        "s2/f15 production NLL value+grad": "s2/f15 production NLL "
                                            "value+grad",
    }
    for row in roof["rows"]:
        key = patch.get(row["config"])
        if key is None or key not in out["kernel_path_measurements"]:
            continue
        m = out["kernel_path_measurements"][key]
        row["throughput_per_s"] = round(1e9 / m["measured_ns_per_item"], 1)
        row["census_two_resource_bound_ns_per_item"] = \
            m["two_resource_bound_ns_per_item"]
        row["achieved_pct_of_two_resource_bound"] = \
            m["pct_of_two_resource_bound"]
        row["bound_by"] = ("VPU-elementwise; achieved-%% vs the measured "
                           "op-census two-resource bound "
                           "(TRANSCENDENTAL.json): " + m["note"])
    for row in roof["rows"]:
        if row["config"] == "e4/gggg NLL value+grad":
            row["census_two_resource_bound_ns_per_item"] = \
                rows[0]["bound_ns_per_item"]["sum"]
            row["achieved_pct_of_two_resource_bound"] = \
                out["two_resource_utilization_pct"]
            row["bound_by"] = ("VPU-elementwise; measured two-resource "
                               "utilization (TRANSCENDENTAL.json)")
    rpath.write_text(json.dumps(roof, indent=1))
    print("patched", rpath, flush=True)


if __name__ == "__main__":
    main()
