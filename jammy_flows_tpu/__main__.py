"""Command-line interface: fit / sample / eval / moments.

A thin production entry point over the library (the reference has no CLI —
SURVEY section 5; this is a TPU-side deliverable).  Model definitions and
fitted parameters travel together: checkpoints are an orbax directory plus
a model.json sidecar, so `sample`/`eval` rebuild the exact PDF.

Examples:
    python -m jammy_flows_tpu fit --pdf-defs e2 --flow-defs gg \\
        --data data.npz --data-key x --out /tmp/model --steps 500
    python -m jammy_flows_tpu sample --model /tmp/model -n 10000 \\
        --out samples.npy
    python -m jammy_flows_tpu eval --model /tmp/model --data test.npz
    python -m jammy_flows_tpu moments --model /tmp/model
"""
from __future__ import annotations

import argparse
import json
import pathlib
import sys


def _load_array(path, key=None):
    import numpy as np
    p = pathlib.Path(path)
    if p.suffix == ".npz":
        payload = np.load(p)
        if key is None:
            key = list(payload.keys())[0]
        return np.asarray(payload[key])
    if p.suffix == ".npy":
        return np.load(p)
    if p.suffix in (".csv", ".txt"):
        return np.loadtxt(p, delimiter="," if p.suffix == ".csv" else None)
    raise SystemExit(f"unsupported data format: {path}")


def _build_pdf(spec):
    from jammy_flows_tpu import pdf
    return pdf(spec["pdf_defs"], spec["flow_defs"],
               conditional_input_dim=spec.get("conditional_input_dim"),
               options_overwrite=spec.get("options_overwrite") or {})


def _save_model(out, spec, params):
    from jammy_flows_tpu.utils import checkpoint as ckpt
    out = pathlib.Path(out).resolve()
    out.mkdir(parents=True, exist_ok=True)
    (out / "model.json").write_text(json.dumps(spec, indent=1))
    ckpt.save(str(out / "params"), params)


def _load_model(path):
    import jax.numpy as jnp
    from jammy_flows_tpu.utils import checkpoint as ckpt
    path = pathlib.Path(path).resolve()
    spec = json.loads((path / "model.json").read_text())
    p = _build_pdf(spec)
    like = p.init_params(seed=0, dtype=jnp.dtype(spec.get("dtype",
                                                          "float32")))
    params, _ = ckpt.restore(str(path / "params"), like_params=like)
    return p, params, spec


def cmd_fit(args):
    import jax.numpy as jnp
    from jammy_flows_tpu import train

    data = _load_array(args.data, args.data_key)
    ci = _load_array(args.cond, args.cond_key) if args.cond else None
    spec = {"pdf_defs": args.pdf_defs, "flow_defs": args.flow_defs,
            "conditional_input_dim": None if ci is None else ci.shape[1],
            "options_overwrite": json.loads(args.options) if args.options
            else {},
            "dtype": args.dtype}
    p = _build_pdf(spec)
    dtype = jnp.dtype(args.dtype)
    params = p.init_params(seed=args.seed, dtype=dtype,
                           data=None if (ci is not None or args.no_data_init)
                           else data)
    params, hist = train.fit(
        p, params, data.astype(dtype), conditional_input=None if ci is None
        else ci.astype(dtype), num_steps=args.steps,
        batch_size=args.batch_size, learning_rate=args.lr,
        schedule=args.schedule, clip_norm=args.clip_norm, verbose=True)
    _save_model(args.out, spec, params)
    print(f"final NLL {hist[-1]:.4f}; model saved to {args.out}")


def cmd_sample(args):
    import jax
    import numpy as np
    p, params, spec = _load_model(args.model)
    ci = None
    if args.cond:
        ci = _load_array(args.cond, args.cond_key)
    x, _, logq, _ = p.sample(params, jax.random.PRNGKey(args.seed),
                             samplesize=args.n,
                             conditional_input=ci)
    np.save(args.out, np.asarray(x))
    print(f"{x.shape[0]} samples -> {args.out} "
          f"(mean log q {float(logq.mean()):.4f})")


def cmd_eval(args):
    import numpy as np
    p, params, spec = _load_model(args.model)
    data = _load_array(args.data, args.data_key)
    ci = _load_array(args.cond, args.cond_key) if args.cond else None
    lp, _, _ = p.log_prob(params, data, conditional_input=ci)
    lp = np.asarray(lp)
    print(json.dumps({"mean_nll": float(-lp.mean()),
                      "n": int(lp.size),
                      "finite_fraction": float(np.isfinite(lp).mean())}))


def cmd_moments(args):
    import jax
    import numpy as np
    p, params, spec = _load_model(args.model)
    ci = _load_array(args.cond, args.cond_key) if args.cond else None
    mm = p.marginal_moments(params, jax.random.PRNGKey(args.seed),
                            conditional_input=ci, samplesize=args.n)
    out = {k: (v.tolist() if isinstance(v, np.ndarray) else str(v))
           for k, v in mm.items() if not isinstance(v, dict)}
    print(json.dumps(out, indent=1))


def main(argv=None):
    ap = argparse.ArgumentParser(prog="python -m jammy_flows_tpu",
                                 description=__doc__.split("\n")[0])
    sub = ap.add_subparsers(dest="cmd", required=True)

    def common(s):
        s.add_argument("--seed", type=int, default=0)
        s.add_argument("--cond", help="conditional-input array file")
        s.add_argument("--cond-key")
        s.add_argument("--platform", choices=["cpu", "default"],
                       default="default",
                       help="force the CPU backend (the environment may "
                            "auto-select an accelerator)")
        return s

    f = common(sub.add_parser("fit", help="maximum-likelihood fit"))
    f.add_argument("--pdf-defs", required=True)
    f.add_argument("--flow-defs", required=True)
    f.add_argument("--data", required=True)
    f.add_argument("--data-key")
    f.add_argument("--out", required=True, help="model output directory")
    f.add_argument("--steps", type=int, default=500)
    f.add_argument("--batch-size", type=int)
    f.add_argument("--lr", type=float, default=1e-2)
    f.add_argument("--schedule", choices=["cosine", "warmup_cosine"])
    f.add_argument("--clip-norm", type=float)
    f.add_argument("--dtype", default="float32")
    f.add_argument("--options", help="options_overwrite as JSON")
    f.add_argument("--no-data-init", action="store_true")
    f.set_defaults(fn=cmd_fit)

    s = common(sub.add_parser("sample", help="draw samples from a model"))
    s.add_argument("--model", required=True)
    s.add_argument("-n", type=int, default=10000)
    s.add_argument("--out", required=True)
    s.set_defaults(fn=cmd_sample)

    e = common(sub.add_parser("eval", help="mean NLL of a dataset"))
    e.add_argument("--model", required=True)
    e.add_argument("--data", required=True)
    e.add_argument("--data-key")
    e.set_defaults(fn=cmd_eval)

    m = common(sub.add_parser("moments", help="marginal moments"))
    m.add_argument("--model", required=True)
    m.add_argument("-n", type=int, default=2000)
    m.set_defaults(fn=cmd_moments)

    args = ap.parse_args(argv)
    if args.platform == "cpu":
        # must run before the first jax import (the cmd_* functions import
        # lazily for exactly this reason); config update beats any
        # sitecustomize-forced platform as long as no backend exists yet
        import os
        os.environ["JAX_PLATFORMS"] = "cpu"
        import jax
        jax.config.update("jax_platforms", "cpu")
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
