"""Effect of the Gaussianization-flow ``center_mean`` option.

TPU-native analog of reference examples/center_mean.py: samples single- and
double-layer ``g`` flows with and without ``center_mean=1`` and compares the
sample means.  With centering, the last KDE mean is tied so the logistic
mixture is zero-mean (flow_options.py:47, gaussianization_flow.py:846-852),
keeping the output mean near the trainable offset instead of drifting with
the randomly-initialized KDE means.

Runs on CPU by default (set JAMMY_PLATFORM=axon for the TPU chip; the
ambient JAX_PLATFORMS env var is force-set by this environment's harness and
can't be trusted as a user choice).
"""
import os

os.environ["JAX_PLATFORMS"] = os.environ.get("JAMMY_PLATFORM", "cpu")

import numpy as np
import jax

jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

from jammy_flows_tpu import pdf


def sample_mean(pdf_defs, flow_defs, options, seed, n=200_000):
    p = pdf(pdf_defs, flow_defs, options_overwrite=options)
    params = p.init_params(seed=seed)
    samples, _, _, _ = jax.jit(
        lambda pp, k: p.sample(pp, k, samplesize=n))(params,
                                                     jax.random.PRNGKey(seed))
    return float(np.asarray(samples[:, 0]).mean())


def main():
    center = {"g": {"center_mean": 1}}
    rows = []
    for flow_defs in ["g", "gg"]:
        m_plain = sample_mean("e1", flow_defs, {}, seed=3)
        m_center = sample_mean("e1", flow_defs, center, seed=3)
        rows.append((flow_defs, m_plain, m_center))

    print(f"{'flow':>6} {'mean (plain)':>14} {'mean (center_mean=1)':>22}")
    for flow_defs, m_plain, m_center in rows:
        print(f"{flow_defs:>6} {m_plain:>14.4f} {m_center:>22.4f}")
    print("\nWith center_mean=1 the last KDE mean is tied so the logistic "
          "mixture is zero-mean, pulling the flow's output mean toward the "
          "trainable offset (0 at init).")


if __name__ == "__main__":
    main()
