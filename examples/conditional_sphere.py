"""Conditional directional posterior on S2: the astro-reconstruction toy.

An event with observables `ci` has a true direction on the sphere; the flow
learns p(direction | ci).  Mirrors the reference's conditional workflow
(docs/usage/training.rst) with the s2 `f` flow, and demonstrates coverage
calibration - the core use case of jammy_flows.
"""
import numpy as np
import jax
import jax.numpy as jnp
import optax

from jammy_flows_tpu import pdf


def make_dataset(n, rng):
    """Toy detector: true direction drawn from a vMF around an axis set by
    the (2-d) observable; observable also controls concentration."""
    ci = rng.normal(0, 1, (n, 2))
    axis_theta = np.pi / 2 + 0.5 * np.tanh(ci[:, 0])
    axis_phi = np.pi + 1.0 * np.tanh(ci[:, 1])
    kappa = 20.0 + 10.0 * np.tanh(ci[:, 0] * ci[:, 1])
    # sample around axis with vMF
    from jammy_flows_tpu.utils.vmf_kent import sample_vmf_s2
    dirs = np.stack([
        sample_vmf_s2(np.array([np.sin(t) * np.cos(ph), np.sin(t) * np.sin(ph),
                                np.cos(t)]), k, 1, rng=rng)[0]
        for t, ph, k in zip(axis_theta, axis_phi, kappa)])
    theta = np.arccos(np.clip(dirs[:, 2], -1, 1))
    phi = np.mod(np.arctan2(dirs[:, 1], dirs[:, 0]), 2 * np.pi)
    return (jnp.asarray(ci, jnp.float32),
            jnp.asarray(np.stack([theta, phi], 1), jnp.float32))


def main():
    rng = np.random.default_rng(0)
    ci, labels = make_dataset(4000, rng)

    p = pdf("s2", "ff", conditional_input_dim=2,
            options_overwrite={"f": {"add_vertical_rq_spline_flow": 1,
                                     "add_circular_rq_spline_flow": 1,
                                     "vertical_smooth": 1,
                                     "spline_num_basis_functions": -1}})
    params = p.init_params(seed=0, dtype=jnp.float32)

    opt = optax.adam(1e-3)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state, x, c):
        loss, grads = jax.value_and_grad(
            lambda pp: -p.log_prob(pp, x, conditional_input=c)[0].mean())(params)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    for i in range(500):
        params, opt_state, loss = step(params, opt_state, labels, ci)
        if i % 100 == 0:
            print(f"iter {i:4d}  NLL {float(loss):.4f}")

    # coverage calibration: 2(logp(0)-logp(z)) ~ chi2(2) if calibrated
    cov = p.approximate_coverage(params, labels, conditional_input=ci)
    max_dev = np.max(np.abs(cov["expected"] - cov["true"]["total"]))
    print(f"max coverage deviation from uniform: {max_dev:.3f}")

    # per-event moments: mean direction + vMF kappa
    mm = p.marginal_moments(params, jax.random.PRNGKey(1),
                            conditional_input=ci[:8], samplesize=500)
    print("first event mean angles:", mm["mean_0_angles"][0],
          "kappa:", mm["varlike_0"][0])


if __name__ == "__main__":
    main()
