"""Sharded Bayesian inference over a flow posterior: NUTS + SMC + VI.

Demonstrates the inference engine (new vs the reference): the flow log_prob
feeds NUTS chains and SMC particles sharded over every available device.
"""
import numpy as np
import jax
import jax.numpy as jnp

from jammy_flows_tpu import pdf
from jammy_flows_tpu.inference import hmc, smc, vi
from jammy_flows_tpu.parallel import mesh


def main():
    # a flow-shaped target: fit a flow, then treat its log_prob as the target
    p = pdf("e2", "gg")
    params = p.init_params(seed=3)

    def logprob_fn(x):
        return p.log_prob(params, x)[0]

    devices = jax.devices()
    print(f"{len(devices)} device(s): {devices[0].platform}")
    m = mesh.make_mesh(len(devices))

    # ---- NUTS, chains sharded over the mesh ----
    chains = 8 * len(devices)
    init = jax.random.normal(jax.random.PRNGKey(0), (chains, 2))
    init = mesh.shard_batch(m, init)
    samples, stats = jax.jit(lambda i, k: hmc.run_mcmc(
        logprob_fn, i, k, num_warmup=300, num_samples=500,
        algorithm="nuts"))(init, jax.random.PRNGKey(1))
    flat = np.asarray(samples).reshape(-1, 2)
    print("NUTS mean:", flat.mean(0), " accept:", float(stats["mean_accept"]))

    # ---- SMC from N(0,I) to the target ----
    particles, log_w, log_z, ess = jax.jit(lambda k: smc.run_smc(
        logprob_fn, k, num_particles=4096, dim=2))(jax.random.PRNGKey(2))
    print("SMC logZ estimate:", float(log_z), " final ESS:", float(ess[-1]))

    # ---- VI: fit a fresh flow to the target by ELBO ----
    q = pdf("e2", "t", options_overwrite={"t": {"cov_type": "full"}})
    q_params = q.init_params(seed=1)
    q_params, hist = vi.fit_vi(q, q_params, jax.random.PRNGKey(3), logprob_fn,
                               num_steps=300, learning_rate=3e-2)
    print(f"VI ELBO: {float(hist[0]):.3f} -> {float(hist[-1]):.3f}")


if __name__ == "__main__":
    main()
