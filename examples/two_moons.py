"""Fit a Gaussianization flow to the two-moons density and visualize it.

TPU-native counterpart of the reference examples/jammy_flows.py Euclidean
demo.  Runs on TPU or CPU (set JAX_PLATFORMS=cpu before running for CPU).
"""
import numpy as np
import jax
import jax.numpy as jnp
import optax

from jammy_flows_tpu import pdf


def two_moons(n, rng):
    t = rng.uniform(0, np.pi, n)
    x1 = np.stack([np.cos(t), np.sin(t)], 1) + rng.normal(0, 0.1, (n, 2))
    x2 = np.stack([1 - np.cos(t), 0.5 - np.sin(t)], 1) + rng.normal(0, 0.1, (n, 2))
    return np.concatenate([x1, x2])


def main():
    rng = np.random.default_rng(0)
    data = jnp.asarray(two_moons(2000, rng), dtype=jnp.float32)

    p = pdf("e2", "gggg")
    # data-driven init: percentile KDE means + PCA rotation
    params = p.init_params(seed=0, dtype=jnp.float32, data=np.asarray(data))

    opt = optax.adam(1e-2)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state, batch):
        loss, grads = jax.value_and_grad(
            lambda pp: -p.log_prob(pp, batch)[0].mean())(params)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    for i in range(300):
        params, opt_state, loss = step(params, opt_state, data)
        if i % 50 == 0:
            print(f"iter {i:4d}  NLL {float(loss):.4f}")
    print(f"final NLL {float(loss):.4f}")

    # visualize
    from jammy_flows_tpu.utils import plotting
    fig = plotting.visualize_pdf(p, params, key=jax.random.PRNGKey(1),
                                 samplesize=5000)
    fig.savefig("two_moons_fit.png", dpi=120)
    print("wrote two_moons_fit.png")


if __name__ == "__main__":
    main()
