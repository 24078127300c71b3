"""Inference engine tests: HMC/NUTS/SMC/VI correctness + sharded execution.

These exercise the NEW TPU-side capabilities (no reference counterpart):
posterior-moment recovery on analytic targets within Monte-Carlo error, and
multi-chip execution on a fake 8-device CPU mesh.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from jammy_flows_tpu import pdf
from jammy_flows_tpu.inference import hmc as hmc_mod
from jammy_flows_tpu.inference import smc as smc_mod
from jammy_flows_tpu.inference import vi as vi_mod
from jammy_flows_tpu.parallel import mesh as mesh_mod


def _correlated_gaussian_logprob(x):
    """2-D Gaussian with cov [[1, .8], [.8, 1]]."""
    cov = jnp.array([[1.0, 0.8], [0.8, 1.0]])
    prec = jnp.linalg.inv(cov)
    mean = jnp.array([1.0, -0.5])
    d = x - mean
    return -0.5 * jnp.einsum("ni,ij,nj->n", d, prec, d)


@pytest.mark.parametrize("algorithm", ["hmc", "nuts"])
def test_mcmc_gaussian_moments(algorithm):
    chains = 32
    key = jax.random.PRNGKey(0)
    init = jax.random.normal(key, (chains, 2), dtype=jnp.float64)
    samples, stats = jax.jit(lambda i, k: hmc_mod.run_mcmc(
        _correlated_gaussian_logprob, i, k, num_warmup=300, num_samples=500,
        algorithm=algorithm, num_leapfrog=16))(init, jax.random.PRNGKey(1))
    flat = np.asarray(samples).reshape(-1, 2)
    assert np.isfinite(flat).all()
    np.testing.assert_allclose(flat.mean(0), [1.0, -0.5], atol=0.1)
    np.testing.assert_allclose(np.cov(flat.T), [[1.0, 0.8], [0.8, 1.0]],
                               atol=0.2)
    assert float(stats["mean_accept"]) > 0.5


def test_nuts_funnel_calibration():
    """NUTS on a (mild) Neal funnel: v ~ N(0,1.5^2), x ~ N(0, e^v).

    The funnel's neck/mouth geometry is exactly where an endpoint-only
    U-turn check terminates trajectories late or early; the balanced-subtree
    criterion must recover the analytic v-moments (stronger than a long-run
    HMC comparison, which has its own bias here), with per-chain divergence
    counts exposed.
    """
    def funnel_lp(xs):
        v, x = xs[:, 0], xs[:, 1]
        return (-0.5 * (v / 1.5)**2
                - 0.5 * x**2 * jnp.exp(-v) - 0.5 * v)

    chains = 64
    init = 0.1 * jax.random.normal(jax.random.PRNGKey(0), (chains, 2),
                                   dtype=jnp.float64)
    samples, stats = jax.jit(lambda i, k: hmc_mod.run_mcmc(
        funnel_lp, i, k, num_warmup=600, num_samples=1000,
        algorithm="nuts", max_depth=9, target_accept=0.95))(
            init, jax.random.PRNGKey(1))
    v = np.asarray(samples)[:, :, 0].reshape(-1)
    assert np.isfinite(v).all()
    # analytic: E[v]=0, Var[v]=2.25
    assert abs(v.mean()) < 0.12, v.mean()
    np.testing.assert_allclose(v.var(), 2.25, rtol=0.15)
    div = np.asarray(stats["divergences"])
    assert div.shape == (chains,)
    # mild funnel at 0.95 target accept: divergences must be rare
    assert div.sum() < 0.01 * chains * 1000


def test_nuts_banana_calibration():
    """NUTS on a banana target: x2 = 0.5*(x1^2 - 1) + N(0, 1).

    Analytic moments: E=0 both dims, Var[x1]=1, Var[x2]=0.25*2+1=1.5.
    Curvature makes endpoint-only U-turn checks mis-terminate.  (A stiffer
    banana, sigma=0.5/b=1, undermixes for BOTH hmc and nuts at this sample
    count — 2k-draw moments scatter +-25% around truth with 1-2% divergence
    rates — so it calibrates mixing patience, not the U-turn criterion.)"""
    def banana_lp(xs):
        x1, x2 = xs[:, 0], xs[:, 1]
        return -0.5 * x1**2 - 0.5 * (x2 - 0.5 * (x1**2 - 1.0))**2

    chains = 64
    init = 0.1 * jax.random.normal(jax.random.PRNGKey(2), (chains, 2),
                                   dtype=jnp.float64)
    samples, stats = jax.jit(lambda i, k: hmc_mod.run_mcmc(
        banana_lp, i, k, num_warmup=600, num_samples=1000,
        algorithm="nuts", max_depth=9, target_accept=0.9))(
            init, jax.random.PRNGKey(3))
    flat = np.asarray(samples).reshape(-1, 2)
    assert np.isfinite(flat).all()
    np.testing.assert_allclose(flat.mean(0), [0.0, 0.0], atol=0.1)
    np.testing.assert_allclose(flat[:, 0].var(), 1.0, rtol=0.12)
    np.testing.assert_allclose(flat[:, 1].var(), 1.5, rtol=0.15)
    assert int(stats["total_divergences"]) < 0.01 * chains * 1000


def test_mcmc_over_flow_logprob():
    """Chains over the flow's own log_prob must reproduce flow samples."""
    p = pdf("e2", "gg")
    params = p.init_params(seed=3)

    def lp(x):
        return p.log_prob(params, x)[0]

    init = jax.random.normal(jax.random.PRNGKey(0), (16, 2), dtype=jnp.float64)
    samples, _ = jax.jit(lambda i, k: hmc_mod.run_mcmc(
        lp, i, k, num_warmup=200, num_samples=300, algorithm="hmc",
        num_leapfrog=16))(init, jax.random.PRNGKey(1))
    mcmc_flat = np.asarray(samples).reshape(-1, 2)

    direct, _, _, _ = p.sample(params, jax.random.PRNGKey(2), samplesize=5000)
    direct = np.asarray(direct)
    np.testing.assert_allclose(mcmc_flat.mean(0), direct.mean(0), atol=0.15)
    np.testing.assert_allclose(mcmc_flat.std(0), direct.std(0), atol=0.15)


def test_smc_gaussian():
    """SMC on a normalized shifted Gaussian: logZ ~ 0, moments recovered."""
    def target(x):
        mean = jnp.array([2.0, -1.0])
        return jnp.sum(-0.5 * (x - mean)**2 - 0.9189385332046727, axis=-1)

    particles, log_w, log_z, ess = jax.jit(lambda k: smc_mod.run_smc(
        target, k, num_particles=2048, dim=2, num_temps=16,
        mutation_steps=2, dtype=jnp.float64))(jax.random.PRNGKey(0))
    w = np.exp(np.asarray(log_w) - np.max(np.asarray(log_w)))
    w = w / w.sum()
    mean = (np.asarray(particles) * w[:, None]).sum(0)
    np.testing.assert_allclose(mean, [2.0, -1.0], atol=0.15)
    assert abs(float(log_z)) < 0.2


def test_vi_fits_gaussian():
    """Flow-as-posterior VI on a diagonal Gaussian target."""
    p = pdf("e2", "t", options_overwrite={"t": {"cov_type": "diagonal"}})
    params = p.init_params(seed=0)

    def target(x):
        mean = jnp.array([1.5, -0.5])
        std = jnp.array([0.5, 2.0])
        return jnp.sum(-0.5 * ((x - mean) / std)**2 - jnp.log(std)
                       - 0.9189385332046727, axis=-1)

    params, hist = vi_mod.fit_vi(p, params, jax.random.PRNGKey(0), target,
                                 num_steps=400, num_samples=256,
                                 learning_rate=5e-2)
    assert hist[-1] > hist[0]
    x, _, _, _ = p.sample(params, jax.random.PRNGKey(1), samplesize=8000)
    x = np.asarray(x)
    np.testing.assert_allclose(x.mean(0), [1.5, -0.5], atol=0.1)
    np.testing.assert_allclose(x.std(0), [0.5, 2.0], atol=0.15)
    # ELBO at optimum ~ 0 (KL ~ 0) for a realizable target
    assert float(hist[-1]) > -0.1


def test_vi_conditional_minibatched():
    """Doubly-stochastic amortized VI: conditional rows minibatched per step.

    Target: x | c ~ N(c, 0.7).  The amortized flow must learn the whole
    conditional family from random 64-row minibatches of 512 contexts.
    """
    p = pdf("e1", "t", conditional_input_dim=1,
            options_overwrite={"t": {"cov_type": "diagonal"}})
    params = p.init_params(seed=0)
    ci_all = jnp.linspace(-2.0, 2.0, 512)[:, None]

    def target(x, ci):
        return jnp.sum(-0.5 * ((x - ci) / 0.7)**2 - jnp.log(0.7)
                       - 0.9189385332046727, axis=-1)

    params, hist = vi_mod.fit_vi(p, params, jax.random.PRNGKey(0), target,
                                 num_steps=600, num_samples=64,
                                 learning_rate=3e-2,
                                 conditional_input=ci_all,
                                 minibatch_size=64)
    assert hist[-1] > hist[0]
    ci_fix = jnp.full((8000, 1), 1.3)
    x, _, _, _ = p.sample(params, jax.random.PRNGKey(1),
                          conditional_input=ci_fix)
    x = np.asarray(x)
    np.testing.assert_allclose(x.mean(0), [1.3], atol=0.1)
    np.testing.assert_allclose(x.std(0), [0.7], atol=0.1)


def test_sharded_hmc_recovers_moments():
    """Chains sharded over the 8-device CPU mesh still recover the target.

    (Bitwise equality with the unsharded run is not expected: the sharded
    cross-chain psum changes the reduction order of the adaptation
    statistics, and HMC trajectories are chaotic in the step size.)
    """
    assert len(jax.devices()) >= 8, "conftest must fake 8 devices"
    mesh = mesh_mod.make_mesh(8)
    chains = 32
    init = jax.random.normal(jax.random.PRNGKey(0), (chains, 2),
                             dtype=jnp.float64)
    run = jax.jit(lambda i, k: hmc_mod.run_mcmc(
        _correlated_gaussian_logprob, i, k, num_warmup=300, num_samples=400,
        algorithm="hmc", num_leapfrog=16))

    init_sharded = mesh_mod.shard_batch(mesh, init)
    samples_sharded, stats = run(init_sharded, jax.random.PRNGKey(1))
    flat = np.asarray(samples_sharded).reshape(-1, 2)
    np.testing.assert_allclose(flat.mean(0), [1.0, -0.5], atol=0.12)
    np.testing.assert_allclose(np.cov(flat.T), [[1.0, 0.8], [0.8, 1.0]],
                               atol=0.25)
    assert float(stats["mean_accept"]) > 0.5


def test_sharded_flow_logprob():
    """Flow log_prob with batch sharded over the mesh matches unsharded."""
    mesh = mesh_mod.make_mesh(8)
    p = pdf("e2+s1", "gg+m", conditional_input_dim=2)
    params = p.init_params(seed=0)
    x, _, _, _ = p.sample(params, jax.random.PRNGKey(0),
                          conditional_input=jnp.ones((64, 2)))
    ci = jnp.ones((64, 2))
    lp_fn = jax.jit(lambda pp, xx, cc: p.log_prob(pp, xx, conditional_input=cc)[0])
    lp1 = lp_fn(params, x, ci)
    params_r = mesh_mod.replicate(mesh, params)
    x_s = mesh_mod.shard_batch(mesh, x)
    ci_s = mesh_mod.shard_batch(mesh, ci)
    lp2 = lp_fn(params_r, x_s, ci_s)
    np.testing.assert_allclose(np.asarray(lp1), np.asarray(lp2), atol=1e-10)
