"""Multi-device hardening tests on the 8-virtual-device CPU mesh.

Covers the SURVEY section 5 "distributed communication backend" deliverables
beyond the basic 1-D sharding already tested in test_inference.py:
2-D DCN x ICI meshes, the jax.distributed entry point, globally-reducing SMC
resampling under a sharded particle axis, and orbax checkpointing of sharded
sampler state.
"""
import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from jammy_flows_tpu import pdf
from jammy_flows_tpu.inference import hmc as hmc_mod
from jammy_flows_tpu.inference import smc as smc_mod
from jammy_flows_tpu.parallel import mesh as mesh_mod
from jammy_flows_tpu.utils import checkpoint


def test_initialize_distributed_single_process():
    """The multi-host entry point is a graceful no-op on a single host."""
    assert mesh_mod.initialize_distributed() is False
    assert jax.process_count() == 1


def test_2d_mesh_flagship_training_step():
    """DCN x ICI 2-D mesh: flagship conditional NLL + grad, batch sharded
    over BOTH axes, matches the unsharded result."""
    assert len(jax.devices()) >= 8
    mesh = mesh_mod.make_2d_mesh(2, 4)
    assert mesh.axis_names == ("dcn", "ici")

    p = pdf("e4+s2+e4", "gggg+f+gggg", conditional_input_dim=3)
    params = p.init_params(seed=0)
    rows = 64
    x = jnp.zeros((rows, p.total_target_dim), jnp.float64)
    lo, hi = p.target_dim_indices[1]
    x = x.at[:, lo].set(1.0).at[:, lo + 1].set(1.0)
    ci = jnp.ones((rows, 3), jnp.float64)

    def loss(pp, xx, cc):
        return -p.log_prob(pp, xx, conditional_input=cc)[0].mean()

    vg = jax.jit(jax.value_and_grad(loss))
    l1, g1 = vg(params, x, ci)

    repl = NamedSharding(mesh, P())
    shard = NamedSharding(mesh, P(("dcn", "ici")))
    params_r = jax.tree.map(lambda a: jax.device_put(a, repl), params)
    l2, g2 = vg(params_r, jax.device_put(x, shard), jax.device_put(ci, shard))
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-12)
    for k in g1:
        np.testing.assert_allclose(np.asarray(g1[k]), np.asarray(g2[k]),
                                   atol=1e-10)


def test_sharded_sampling_matches_unsharded():
    """PDF.sample under a sharded conditional input (routing through the
    column dispatcher) matches the unsharded draw: same keys -> same base
    samples -> identical targets and log-pdfs up to reduction order
    (VERDICT r3 item 7)."""
    assert len(jax.devices()) >= 8
    mesh = mesh_mod.make_mesh(8, axis_name="data")
    p = pdf("e4+s2+e4", "gggg+f+gggg", conditional_input_dim=3)
    params = p.init_params(seed=0)
    rows = 64
    ci = jnp.asarray(np.random.default_rng(5).normal(size=(rows, 3)))

    def draw(pp, cc):
        return p.sample(pp, jax.random.PRNGKey(11), samplesize=rows,
                        conditional_input=cc)

    x1, z1, lp1, lpb1 = jax.jit(draw)(params, ci)

    repl = NamedSharding(mesh, P())
    shard = NamedSharding(mesh, P("data"))
    params_r = jax.tree.map(lambda a: jax.device_put(a, repl), params)
    x2, z2, lp2, lpb2 = jax.jit(draw)(params_r, jax.device_put(ci, shard))

    np.testing.assert_allclose(np.asarray(z1), np.asarray(z2), atol=1e-12)
    np.testing.assert_allclose(np.asarray(x1), np.asarray(x2), atol=1e-9)
    np.testing.assert_allclose(np.asarray(lp1), np.asarray(lp2), atol=1e-8)
    np.testing.assert_allclose(np.asarray(lpb1), np.asarray(lpb2), atol=1e-9)


def test_smc_sharded_particles_match_unsharded():
    """Systematic resampling with the particle axis sharded over the mesh:
    the weight normalization / CDF / searchsorted reduce globally, so the
    sharded run must match the unsharded run bit-for-bit (same keys)."""
    assert len(jax.devices()) >= 8
    mesh = mesh_mod.make_mesh(8, axis_name="particles")

    def target(x):
        mean = jnp.array([2.0, -1.0])
        return jnp.sum(-0.5 * (x - mean)**2 - 0.9189385332046727, axis=-1)

    n = 2048
    init = jax.random.normal(jax.random.PRNGKey(3), (n, 2), jnp.float64)

    run = jax.jit(lambda ip, k: smc_mod.run_smc(
        target, k, num_particles=n, dim=2, num_temps=12, mutation_steps=2,
        dtype=jnp.float64, initial_particles=ip))

    pa, lwa, lza, essa = run(init, jax.random.PRNGKey(4))
    init_sharded = mesh_mod.shard_batch(mesh, init)
    pb, lwb, lzb, essb = run(init_sharded, jax.random.PRNGKey(4))

    np.testing.assert_allclose(np.asarray(pa), np.asarray(pb), atol=1e-9)
    np.testing.assert_allclose(np.asarray(lwa), np.asarray(lwb), atol=1e-9)
    np.testing.assert_allclose(float(lza), float(lzb), atol=1e-9)
    # and the answer is actually right
    w = np.exp(np.asarray(lwb) - np.asarray(lwb).max())
    w /= w.sum()
    mean = (np.asarray(pb) * w[:, None]).sum(0)
    np.testing.assert_allclose(mean, [2.0, -1.0], atol=0.15)
    assert abs(float(lzb)) < 0.2


def test_checkpoint_sharded_sampler_state(tmp_path):
    """Orbax checkpoint/restore of SHARDED sampler state: chain positions
    sharded over the mesh, step size / mass matrix replicated.  Restore
    must reproduce values AND shardings."""
    assert len(jax.devices()) >= 8
    mesh = mesh_mod.make_mesh(8)

    def lp(x):
        return -0.5 * jnp.sum(x**2, axis=-1)

    chains = 32
    init = jax.random.normal(jax.random.PRNGKey(0), (chains, 3), jnp.float64)
    init = mesh_mod.shard_batch(mesh, init)
    samples, stats = jax.jit(lambda i, k: hmc_mod.run_mcmc(
        lp, i, k, num_warmup=50, num_samples=20, algorithm="hmc",
        num_leapfrog=8))(init, jax.random.PRNGKey(1))

    sampler_state = {
        "positions": samples[-1],
        "step_size": stats["step_size"],
        "inv_mass": mesh_mod.replicate(mesh, stats["inv_mass"]),
        "divergences": stats["divergences"],
    }
    p = pdf("e2", "gg")
    params = mesh_mod.replicate(mesh, p.init_params(seed=0))

    path = str(tmp_path / "ckpt")
    checkpoint.save(path, params, extra_state=sampler_state)

    like_state = jax.tree.map(jnp.zeros_like, sampler_state)
    params2, state2 = checkpoint.restore(path, like_params=jax.tree.map(
        jnp.zeros_like, params), like_extra_state=like_state)
    for k in params:
        np.testing.assert_array_equal(np.asarray(params[k]),
                                      np.asarray(params2[k]))
    np.testing.assert_array_equal(np.asarray(sampler_state["positions"]),
                                  np.asarray(state2["positions"]))
    # shardings survive the roundtrip (like-pytrees carry NamedShardings)
    assert state2["positions"].sharding == sampler_state["positions"].sharding
    assert params2["flow_0"].sharding == params["flow_0"].sharding


def test_two_process_training_matches_single():
    """REAL multi-process execution (VERDICT r2 item 3): two spawned
    processes with 2 virtual CPU devices each join a jax.distributed
    cluster, run initialize_distributed -> make_mesh(4) -> replicate /
    shard_batch (the make_array_from_process_local_data branches,
    parallel/mesh.py:56-108) -> two data-parallel Adam steps, and the
    losses/parameters must match a single-process run."""
    import json
    import pathlib
    import socket
    import subprocess
    import sys

    import optax

    # free port for the coordinator
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    coord = f"127.0.0.1:{port}"

    worker = pathlib.Path(__file__).parent / "_mp_worker.py"
    outdir = pathlib.Path(__file__).parent / ".mp_out"
    outdir.mkdir(exist_ok=True)
    env = {k: v for k, v in __import__("os").environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    procs, outs = [], []
    for pid in range(2):
        out = outdir / f"worker_{pid}.json"
        out.unlink(missing_ok=True)
        outs.append(out)
        procs.append(subprocess.Popen(
            [sys.executable, str(worker), str(pid), "2", coord, str(out)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT))
    logs = []
    for pr in procs:
        stdout, _ = pr.communicate(timeout=600)
        logs.append(stdout.decode())
    for pr, log in zip(procs, logs):
        assert pr.returncode == 0, log[-3000:]

    results = [json.loads(o.read_text()) for o in outs]
    # both processes observe the identical global loss / updated params
    assert abs(results[0]["loss"] - results[1]["loss"]) < 1e-12
    assert abs(results[0]["param_l1"] - results[1]["param_l1"]) < 1e-9

    # single-process reference: same pdf, same global data, same 2 steps
    from jammy_flows_tpu import pdf as jpdf

    p = jpdf("e2+s1", "gg+m", conditional_input_dim=2)
    params = p.init_params(seed=0, dtype=jnp.float64)
    rng = np.random.default_rng(7)
    data = rng.normal(size=(32, p.total_target_dim))
    data[:, 2] = np.mod(data[:, 2], 2 * np.pi)
    ci = rng.normal(size=(32, 2))
    data, ci = jnp.asarray(data), jnp.asarray(ci)
    opt = optax.adam(1e-2)

    def step(pp, st):
        l, g = jax.value_and_grad(
            lambda q: -p.log_prob(q, data, conditional_input=ci)[0].mean())(pp)
        u, st = opt.update(g, st)
        return optax.apply_updates(pp, u), st, l

    st = opt.init(params)
    params, st, loss1 = step(params, st)
    _, _, loss2 = step(params, st)
    flat = np.concatenate([np.asarray(v).ravel()
                           for v in jax.tree.leaves(params)])

    assert abs(float(loss1) - results[0]["loss"]) < 1e-10, \
        (float(loss1), results[0]["loss"])
    assert abs(float(loss2) - results[0]["loss2"]) < 1e-10, \
        (float(loss2), results[0]["loss2"])
    np.testing.assert_allclose(flat[:5], results[0]["param_head"],
                               atol=1e-10)


def test_scaling_bench_two_process():
    """scaling_bench's multi-host mode executes for real: 2 processes x 2
    virtual devices, tiny config, weak-scaling branch with process-aware
    make_mesh sizes."""
    import pathlib
    import socket
    import subprocess
    import sys

    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    coord = f"127.0.0.1:{port}"

    bench = pathlib.Path(__file__).parent.parent / "scaling_bench.py"
    env = {k: v for k, v in __import__("os").environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    procs = []
    for pid in range(2):
        procs.append(subprocess.Popen(
            [sys.executable, str(bench), "--virtual", "2", "--tiny",
             "--batch-per-device", "256", "--coordinator", coord,
             "--num-processes", "2", "--process-id", str(pid)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT))
    logs = []
    for pr in procs:
        stdout, _ = pr.communicate(timeout=600)
        logs.append(stdout.decode())
    for pr, log in zip(procs, logs):
        assert pr.returncode == 0, log[-3000:]
    # process 0 prints the JSON summary of the multi-host branch
    assert '"efficiency"' in logs[0], logs[0][-2000:]


def test_two_process_elastic_kill_and_resume(tmp_path):
    """Elastic recovery (SURVEY section 5 / VERDICT r4 item 6): a 2-process
    data-parallel run loses process 1 ABRUPTLY (os._exit mid-job, after an
    orbax checkpoint); the survivor blocks in its next collective and is
    reaped; a FRESH 2-process cluster restores params + optimizer state
    from the checkpoint and continues — and the continued loss trajectory
    must rejoin the uninterrupted single-process run exactly."""
    import json
    import pathlib
    import socket
    import subprocess
    import sys
    import time

    import optax

    def free_port():
        s = socket.socket()
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
        s.close()
        return port

    worker = pathlib.Path(__file__).parent / "_mp_elastic_worker.py"
    ckpt_dir = str(tmp_path / "elastic_ckpt")
    env = {k: v for k, v in __import__("os").environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    total_steps, kill_after = 8, 3

    def spawn(phase, coord):
        procs, outs = [], []
        for pid in range(2):
            out = tmp_path / f"elastic_{phase}_{pid}.jsonl"
            outs.append(out)
            procs.append(subprocess.Popen(
                [sys.executable, str(worker), str(pid), "2", coord,
                 str(out), ckpt_dir, phase, str(total_steps),
                 str(kill_after)],
                env=env, stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT))
        return procs, outs

    # phase A: victim dies after the step-3 checkpoint
    procs, outs = spawn("kill", f"127.0.0.1:{free_port()}")
    assert procs[1].wait(timeout=600) == 17          # abrupt exit observed
    # the survivor is now stuck in a collective against a dead peer (or
    # about to be): give it a moment, then reap it like a job scheduler
    time.sleep(2)
    assert procs[0].poll() is None or procs[0].returncode != 0 or \
        "finished" not in outs[0].read_text()
    procs[0].kill()
    procs[0].wait(timeout=60)

    lines0 = [json.loads(ln) for ln in outs[0].read_text().splitlines()]
    losses_a = {d["step"]: d["loss"] for d in lines0 if "step" in d}
    assert set(losses_a) == set(range(kill_after + 1))
    assert pathlib.Path(ckpt_dir).exists(), "checkpoint missing"

    # phase B: fresh cluster, restore, continue
    procs, outs = spawn("resume", f"127.0.0.1:{free_port()}")
    logs = []
    for pr in procs:
        stdout, _ = pr.communicate(timeout=600)
        logs.append(stdout.decode())
    for pr, log in zip(procs, logs):
        assert pr.returncode == 0, log[-3000:]
    linesb = [json.loads(ln) for ln in outs[0].read_text().splitlines()]
    losses_b = {d["step"]: d["loss"] for d in linesb if "step" in d}
    assert set(losses_b) == set(range(kill_after + 1, total_steps))

    # uninterrupted single-process reference
    p = pdf("e2+s1", "gg+m", conditional_input_dim=2)
    params = p.init_params(seed=0, dtype=jnp.float64)
    rng = np.random.default_rng(7)
    data = rng.normal(size=(32, p.total_target_dim))
    data[:, 2] = np.mod(data[:, 2], 2 * np.pi)
    ci = rng.normal(size=(32, 2))
    data, ci = jnp.asarray(data), jnp.asarray(ci)
    opt = optax.adam(1e-2)

    def step(pp, st):
        l, g = jax.value_and_grad(
            lambda q: -p.log_prob(q, data, conditional_input=ci)[0].mean())(pp)
        u, st = opt.update(g, st)
        return optax.apply_updates(pp, u), st, l

    st = opt.init(params)
    ref = {}
    for i in range(total_steps):
        params, st, l = step(params, st)
        ref[i] = float(l)

    for i in range(kill_after + 1):
        assert abs(losses_a[i] - ref[i]) < 1e-10, (i, losses_a[i], ref[i])
    # the resumed trajectory REJOINS the uninterrupted run
    for i in range(kill_after + 1, total_steps):
        assert abs(losses_b[i] - ref[i]) < 1e-10, (i, losses_b[i], ref[i])
