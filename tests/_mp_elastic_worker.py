"""Worker for the elastic-recovery test
(tests/test_parallel.py::test_two_process_elastic_kill_and_resume).

Phase "kill": joins a 2-process cluster, trains data-parallel, saves an
orbax checkpoint (params + optimizer state) after `kill_after` steps, then
process 1 dies ABRUPTLY (os._exit) mid-job — the survivor blocks in its
next collective and is reaped by the parent, exactly like a host failure
on a pod.

Phase "resume": a FRESH 2-process cluster restores the checkpoint
(utils/checkpoint.py, orbax) and continues training to `total_steps`;
per-step losses stream to the out file so the parent can assert the
trajectory rejoins the single-process reference.

Usage: python _mp_elastic_worker.py <process_id> <num_processes>
       <coordinator> <out_jsonl> <ckpt_dir> <phase> <total_steps>
       <kill_after>
"""
import json
import os
import pathlib
import sys

proc_id, nproc = int(sys.argv[1]), int(sys.argv[2])
coord, out_path, ckpt_dir = sys.argv[3], sys.argv[4], sys.argv[5]
phase, total_steps, kill_after = sys.argv[6], int(sys.argv[7]), \
    int(sys.argv[8])

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
import optax  # noqa: E402

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
from jammy_flows_tpu import pdf  # noqa: E402
from jammy_flows_tpu.parallel import mesh as mesh_mod  # noqa: E402
from jammy_flows_tpu.utils import checkpoint  # noqa: E402

ok = mesh_mod.initialize_distributed(coordinator_address=coord,
                                     num_processes=nproc,
                                     process_id=proc_id, strict=True)
assert ok and jax.process_count() == nproc
mesh = mesh_mod.make_mesh(2 * nproc)

p = pdf("e2+s1", "gg+m", conditional_input_dim=2)
params_host = p.init_params(seed=0, dtype=jnp.float64)

rng = np.random.default_rng(7)
n_global = 32
data_g = rng.normal(size=(n_global, p.total_target_dim))
data_g[:, 2] = np.mod(data_g[:, 2], 2 * np.pi)
ci_g = rng.normal(size=(n_global, 2))
rows = n_global // nproc
lo = proc_id * rows
batch = mesh_mod.shard_batch(mesh, data_g[lo:lo + rows])
ci = mesh_mod.shard_batch(mesh, ci_g[lo:lo + rows])

opt = optax.adam(1e-2)


@jax.jit
def step(pp, st, bb, cc):
    l, g = jax.value_and_grad(
        lambda q: -p.log_prob(q, bb, conditional_input=cc)[0].mean())(pp)
    u, st = opt.update(g, st)
    return optax.apply_updates(pp, u), st, l


out = open(out_path, "a")


def log_step(i, loss):
    out.write(json.dumps({"step": i, "loss": float(loss)}) + "\n")
    out.flush()


if phase == "kill":
    params_r = mesh_mod.replicate(mesh, params_host)
    st = jax.jit(opt.init)(params_r)
    for i in range(total_steps):
        params_r, st, loss = step(params_r, st, batch, ci)
        log_step(i, loss)
        if i == kill_after:
            checkpoint.save(ckpt_dir, params_r,
                            extra_state={"opt": st, "step": mesh_mod.replicate(
                                mesh, jnp.asarray(i))})
            if proc_id == 1:
                out.write(json.dumps({"killed_after": i}) + "\n")
                out.flush()
                os._exit(17)      # abrupt death: no cleanup, no shutdown
    # the survivor only gets here if the victim never died (test failure)
    out.write(json.dumps({"finished": True}) + "\n")
    out.flush()
else:
    assert phase == "resume"
    like_st = jax.jit(opt.init)(mesh_mod.replicate(mesh, params_host))
    params_r, extra = checkpoint.restore(
        ckpt_dir, like_params=mesh_mod.replicate(mesh, params_host),
        like_extra_state={"opt": like_st,
                          "step": mesh_mod.replicate(mesh,
                                                     jnp.asarray(0))})
    # re-place restored state explicitly: orbax restores scalars created
    # inside jit (e.g. adam's count) without the replicated sharding
    params_r = mesh_mod.replicate(mesh, jax.device_get(params_r))
    st = mesh_mod.replicate(mesh, jax.device_get(extra["opt"]))
    start = int(extra["step"]) + 1
    for i in range(start, total_steps):
        params_r, st, loss = step(params_r, st, batch, ci)
        log_step(i, loss)
    out.write(json.dumps({"finished": True}) + "\n")
    out.flush()
print("worker", proc_id, phase, "ok", flush=True)
