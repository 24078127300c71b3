"""Worker process for the 2-process distributed test
(tests/test_parallel.py::test_two_process_training_matches_single).

Each worker owns 2 virtual CPU devices and joins a 2-process
jax.distributed cluster (4 global devices), then runs the REAL
multi-process code paths: initialize_distributed with explicit coordinator
args, make_mesh's per-process device selection (parallel/mesh.py:56-66),
and the make_array_from_process_local_data branches of shard_batch /
replicate (mesh.py:90-108), followed by one data-parallel Adam step whose
loss/params must match a single-process run bit-for-bit (up to f64
reduction order).

Usage: python _mp_worker.py <process_id> <num_processes> <coordinator>
       <out_json>
"""
import json
import os
import pathlib
import sys

proc_id, nproc = int(sys.argv[1]), int(sys.argv[2])
coord, out_path = sys.argv[3], sys.argv[4]

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

ok = mesh_mod.initialize_distributed(coordinator_address=coord,
                                     num_processes=nproc,
                                     process_id=proc_id, strict=True)
assert ok, "initialize_distributed did not establish a multi-process runtime"
assert jax.process_count() == nproc, jax.process_count()
assert jax.local_device_count() == 2, jax.local_device_count()
assert jax.device_count() == 2 * nproc, jax.device_count()

mesh = mesh_mod.make_mesh(2 * nproc)

p = pdf("e2+s1", "gg+m", conditional_input_dim=2)
params = p.init_params(seed=0, dtype=jnp.float64)

# deterministic GLOBAL batch; each process holds its contiguous local shard
rng = np.random.default_rng(7)
n_global = 32
data_g = rng.normal(size=(n_global, p.total_target_dim))
data_g[:, 2] = np.mod(data_g[:, 2], 2 * np.pi)  # s1 angle in [0, 2pi)
ci_g = rng.normal(size=(n_global, 2))
rows = n_global // nproc
lo = proc_id * rows

params_r = mesh_mod.replicate(mesh, params)
batch = mesh_mod.shard_batch(mesh, data_g[lo:lo + rows])
ci = mesh_mod.shard_batch(mesh, ci_g[lo:lo + rows])

opt = optax.adam(1e-2)


@jax.jit
def step(pp, st, bb, cc):
    l, g = jax.value_and_grad(
        lambda q: -p.log_prob(q, bb, conditional_input=cc)[0].mean())(pp)
    u, st = opt.update(g, st)
    return optax.apply_updates(pp, u), st, l


st = jax.jit(opt.init)(params_r)
new_params, st, loss = step(params_r, st, batch, ci)
loss2 = step(new_params, st, batch, ci)[2]

flat = np.concatenate([np.asarray(jax.device_get(v)).ravel()
                       for v in jax.tree.leaves(new_params)])
result = {"process_id": proc_id,
          "loss": float(loss), "loss2": float(loss2),
          "param_l1": float(np.abs(flat).sum()),
          "param_head": flat[:5].tolist()}
pathlib.Path(out_path).write_text(json.dumps(result))
print("worker", proc_id, "ok", flush=True)
