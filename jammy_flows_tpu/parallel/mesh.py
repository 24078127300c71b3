"""Device-mesh helpers for chain/particle/batch-parallel inference.

The framework's scaling strategy (SURVEY.md section 5): parameters are tiny
(<= a few M) so they replicate; batch/chain/particle axes shard over the mesh
and XLA inserts the psum/all_gather collectives for the cross-chain
reductions (adaptation statistics, SMC weight normalizations) over ICI.

Multi-host: call jax.distributed.initialize() before building the mesh; the
same NamedSharding code then spans hosts (DCN axis first in the mesh shape).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize_distributed(coordinator_address=None, num_processes=None,
                           process_id=None, strict=False):
    """Multi-host entry point: wire up jax.distributed before building any
    mesh (SURVEY.md section 5 "distributed communication backend").

    On managed platforms (TPU pods, SLURM, GKE) jax auto-detects everything,
    so call with no arguments on every process.  Explicit coordinator args
    are forwarded for manual clusters.  Returns True when a multi-process
    runtime is (already or now) initialized, False when running single-
    process and auto-detection found no cluster (raises instead when
    strict=True).  Idempotent.
    """
    # do NOT probe jax.process_count() here: it initializes the XLA backend,
    # after which jax.distributed.initialize() refuses to run (found by the
    # 2-process test, tests/test_parallel.py)
    if jax.distributed.is_initialized():
        return jax.process_count() > 1
    try:
        kwargs = {}
        if coordinator_address is not None:
            kwargs.update(coordinator_address=coordinator_address,
                          num_processes=num_processes, process_id=process_id)
        jax.distributed.initialize(**kwargs)
        return jax.process_count() > 1
    except (RuntimeError, ValueError) as e:
        if strict:
            raise
        # single-process environment without cluster env vars: fine
        return False


def make_mesh(n_devices=None, axis_name="chains", devices=None):
    """1-D mesh over the first n_devices devices.

    Multi-process: devices are taken evenly from every process (the first
    ``n_devices // process_count`` local devices of each), so every process
    can address its share of the mesh — a prefix of ``jax.devices()`` would
    leave some processes without any addressable device.
    """
    if devices is None:
        if jax.process_count() > 1 and n_devices is not None:
            per_proc, rem = divmod(n_devices, jax.process_count())
            if per_proc == 0 or rem:
                raise ValueError(
                    f"n_devices={n_devices} must be a multiple of "
                    f"process_count={jax.process_count()} on multi-host")
            devs = []
            for pidx in range(jax.process_count()):
                devs += [d for d in jax.devices()
                         if d.process_index == pidx][:per_proc]
        else:
            devs = list(jax.devices())[:n_devices]
    else:
        devs = list(devices)[:n_devices]
    return Mesh(np.array(devs), axis_names=(axis_name,))


def make_2d_mesh(dcn_size, ici_size, axis_names=("dcn", "ici"), devices=None):
    """2-D mesh: outer (inter-host DCN) x inner (intra-slice ICI) axes."""
    devs = np.array(devices if devices is not None else jax.devices())
    devs = devs[:dcn_size * ici_size].reshape(dcn_size, ici_size)
    return Mesh(devs, axis_names=axis_names)


def shard_batch(mesh, arr, axis_name=None):
    """Place arr with its leading axis sharded over the mesh.

    Single-process: ``arr`` is the global batch (device_put slices it).
    Multi-process: ``arr`` is this process's LOCAL shard — the global array
    is assembled with ``jax.make_array_from_process_local_data`` because
    device_put cannot target non-addressable devices.
    """
    axis_name = axis_name or mesh.axis_names[0]
    sharding = NamedSharding(mesh, P(axis_name))
    if jax.process_count() > 1:
        return jax.make_array_from_process_local_data(
            sharding, np.asarray(arr))
    return jax.device_put(arr, sharding)


def replicate(mesh, tree):
    """Replicate a pytree (parameters) over the mesh.

    Multi-process: every process must hold identical values (true for
    seed-deterministic init); the fully-replicated global array is built
    from each process's local copy.
    """
    sharding = NamedSharding(mesh, P())
    if jax.process_count() > 1:
        return jax.tree.map(
            lambda a: jax.make_array_from_process_local_data(
                sharding, np.asarray(a)), tree)
    return jax.tree.map(lambda a: jax.device_put(a, sharding), tree)
