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


def make_mesh(n_devices=None, axis_name="chains", devices=None):
    """1-D mesh over the first n_devices devices."""
    devs = list(devices if devices is not None else jax.devices())
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), axis_names=(axis_name,))


def make_2d_mesh(dcn_size, ici_size, axis_names=("dcn", "ici"), devices=None):
    """2-D mesh: outer (inter-host DCN) x inner (intra-slice ICI) axes."""
    devs = np.array(devices if devices is not None else jax.devices())
    devs = devs[:dcn_size * ici_size].reshape(dcn_size, ici_size)
    return Mesh(devs, axis_names=axis_names)


def shard_batch(mesh, arr, axis_name=None):
    """Place arr with its leading axis sharded over the mesh."""
    axis_name = axis_name or mesh.axis_names[0]
    return jax.device_put(arr, NamedSharding(mesh, P(axis_name)))


def replicate(mesh, tree):
    """Replicate a pytree (parameters) over the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda a: jax.device_put(a, sharding), tree)
