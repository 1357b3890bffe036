"""Device mesh + sharding for data-parallel training and sampling.

The reference's only parallelism is single-node multi-GPU PyG DataParallel
(utils/utils.py:285-287): graph lists scattered across devices, outputs
gathered on device 0. The TPU-native equivalent (BASELINE.json north star)
is a single jitted program, data-parallel over the pose/complex axis via
``jax.sharding``: parameters replicated, batches sharded over the 'data'
mesh axis, gradient reductions compiled to psums over ICI by XLA. Multi-host
runs use the standard JAX multi-controller setup (jax.distributed) with the
same code path.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, axis_name: str = "data") -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis_name,))


def batch_sharding(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    """Shard the leading (pose/complex) axis across the mesh."""
    return NamedSharding(mesh, P(axis_name))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch, axis_name: str = "data"):
    """Place a ComplexBatch with its leading axis sharded over the mesh."""
    sh = batch_sharding(mesh, axis_name)
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)


def replicate(mesh: Mesh, tree):
    sh = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)
