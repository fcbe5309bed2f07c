"""Device mesh construction and sharding helpers.

Replaces reference train.py:58-86 (world-size resolution, mp.spawn,
init_process_group) — in JAX's single-controller model there is nothing to
spawn; we build a Mesh over the visible devices and annotate shardings.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


DATA_AXIS = "data"
SPATIAL_AXIS = "spatial"


def make_mesh(n_devices: Optional[int] = None, devices=None) -> Mesh:
    """1-D data-parallel mesh (the reference's only parallelism strategy,
    SURVEY.md section 2.9). `n_devices=None` uses every visible device."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        assert len(devices) >= n_devices, (
            f"need {n_devices} devices, have {len(devices)}"
        )
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def make_mesh_2d(data: int, spatial: int, devices=None) -> Mesh:
    """(data x spatial) mesh for combined data + spatial parallelism.

    Beyond-reference capability: sharding the BEV raster's H axis over the
    'spatial' axis splits each convolution spatially across chips — XLA's
    SPMD partitioner inserts the halo exchanges — which is the TPU-native
    answer to the reference's only knob for larger detection areas
    (editing boundary/DISCRETIZATION constants, SURVEY.md section 5
    "long-context" row).
    """
    if devices is None:
        devices = jax.devices()
    assert len(devices) >= data * spatial, (
        f"need {data * spatial} devices, have {len(devices)}"
    )
    arr = np.asarray(devices[: data * spatial]).reshape(data, spatial)
    return Mesh(arr, (DATA_AXIS, SPATIAL_AXIS))


def batch_sharding(mesh: Mesh, axis: int = 0) -> NamedSharding:
    """Batch-axis sharding over the data axis — replaces DistributedSampler
    (kitti_dataloader.py:27-28). `axis` selects which dim is the batch (1
    for (S, B, ...) gradient-accumulation stacks)."""
    return NamedSharding(mesh, P(*([None] * axis), DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch, axis: int = 0):
    """Place a host pytree with its batch axis split across the mesh.

    Multi-host: each process passes its LOCAL slice of the global batch (the
    sampler's process sharding delivers disjoint samples per host,
    data/loader.py EpochSampler) and the pieces assemble into one global
    array over the full mesh — the jax analog of DistributedSampler + DDP
    (reference train.py:58-86)."""
    s = batch_sharding(mesh, axis)
    if jax.process_count() > 1:
        return jax.tree_util.tree_map(
            lambda x: jax.make_array_from_process_local_data(s, np.asarray(x)),
            batch,
        )
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, s), batch)


def replicate(mesh: Mesh, tree):
    """Replicate a pytree (params, opt state) across the mesh."""
    s = replicated(mesh)
    if jax.process_count() > 1:
        # every process holds the full (identical) value
        return jax.tree_util.tree_map(
            lambda x: jax.make_array_from_process_local_data(s, np.asarray(x)),
            tree,
        )
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, s), tree)


def maybe_init_distributed() -> bool:
    """Multi-host launch glue (reference dist.init_process_group,
    train.py:82-83 -> jax.distributed.initialize, SURVEY.md section 2.8).

    Gated on SFA3D_DIST=1 so single-host runs never touch the coordinator.
    On Cloud TPU pods `jax.distributed.initialize()` auto-detects; elsewhere
    set SFA3D_COORDINATOR / SFA3D_NUM_PROCESSES / SFA3D_PROCESS_ID (or pass
    the standard JAX env vars). Call BEFORE any other jax API.
    """
    import os

    if not os.environ.get("SFA3D_DIST"):
        return False
    kw = {}
    if os.environ.get("SFA3D_COORDINATOR"):
        kw["coordinator_address"] = os.environ["SFA3D_COORDINATOR"]
    if os.environ.get("SFA3D_NUM_PROCESSES"):
        kw["num_processes"] = int(os.environ["SFA3D_NUM_PROCESSES"])
    if os.environ.get("SFA3D_PROCESS_ID"):
        kw["process_id"] = int(os.environ["SFA3D_PROCESS_ID"])
    jax.distributed.initialize(**kw)
    return True
