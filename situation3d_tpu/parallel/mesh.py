"""Device mesh construction and sharding rules.

The TPU-native replacement for the reference's entire NCCL/DDP stack
(``lavis/common/dist_utils.py:57-86`` init_process_group, DDP wrap at
``runner_base.py:89-93``, DistributedSampler, barriers, all_reduce metric
sync): a ``jax.sharding.Mesh`` over ICI with named axes, data sharded on the
``data`` axis and parameters replicated (extendable to a 2-D
(``data``, ``model``) mesh for tensor parallelism of the T5 — see
models/t5.py). Gradient all-reduce, metric sync and "barriers" all become
XLA collectives inserted by pjit; no process-group code exists.

Multi-host (DCN) extension: call ``jax.distributed.initialize()`` before
``make_mesh`` — device enumeration and the mesh API are unchanged.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from situation3d_tpu.config import MeshConfig


def make_mesh(cfg: MeshConfig, devices: Optional[Sequence] = None) -> Mesh:
    """Build a (data, model) mesh over the available devices."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    mp = max(1, cfg.model_parallel)
    dp = cfg.data_parallel if cfg.data_parallel > 0 else n // mp
    if dp * mp > n:
        raise ValueError(f"mesh {dp}x{mp} > {n} devices")
    # an explicit dp x mp smaller than the host's device count uses the
    # first dp*mp devices (single-host debugging; production leaves
    # data_parallel=-1 to span the slice)
    arr = np.asarray(devices[: dp * mp]).reshape(dp, mp)
    return Mesh(arr, (cfg.data_axis, cfg.model_axis))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over the data axis; replicate the rest."""
    return NamedSharding(mesh, P(mesh.axis_names[0]))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh):
    """Device-put a host batch pytree with the batch axis sharded."""
    s = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, s), batch)
