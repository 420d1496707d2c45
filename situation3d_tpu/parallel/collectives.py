"""Named-axis collectives + multi-host initialization.

The "comm module" face of the framework (SURVEY §2.4): thin, typed wrappers
over jax collectives for use inside ``shard_map``/pjit — replacing every
``torch.distributed`` call site of the reference (DDP grad all-reduce
``runner_base.py:89-93``, metric sync ``logger.py:37-49``, retrieval-score
all_reduce ``blip2.py:201-204``, result gathers, barriers). Barriers
disappear entirely: XLA program order is the synchronization.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def initialize_multihost(coordinator_address: Optional[str] = None,
                         num_processes: Optional[int] = None,
                         process_id: Optional[int] = None) -> None:
    """Multi-host (DCN) bring-up: ``jax.distributed.initialize`` with
    explicit or env-derived rendezvous (the dist_utils.init_distributed_mode
    analogue; no NCCL process group, no 365-day timeouts)."""
    kwargs = {}
    if coordinator_address is not None:
        kwargs = dict(coordinator_address=coordinator_address,
                      num_processes=num_processes, process_id=process_id)
    jax.distributed.initialize(**kwargs)


def pmean(x, axis: str = "data"):
    """Gradient/metric averaging across the data axis (DDP all-reduce)."""
    return jax.lax.pmean(x, axis_name=axis)


def psum(x, axis: str = "data"):
    return jax.lax.psum(x, axis_name=axis)


def all_gather(x, axis: str = "data", tiled: bool = False):
    """Cross-device gather (contrastive negatives / eval results;
    concat_all_gather analogue)."""
    return jax.lax.all_gather(x, axis_name=axis, tiled=tiled)


def ppermute_ring(x, axis: str = "data", shift: int = 1):
    """Ring permute over the axis (building block for pipelined exchanges)."""
    n = jax.lax.axis_size(axis)
    perm = [(i, (i + shift) % n) for i in range(n)]
    return jax.lax.ppermute(x, axis_name=axis, perm=perm)


def process_gather_host(x) -> list:
    """Host-side gather of per-process arrays (result-merge helper; the
    rank0-merge of base_task.py:246-271 without barriers)."""
    from jax.experimental import multihost_utils
    return multihost_utils.process_allgather(x)
