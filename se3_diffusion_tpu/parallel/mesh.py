"""Device mesh + sharding helpers.

The model family is ~17M params with O(B N^2) activations, so the
parallelism that matters is data parallelism over ICI (the reference's
only strategy is NCCL DDP, SURVEY.md section 2.9); params are replicated
and the batch is sharded over the 'dp' axis. The mesh is still built
2D ('dp', 'sp') so the [N, N] pair dimension can be sharded for long
sequences without re-plumbing callers.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DP_AXIS = "dp"
SP_AXIS = "sp"


def create_mesh(
    devices: Optional[Sequence[jax.Device]] = None, sp_size: int = 1
) -> Mesh:
    """Builds a ('dp', 'sp') mesh over the given (default: all) devices."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if n % sp_size != 0:
        raise ValueError(f"{n} devices not divisible by sp_size={sp_size}")
    arr = np.asarray(devices).reshape(n // sp_size, sp_size)
    return Mesh(arr, (DP_AXIS, SP_AXIS))


def batch_spec() -> P:
    """Batch dims sharded over dp, everything else replicated."""
    return P(DP_AXIS)


def replicated_spec() -> P:
    return P()


def shard_batch(mesh: Mesh, batch):
    """Places a host batch with leading dim sharded over dp."""
    sharding = NamedSharding(mesh, P(DP_AXIS))
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), batch
    )


def replicate(mesh: Mesh, tree):
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)
