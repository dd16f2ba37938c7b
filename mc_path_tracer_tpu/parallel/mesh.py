"""Mesh construction helpers.

The reference is single-GPU (SURVEY.md §2h); multi-chip execution is a new,
first-class capability here: pixel tiles shard across a `tiles` mesh axis
(the natural data-parallel axis of a path tracer — the film), the scene/BVH
stay replicated per device, and parameter gradients all-reduce over ICI.
Multi-host extends the same mesh over DCN via jax.distributed.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

TILE_AXIS = "tiles"


def make_mesh(n_devices: int | None = None, devices=None) -> Mesh:
    """1-D mesh over the film-tile axis (covers DP across chips and hosts;
    ICI within a slice, DCN across hosts when jax.distributed is active)."""
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (TILE_AXIS,))


def tile_sharding(mesh: Mesh) -> NamedSharding:
    """Rows-of-pixels sharding: leading axis split over the tile axis."""
    return NamedSharding(mesh, P(TILE_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def init_distributed(coordinator: str | None = None, num_processes: int | None = None,
                     process_id: int | None = None) -> None:
    """Multi-host bring-up (jax.distributed); no-op when single-process."""
    if num_processes is None or num_processes <= 1:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
    )
