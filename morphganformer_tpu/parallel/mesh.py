"""Device-mesh helpers (SURVEY.md §2.8: DP over ICI replaces DDP/NCCL)."""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_data_mesh(devices=None) -> Mesh:
    """1-axis data-parallel mesh over all (or the given) devices."""
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), ("data",))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over the 'data' axis."""
    return NamedSharding(mesh, P("data"))
