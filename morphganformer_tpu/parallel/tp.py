"""Tensor-parallel parameter sharding over a ('data', 'model') mesh.

The reference's only parallelism is data-parallel DDP (SURVEY.md §2.8);
this is the TPU-native extension SCALING.md describes: weights shard
their OUTPUT-channel axis over the 'model' mesh axis
(`PartitionSpec(..., 'model')`), activations follow by GSPMD propagation,
and XLA inserts the all-gathers/reduce-scatters over ICI — no
communication code. Sharding is by annotation only, so the numerical
program is identical to the replicated one (equivalence is asserted in
tests/test_parallel.py).

Rule: any param leaf named `weight`/`bias` whose last axis is divisible
by the model-axis size shards that axis; everything else (consts, noise
buffers, w_avg, centroids, odd-sized heads like torgb's 3 channels or
the D scalar output) stays replicated.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(devices=None, model_parallel: int = 1) -> Mesh:
    """('data',) mesh, or ('data', 'model') when model_parallel > 1."""
    devices = np.asarray(devices if devices is not None else jax.devices())
    if model_parallel <= 1:
        return Mesh(devices, ("data",))
    if devices.size % model_parallel:
        raise ValueError(
            f"{devices.size} devices not divisible by model_parallel="
            f"{model_parallel}")
    grid = devices.reshape(devices.size // model_parallel, model_parallel)
    return Mesh(grid, ("data", "model"))


def _leaf_spec(path, leaf, model_size: int) -> P:
    name = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
    shape = np.shape(leaf)
    if name in ("weight", "bias") and len(shape) >= 1 \
            and shape[-1] % model_size == 0 and shape[-1] >= model_size:
        return P(*([None] * (len(shape) - 1) + ["model"]))
    return P()


def shard_params(tree, mesh: Mesh):
    """device_put a param tree with per-leaf output-channel sharding.
    On a mesh without a 'model' axis this is plain replication."""
    if "model" not in mesh.axis_names:
        return jax.device_put(tree, NamedSharding(mesh, P()))
    m = mesh.shape["model"]
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: jax.device_put(
            leaf, NamedSharding(mesh, _leaf_spec(path, leaf, m))), tree)
