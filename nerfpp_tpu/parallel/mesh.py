"""Device mesh + ray-batch data parallelism.

The reference has no multi-device parallelism of any kind (SURVEY.md §2.3); its
only scaling knob is sequential ray chunking. The TPU-native scaling story is
batch-of-rays data parallelism over a 1-D mesh:

- parameters (hash tables + MLPs, ~tens of MB) are replicated on every chip;
- the per-step ray batch (NRand rays) is sharded along the "data" axis;
- the gradient all-reduce rides ICI — inserted automatically by XLA's SPMD
  partitioner from the sharding constraints below (no hand-written collectives
  needed for DP; jax.lax.psum appears in the lowered HLO).

Rays are embarrassingly parallel in the forward pass, so this is the entire
"communication backend" the workload needs at reference scale; the hash-grid
scatter-add in the backward pass stays chip-local because tables are replicated.
"""
from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(n_devices: Optional[int] = None, devices=None) -> Mesh:
    """A 1-D mesh over the data axis. Uses all visible devices by default."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis sharding for per-ray arrays."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_rays(batch: dict, mesh: Optional[Mesh]) -> dict:
    """Constrain every per-ray array in the batch to be row-sharded over the
    mesh. Scalars (cone_angle) stay replicated. No-op without a mesh."""
    if mesh is None:
        return batch
    sh = batch_sharding(mesh)
    n = mesh.devices.size
    out = {}
    for k, v in batch.items():
        if hasattr(v, "ndim") and v.ndim >= 1:
            if v.shape[0] % n:
                # fail loudly at trace time: uneven row sharding would leave
                # ragged per-device batches (CLI pre-checks NRand; this guards
                # every other entry point with the same clear message)
                raise ValueError(
                    f"batch array '{k}' has leading dim {v.shape[0]}, not "
                    f"divisible by the {n}-device data-parallel mesh; pick "
                    f"NRand as a multiple of the device count")
            out[k] = jax.lax.with_sharding_constraint(v, sh)
        else:
            out[k] = v
    return out


def replicate_tree(tree, mesh: Optional[Mesh]):
    """Constrain a parameter pytree to be replicated on every chip."""
    if mesh is None:
        return tree
    rep = replicated(mesh)
    return jax.tree.map(
        lambda x: jax.lax.with_sharding_constraint(x, rep)
        if hasattr(x, "ndim") else x, tree)


def put_replicated(tree, mesh: Optional[Mesh]):
    """Device-put a host pytree fully replicated across the mesh."""
    if mesh is None:
        return tree
    rep = replicated(mesh)
    return jax.device_put(tree, rep)
