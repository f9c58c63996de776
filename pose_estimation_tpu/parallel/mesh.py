"""Device mesh construction and sharding helpers.

The TPU-native replacement for the reference's NCCL DDP runtime
(version/transparent/train.py:1216-1441: mp.spawn + init_process_group +
DistributedSampler + DDP). One `jax.sharding.Mesh` with a `data` axis (and
an optional `model` axis for future tensor sharding) covers the same
capability: batch sharding via NamedSharding, gradient reduction via the
psum XLA inserts under jit — riding ICI instead of NCCL rings.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(data: int = -1, model: int = 1,
              devices: list | None = None) -> Mesh:
    """Build a ('data', 'model') mesh. data=-1 -> all devices / model."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if data == -1:
        data = n // model
    assert data * model <= n, (data, model, n)
    dev_array = np.asarray(devices[: data * model]).reshape(data, model)
    return Mesh(dev_array, axis_names=("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis (batch) sharding over the 'data' mesh axis — the analog
    of DistributedSampler's per-rank shards (train.py:1239), but expressed
    as an array layout instead of a sampler."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Place a host batch pytree onto the mesh, batch-sharded.

    Arrays whose leading dim is not divisible by the 'data' axis (tiny
    debug batches, scalars) are replicated instead — the program still
    runs, just without that array's data-parallel split.
    """
    n_data = mesh.shape["data"]
    sh = batch_sharding(mesh)
    rep = replicated(mesh)

    def place(x):
        divisible = getattr(x, "ndim", 0) >= 1 and x.shape[0] % n_data == 0
        return jax.device_put(x, sh if divisible else rep)

    return jax.tree.map(place, batch)
