"""Device mesh + sharding helpers.

The reference's only parallelism strategy is DDP data parallelism via HF
Accelerate (/root/reference/train_text2image_pretrained_openpose.py:1018-1020,
SURVEY.md §2.5). TPU-natively that becomes: a 1-D (or 2-D) `jax.sharding.Mesh`,
batch arrays sharded over the ``data`` axis, parameters replicated (optionally
FSDP-sharded over ``data`` for optimizer-state memory), and XLA emitting the
`psum` gradient all-reduce over ICI — no hand-written comm layer.

Axis conventions:
  data   — data parallelism (batch axis of every array in the train step)
  model  — reserved for tensor parallelism over attention heads / conv
           channels (unused at SD1.5 scale but plumbed through so larger
           models drop in)
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


@dataclasses.dataclass(frozen=True)
class MeshSpec:
    data: int = 1
    model: int = 1

    @property
    def num_devices(self) -> int:
        return self.data * self.model


def make_mesh(
    spec: Optional[MeshSpec] = None,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a (data, model) mesh. Default: all devices on the data axis."""
    devices = list(devices if devices is not None else jax.devices())
    if spec is None:
        spec = MeshSpec(data=len(devices), model=1)
    if spec.num_devices != len(devices):
        raise ValueError(
            f"MeshSpec wants {spec.num_devices} devices, got {len(devices)}"
        )
    arr = np.asarray(devices).reshape(spec.data, spec.model)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over the data axis; replicate the rest."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Place a pytree of batch arrays with the leading axis sharded on data."""
    sh = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)


def replicate_params(mesh: Mesh, params):
    sh = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), params)
