"""Tensor-parallel parameter sharding rules (the `model` mesh axis).

The reference has no TP (SURVEY.md §2.5 — DP only); at SD1.5 scale TP is
optional, but the framework plumbs it so larger UNets/text encoders drop
in: attention qkv/out and feed-forward kernels shard over heads/hidden on
the `model` axis, everything else replicates, and XLA GSPMD inserts the
collectives. Activations stay unsharded (batch on `data`) — with
megatron-style kernel shardings GSPMD emits one all-reduce per attention/
FF block over ICI.

Rules target our flax param trees by path suffix:
  to_q/to_k/to_v.kernel         (in, out)   → shard out (heads)
  to_out.kernel                 (in, out)   → shard in
  ff.proj_in / fc1 .kernel      (in, out)   → shard out
  ff.proj_out / fc2 .kernel     (in, out)   → shard in
Conv kernels and norms replicate (spatial convs dominate SD1.5 and are
batch-parallel already).
"""

from __future__ import annotations

from typing import Dict

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from edgestyle_tpu.core.mesh import MODEL_AXIS

_COL_SUFFIXES = ("to_q.kernel", "to_k.kernel", "to_v.kernel",
                 "ff.proj_in.kernel", "fc1.kernel")
_ROW_SUFFIXES = ("to_out.kernel", "ff.proj_out.kernel", "fc2.kernel")


def tp_spec_for_path(path: str, ndim: int) -> P:
    if ndim == 2:
        for s in _COL_SUFFIXES:
            if path.endswith(s):
                return P(None, MODEL_AXIS)
        for s in _ROW_SUFFIXES:
            if path.endswith(s):
                return P(MODEL_AXIS, None)
    return P()


def shard_pipeline_frozen_tp(mesh: Mesh, frozen: Dict) -> Dict:
    """Place the train step's frozen param set on a 2-D (data, model)
    mesh: attention/FF kernels of the UNet / static ControlNet / VAE TP-
    sharded over `model` (where they divide), everything else replicated.
    Combined with batch P(None, 'data') and replicated trainables, GSPMD
    emits BOTH collective families: per-block all-reduce over `model`
    (megatron activations) and the gradient all-reduce over `data`."""
    return {k: shard_params_tp(mesh, v) for k, v in frozen.items()}


def shard_params_tp(mesh: Mesh, params: Dict) -> Dict:
    """Place params with TP shardings over `mesh` (replicated on `data`)."""
    from edgestyle_tpu.core.porting import flatten, unflatten

    flat = flatten(params)
    out = {}
    for k, v in flat.items():
        spec = tp_spec_for_path(k, getattr(v, "ndim", 0))
        # only shard when the dimension divides evenly
        if spec != P():
            axis = 1 if spec == P(None, MODEL_AXIS) else 0
            if v.shape[axis] % mesh.shape[MODEL_AXIS]:
                spec = P()
        out[k] = jax.device_put(v, NamedSharding(mesh, spec))
    return unflatten(out)
