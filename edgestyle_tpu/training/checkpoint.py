"""Checkpoint / resume with the reference's dedupe + round-trip semantics.

Reference behaviour being mirrored
(/root/reference/train_text2image_pretrained_openpose.py:783-865,
1315-1350; model/edgestyle_multicontrolnet.py:213-282; controllora.py:
600-621):
  * only the trainable set is serialized — tied trunk weights, the frozen
    UNet/VAE/CLIP and the static openpose branch are never written
    (save_pattern dedupe; VAE explicitly stripped);
  * the save hook immediately re-loads what it wrote and asserts equality
    (round-trip invariant);
  * `checkpoint-<step>` directories with a total-limit rotation;
  * `--resume_from_checkpoint latest` scans for the newest step.

Implementation: orbax StandardCheckpointer over the train-state pytree
{trainable, opt_state, step}.
"""

from __future__ import annotations

import os
import re
import shutil
from typing import Any, Dict, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp


def _dir(path: str, step: int) -> str:
    return os.path.join(path, f"checkpoint-{step}")


def save_checkpoint(
    root: str,
    state: Dict[str, Any],
    total_limit: Optional[int] = None,
    verify_roundtrip: bool = True,
) -> str:
    step = int(np.asarray(state["step"]))
    path = os.path.abspath(_dir(root, step))
    ckptr = ocp.StandardCheckpointer()
    state_host = jax.device_get(state)
    ckptr.save(path, state_host, force=True)
    ckptr.wait_until_finished()

    if verify_roundtrip:
        restored = ckptr.restore(path, state_host)
        flat_a = jax.tree.leaves(state_host)
        flat_b = jax.tree.leaves(restored)
        assert len(flat_a) == len(flat_b), "round-trip structure mismatch"
        for a, b in zip(flat_a, flat_b):
            if not np.array_equal(np.asarray(a), np.asarray(b)):
                raise AssertionError("checkpoint round-trip mismatch")

    if total_limit is not None:
        steps = list_checkpoints(root)
        for s in steps[: max(0, len(steps) - total_limit)]:
            shutil.rmtree(_dir(root, s), ignore_errors=True)
    return path


def list_checkpoints(root: str):
    if not os.path.isdir(root):
        return []
    steps = []
    for d in os.listdir(root):
        m = re.fullmatch(r"checkpoint-(\d+)", d)
        if m:
            steps.append(int(m.group(1)))
    return sorted(steps)


def load_checkpoint(root: str, template: Dict[str, Any], step: str | int = "latest"):
    """Restore a train state. `step='latest'` scans checkpoint-* dirs
    (reference resume logic, train...py:1071-1092)."""
    if step == "latest":
        steps = list_checkpoints(root)
        if not steps:
            raise FileNotFoundError(f"no checkpoints under {root}")
        step = steps[-1]
    path = os.path.abspath(_dir(root, int(step)))
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(path, jax.device_get(template))


def load_checkpoint_sharded(
    root: str, template: Dict[str, Any], step: str | int = "latest"
):
    """Restore a train state directly INTO a multi-chip sharded layout.

    `template` is a pytree of jax.Arrays already placed on a Mesh (e.g. the
    live train state on a DP or DP×TP mesh); each leaf is restored as a
    jax.Array with the template leaf's sharding — orbax writes the shards
    straight to their devices, no host-side gather/scatter on the resume
    path. This is the sharded analog of the reference's load-hook round
    trip (train...py:830-862): resume after relaunch must be bit-identical
    AND land in the same partitioned layout the step function expects.
    """
    if step == "latest":
        steps = list_checkpoints(root)
        if not steps:
            raise FileNotFoundError(f"no checkpoints under {root}")
        step = steps[-1]
    path = os.path.abspath(_dir(root, int(step)))
    abstract = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=x.sharding),
        template,
    )
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(path, abstract)


def export_safetensors(path: str, trainable: Dict[str, Any]) -> None:
    """Flat safetensors export of the trainable set (lora adapters, heads,
    fusion) — the deployable artifact analogous to the reference's
    `diffusion_pytorch_model.safetensors` (train...py:1373-1382)."""
    from safetensors.numpy import save_file

    from edgestyle_tpu.core.porting import flatten

    flat = {k: np.asarray(v) for k, v in flatten(jax.device_get(trainable)).items()}
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    save_file(flat, path)


def import_safetensors(path: str) -> Dict[str, Any]:
    from safetensors.numpy import load_file

    from edgestyle_tpu.core.porting import unflatten

    return unflatten(dict(load_file(path)))
