"""Capture committed goldens from the in-repo torch mirrors and fp64
transcriptions (VERDICT r2 item 2).

Runs entirely in-image (torch-cpu + numpy; NO network, NO diffusers) and
writes tests/goldens/mirror_v1.npz + mirror_v1_shapes.json. The always-on
gate tests/test_goldens_committed.py then replays the JAX side against
these tensors without needing torch.

The torch sources are the spec-written mirrors (tests/torch_sd15.py —
reference substrate /root/reference/train_text2image_pretrained_openpose.py:698-737),
the reference fusion-block op sequence (tests/test_multicontrolnet.py ←
/root/reference/model/edgestyle_multicontrolnet.py:23-63), and the fp64
transcriptions of diffusers UniPC / prodigyopt Prodigy
(tests/test_reference_parity.py). Weights/inputs regenerate from seeds —
only outputs and the shape manifest are written.

Usage:  python scripts/capture_mirror_goldens.py
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

# before any backend touch: the axon TPU plugin ignores JAX_PLATFORMS env
jax.config.update("jax_platforms", "cpu")

import torch  # noqa: E402

from tests import golden_mirror as gm  # noqa: E402
from tests import torch_sd15 as T  # noqa: E402


def load_synth(tmod, shapes):
    sd = gm.synth_state_dict(shapes)
    tmod.load_state_dict({k: torch.from_numpy(v) for k, v in sd.items()})
    return tmod.eval()


def main():
    os.makedirs(gm.GOLDEN_DIR, exist_ok=True)
    out, shapes = {}, {}

    # ------------------------------------------------------------ UNet mid
    tmod = T.UNet2DConditionModel(gm.UNET_MID)
    shapes["unet_mid"] = {k: list(v.shape) for k, v in tmod.state_dict().items()}
    tmod = load_synth(tmod, shapes["unet_mid"])
    lat, t, ctx = gm.unet_inputs()
    with torch.no_grad():
        out["unet_mid.out"] = tmod(
            torch.from_numpy(lat), torch.from_numpy(t), torch.from_numpy(ctx)
        ).numpy()
    # with controlnet residual injection (wiring of 13 skip adds)
    from edgestyle_tpu.models.unet import SD15UNet, UNetConfig

    skip_chs = SD15UNet(UNetConfig(**gm.UNET_MID)).skip_channels()
    down, mid = gm.unet_residual_inputs(skip_chs)
    with torch.no_grad():
        out["unet_mid.out_res"] = tmod(
            torch.from_numpy(lat), torch.from_numpy(t), torch.from_numpy(ctx),
            [torch.from_numpy(r) for r in down], torch.from_numpy(mid),
        ).numpy()

    # ------------------------------------------------------- ControlNet mid
    cmod = T.ControlNetModel(gm.UNET_MID, gm.CN_COND_CH)
    shapes["cn_mid"] = {k: list(v.shape) for k, v in cmod.state_dict().items()}
    cmod = load_synth(cmod, shapes["cn_mid"])
    cond = gm.controlnet_inputs()
    with torch.no_grad():
        rd, rm = cmod(
            torch.from_numpy(lat), torch.from_numpy(t), torch.from_numpy(ctx),
            torch.from_numpy(cond), scale=0.7,
        )
    for i, r in enumerate(rd):
        out[f"cn_mid.down{i}"] = r.numpy()
    out["cn_mid.mid"] = rm.numpy()

    # -------------------------------------------------------------- VAE mid
    vmod = T.AutoencoderKL(gm.VAE_MID["chs"], layers=gm.VAE_MID["layers"])
    shapes["vae_mid"] = {k: list(v.shape) for k, v in vmod.state_dict().items()}
    vmod = load_synth(vmod, shapes["vae_mid"])
    img = gm.vae_inputs()
    with torch.no_grad():
        moments = vmod.encode_moments(torch.from_numpy(img))
        z = moments[:, :4]
        out["vae_mid.moments"] = moments.numpy()
        out["vae_mid.decode"] = vmod.decode(z).numpy()

    # ------------------------------------------------------- fusion block
    from tests.test_multicontrolnet import TorchControlNetBlock

    fmod = TorchControlNetBlock(gm.FUSION["c"], gm.FUSION["size"], gm.FUSION["n"])
    shapes["fusion"] = {k: list(v.shape) for k, v in fmod.state_dict().items()}
    fmod = load_synth(fmod, shapes["fusion"])
    fx = gm.fusion_inputs()
    with torch.no_grad():
        out["fusion.out"] = fmod(torch.from_numpy(fx)).numpy()

    # ------------------------------------------------- OpenPose body CNN
    from tests.torch_bodypose import BodyPoseCMU

    bmod = BodyPoseCMU()
    shapes["bodypose"] = {k: list(v.shape) for k, v in bmod.state_dict().items()}
    bmod = load_synth(bmod, shapes["bodypose"])
    bx = gm.bodypose_inputs()
    with torch.no_grad():
        paf, heat = bmod(torch.from_numpy(bx))
    out["bodypose.paf"] = paf.numpy()
    out["bodypose.heat"] = heat.numpy()

    # --------------------------------------- UniPC fp64 transcription traj
    from edgestyle_tpu.schedulers.ddpm import NoiseSchedule
    from tests.test_reference_parity import DiffusersUniPCRef, _toy_eps

    ac = np.asarray(NoiseSchedule.sd15().alphas_cumprod)
    for steps, order in gm.UNIPC_CASES:
        ref = DiffusersUniPCRef(ac, solver_order=order)
        ref.set_timesteps(steps)
        x = gm.unipc_x0().copy()
        for i in range(steps):
            x = ref.step(_toy_eps(x, float(ref.timesteps[i])), x)
        out[f"unipc.{steps}_{order}.final"] = x.astype(np.float64)
        out[f"unipc.{steps}_{order}.timesteps"] = ref.timesteps

    # ------------------------------------ Prodigy transcription trajectory
    from tests.test_reference_parity import ProdigyRef

    params, targets, scales = gm.prodigy_problem()
    ref = ProdigyRef(params, weight_decay=1e-4, safeguard_warmup=True,
                     use_bias_correction=True)
    d_trace = []
    for it in range(gm.PRODIGY_STEPS):
        ref.step([s * (p - t) for p, t, s in zip(ref.p, targets, scales)])
        if it in gm.PRODIGY_CHECKPOINTS:
            d_trace.append(ref.d)
            for j, p in enumerate(ref.p):
                out[f"prodigy.step{it}.p{j}"] = p.copy()
    out["prodigy.d_trace"] = np.asarray(d_trace, np.float64)

    np.savez_compressed(gm.GOLDENS_NPZ, **out)
    with open(gm.SHAPES_JSON, "w") as f:
        json.dump(shapes, f, sort_keys=True)
    size = os.path.getsize(gm.GOLDENS_NPZ) / 1e6
    print(f"wrote {gm.GOLDENS_NPZ} ({size:.2f} MB, {len(out)} tensors) "
          f"+ shapes for {sorted(shapes)}")


if __name__ == "__main__":
    main()
