"""Capture reference golden tensors (run where torch + diffusers +
transformers + the HF checkpoints are available — NOT in this TPU image).

Produces goldens.npz consumed by tests/test_goldens_optional.py, which
auto-skips when the file is absent and runs full numeric parity when
present (EDGESTYLE_GOLDENS=/path/to/goldens.npz).

Usage:
  python scripts/capture_goldens.py \
      --unet SG161222/Realistic_Vision_V5.1_noVAE \
      --vae stabilityai/sd-vae-ft-mse \
      --controlnet lllyasviel/control_v11p_sd15_openpose \
      --out goldens.npz
"""

import argparse

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--unet", default="SG161222/Realistic_Vision_V5.1_noVAE")
    ap.add_argument("--vae", default="stabilityai/sd-vae-ft-mse")
    ap.add_argument("--controlnet", default="lllyasviel/control_v11p_sd15_openpose")
    ap.add_argument("--text_encoder", default=None,
                    help="defaults to <unet repo>/text_encoder")
    ap.add_argument("--out", default="goldens.npz")
    args = ap.parse_args()

    import torch
    from diffusers import AutoencoderKL, ControlNetModel, UNet2DConditionModel
    from transformers import CLIPTextModel

    torch.manual_seed(0)
    g = {}

    vae = AutoencoderKL.from_pretrained(args.vae).eval()
    x = torch.randn(1, 3, 256, 256)
    with torch.no_grad():
        moments = vae.encode(x).latent_dist.parameters
        dec = vae.decode(moments[:, :4]).sample
    g["vae.input"] = x.numpy()
    g["vae.moments"] = moments.numpy()
    g["vae.decode"] = dec.numpy()

    unet = UNet2DConditionModel.from_pretrained(args.unet, subfolder="unet").eval()
    lat = torch.randn(1, 4, 64, 64)
    t = torch.tensor([500])
    ctx = torch.randn(1, 77, 768)
    with torch.no_grad():
        out = unet(lat, t, encoder_hidden_states=ctx).sample
    g["unet.latents"] = lat.numpy()
    g["unet.t"] = t.numpy()
    g["unet.context"] = ctx.numpy()
    g["unet.out"] = out.numpy()

    cn = ControlNetModel.from_pretrained(args.controlnet).eval()
    cond = torch.rand(1, 3, 512, 512)
    with torch.no_grad():
        res = cn(lat, t, encoder_hidden_states=ctx, controlnet_cond=cond,
                 return_dict=True)
    g["cn.cond"] = cond.numpy()
    for i, r in enumerate(res.down_block_res_samples):
        g[f"cn.down{i}"] = r.numpy()
    g["cn.mid"] = res.mid_block_res_sample.numpy()

    te_repo = args.text_encoder or args.unet
    te = CLIPTextModel.from_pretrained(te_repo, subfolder="text_encoder").eval()
    ids = torch.randint(1, 49000, (1, 77))
    ids[0, -1] = 49407
    with torch.no_grad():
        enc = te(ids)
    g["clip.ids"] = ids.numpy()
    g["clip.hidden"] = enc.last_hidden_state.numpy()

    # weight dumps so the parity test can port exactly these weights
    from safetensors.numpy import save_file

    save_file({k: v.detach().numpy() for k, v in vae.state_dict().items()},
              args.out + ".vae.safetensors")
    save_file({k: v.detach().numpy() for k, v in unet.state_dict().items()},
              args.out + ".unet.safetensors")
    save_file({k: v.detach().numpy() for k, v in cn.state_dict().items()},
              args.out + ".cn.safetensors")
    save_file({k: v.detach().numpy() for k, v in te.state_dict().items()},
              args.out + ".clip.safetensors")
    np.savez_compressed(args.out, **g)
    print(f"wrote {args.out} (+ 4 weight safetensors)")


if __name__ == "__main__":
    main()
