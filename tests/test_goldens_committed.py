"""Always-on parity gate against COMMITTED mirror goldens (VERDICT r2
item 2 — previously all golden tests skipped because nothing was in-tree).

tests/goldens/mirror_v1.npz holds torch-mirror / fp64-transcription
outputs captured once by scripts/capture_mirror_goldens.py at fixed seeds.
Here the same weights and inputs regenerate numpy-side (no torch needed),
flow through the REAL port mappers, and the JAX models/schedulers/optimizer
must reproduce the committed tensors. Tolerances mirror the live
torch-parity tests (test_fullmodel_parity.py, test_reference_parity.py).

What this does and does not prove is documented in PARITY.md: goldens
pin the JAX side against mirror-captured values — the mirrors themselves
are validated against torch primitives / the diffusers spec by the live
tests, and CLIP is validated against real `transformers` modules.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from edgestyle_tpu.core import porting
from tests import golden_mirror as gm

pytestmark = pytest.mark.skipif(
    not __import__("os").path.exists(gm.GOLDENS_NPZ),
    reason="committed goldens missing — run scripts/capture_mirror_goldens.py",
)


@pytest.fixture(scope="module")
def goldens():
    return dict(np.load(gm.GOLDENS_NPZ))


@pytest.fixture(scope="module")
def shapes():
    return gm.load_shapes()


def to_nhwc(x):
    return np.transpose(np.asarray(x), (0, 2, 3, 1))


def to_nchw(x):
    return np.transpose(np.asarray(x), (0, 3, 1, 2))


def _scaled_close(got, want, atol, msg=""):
    want = np.asarray(want)
    scale = max(1.0, float(np.abs(want).max()))
    err = float(np.abs(np.asarray(got) - want).max()) / scale
    assert err < atol, f"{msg}: scaled max diff {err:.2e} (tol {atol})"


def test_goldens_present_and_complete(goldens):
    keys = set(goldens)
    assert {"unet_mid.out", "unet_mid.out_res", "cn_mid.mid", "vae_mid.decode",
            "fusion.out", "prodigy.d_trace"} <= keys
    assert sum(1 for k in keys if k.startswith("cn_mid.down")) == 13 - 1


def test_unet_mid_matches_golden(goldens, shapes):
    from edgestyle_tpu.models.unet import SD15UNet, UNetConfig, port_unet_state_dict

    params = porting.unflatten(
        port_unet_state_dict(gm.synth_state_dict(shapes["unet_mid"]))
    )
    jm = SD15UNet(UNetConfig(**gm.UNET_MID), attn_impl="xla")
    lat, t, ctx = gm.unet_inputs()
    run = jax.jit(lambda p, x, t, c, dr, mr: jm.apply(
        {"params": p}, x, t, c,
        down_block_additional_residuals=dr,
        mid_block_additional_residual=mr,
    ))
    out = run(params, jnp.asarray(to_nhwc(lat)), jnp.asarray(t),
              jnp.asarray(ctx), None, None)
    _scaled_close(to_nchw(out), goldens["unet_mid.out"], 1e-4, "unet")

    down, mid = gm.unet_residual_inputs(jm.skip_channels())
    out = run(params, jnp.asarray(to_nhwc(lat)), jnp.asarray(t),
              jnp.asarray(ctx), [jnp.asarray(to_nhwc(r)) for r in down],
              jnp.asarray(to_nhwc(mid)))
    _scaled_close(to_nchw(out), goldens["unet_mid.out_res"], 1e-4, "unet+res")


def test_controlnet_mid_matches_golden(goldens, shapes):
    from edgestyle_tpu.models.unet import (
        SD15UNet,
        UNetConfig,
        port_controlnet_state_dict,
    )

    params = porting.unflatten(
        port_controlnet_state_dict(gm.synth_state_dict(shapes["cn_mid"]))
    )
    jcfg = UNetConfig(**gm.UNET_MID, cond_embedding_channels=gm.CN_COND_CH)
    jm = SD15UNet(jcfg, controlnet_mode=True, attn_impl="xla")
    lat, t, ctx = gm.unet_inputs()
    cond = gm.controlnet_inputs()

    @jax.jit
    def run(p, x, t, c, img):
        emb = jm.apply({"params": p}, img, method="embed_cond")
        return jm.apply({"params": p}, x, t, c, emb, conditioning_scale=0.7,
                        method="controlnet_forward")

    down, mid = run(params, jnp.asarray(to_nhwc(lat)), jnp.asarray(t),
                    jnp.asarray(ctx), jnp.asarray(to_nhwc(cond)))
    for i, d in enumerate(down):
        _scaled_close(to_nchw(d), goldens[f"cn_mid.down{i}"], 1e-4, f"down{i}")
    _scaled_close(to_nchw(mid), goldens["cn_mid.mid"], 1e-4, "mid")


def test_vae_mid_matches_golden(goldens, shapes):
    from edgestyle_tpu.models.vae import AutoencoderKL, VAEConfig, port_vae_state_dict

    params = porting.unflatten(
        port_vae_state_dict(gm.synth_state_dict(shapes["vae_mid"]))
    )
    cfg = VAEConfig(block_out_channels=gm.VAE_MID["chs"],
                    layers_per_block=gm.VAE_MID["layers"],
                    sample_size=gm.VAE_MID["px"])
    jm = AutoencoderKL(cfg)
    img = gm.vae_inputs()
    mean, logvar = jax.jit(
        lambda p, x: jm.apply({"params": p}, x, method="encode_moments")
    )(params, jnp.asarray(to_nhwc(img)))
    moments = goldens["vae_mid.moments"]
    zc = moments.shape[1] // 2
    _scaled_close(to_nchw(mean), moments[:, :zc], 5e-4, "vae mean")
    _scaled_close(to_nchw(logvar), np.clip(moments[:, zc:], -30.0, 20.0),
                  5e-4, "vae logvar")
    dec = jax.jit(lambda p, z: jm.apply({"params": p}, z, method="decode"))(
        params, jnp.asarray(to_nhwc(moments[:, :zc]))
    )
    _scaled_close(to_nchw(dec), goldens["vae_mid.decode"], 5e-4, "vae decode")


def test_fusion_block_matches_golden(goldens, shapes):
    from edgestyle_tpu.models.multicontrolnet import ControlNetFusionBlock

    sd = gm.synth_state_dict(shapes["fusion"])
    m = porting.KeyMapper()
    for conv in ("first_conv", "second_conv", "third_conv"):
        m.conv(conv, conv)
    for ln in ("first_normalization", "second_normalization"):
        m.rule(ln + r"\.weight", ln + ".scale", lambda w: np.transpose(w, (1, 2, 0)))
        m.rule(ln + r"\.bias", ln + ".bias", lambda w: np.transpose(w, (1, 2, 0)))
    params = porting.unflatten(m.apply(sd))

    mod = ControlNetFusionBlock(channels=gm.FUSION["c"], num_nets=gm.FUSION["n"])
    x = gm.fusion_inputs()
    out = mod.apply({"params": params}, jnp.asarray(to_nhwc(x)))
    _scaled_close(to_nchw(out), goldens["fusion.out"], 1e-5, "fusion")


def test_bodypose_matches_golden(goldens, shapes):
    if "bodypose.paf" not in goldens:
        pytest.skip("goldens predate the bodypose capture")
    from edgestyle_tpu.models.openpose import (
        BodyPoseNet,
        port_bodypose_state_dict,
    )

    params = porting.unflatten(
        port_bodypose_state_dict(gm.synth_state_dict(shapes["bodypose"]))
    )
    net = BodyPoseNet()
    x = gm.bodypose_inputs()
    paf, heat = jax.jit(lambda p, x: net.apply({"params": p}, x))(
        params, jnp.asarray(to_nhwc(x))
    )
    _scaled_close(to_nchw(paf), goldens["bodypose.paf"], 1e-4, "paf")
    _scaled_close(to_nchw(heat), goldens["bodypose.heat"], 1e-4, "heat")


def test_sam_matches_golden():
    """Full-model EfficientViT-SAM vs the committed torch-mirror golden
    (tests/torch_sam.py via scripts/capture_sam_golden.py): backbone +
    neck (incl. the torch-exact bicubic 8->64 resize) + prompt encoder +
    mask decoder, through the REAL port mapper."""
    if not __import__("os").path.exists(gm.SAM_GOLDENS_NPZ):
        pytest.skip("sam goldens missing — run scripts/capture_sam_golden.py")
    import json

    from edgestyle_tpu.models.efficientvit.backbone import BackboneConfig
    from edgestyle_tpu.models.efficientvit.sam import (
        EfficientViTSam,
        SamConfig,
        port_sam_state_dict,
    )

    goldens = dict(np.load(gm.SAM_GOLDENS_NPZ))
    with open(gm.SAM_SHAPES_JSON) as f:
        shapes = json.load(f)["sam_mid"]
    c = gm.SAM_MID
    cfg = SamConfig(
        backbone=BackboneConfig(width_list=tuple(c["widths"]),
                                depth_list=tuple(c["depths"])),
        neck_depth=c["neck_depth"], image_size=c["image_size"],
    )
    params = porting.unflatten(
        port_sam_state_dict(gm.synth_state_dict(shapes), cfg)
    )
    sam = EfficientViTSam(cfg)
    img, box_pts, box_lbl, pt_pts, pt_lbl = gm.sam_inputs()
    jimg = jnp.asarray(to_nhwc(img))

    emb = jax.jit(lambda p, x: sam.apply({"params": p}, x,
                                         method=sam.encode_image))(params, jimg)
    _scaled_close(to_nchw(emb)[:, ::32, ::8, ::8], goldens["sam_mid.emb_slice"],
                  2e-4, "sam emb")

    run = jax.jit(
        lambda p, x, pts, lbl, multi: sam.apply({"params": p}, x, pts, lbl, multi),
        static_argnames="multi",
    )
    masks, iou = run(params, jimg, jnp.asarray(box_pts), jnp.asarray(box_lbl),
                     multi=True)
    _scaled_close(masks, goldens["sam_mid.box_masks"], 2e-4, "sam box masks")
    _scaled_close(iou, goldens["sam_mid.box_iou"], 2e-4, "sam box iou")
    masks1, iou1 = run(params, jimg, jnp.asarray(pt_pts), jnp.asarray(pt_lbl),
                       multi=False)
    _scaled_close(masks1, goldens["sam_mid.pt_mask"], 2e-4, "sam pt mask")
    _scaled_close(iou1, goldens["sam_mid.pt_iou"], 2e-4, "sam pt iou")


@pytest.mark.parametrize("steps,order", list(gm.UNIPC_CASES))
def test_unipc_matches_golden_trajectory(goldens, steps, order):
    from edgestyle_tpu.schedulers.ddpm import NoiseSchedule
    from edgestyle_tpu.schedulers.unipc import UniPCScheduler

    ours = UniPCScheduler(NoiseSchedule.sd15(), solver_order=order)
    plan = ours.plan(steps)
    np.testing.assert_array_equal(
        np.asarray(plan.timesteps), goldens[f"unipc.{steps}_{order}.timesteps"]
    )

    def model_fn(sample, t):
        return 0.9 * sample * jnp.cos(t.astype(jnp.float32) / 311.0) + 0.1

    final = jax.jit(lambda x0: ours.sample_loop(plan, model_fn, x0))(
        jnp.asarray(gm.unipc_x0(), jnp.float32)
    )
    np.testing.assert_allclose(
        np.asarray(final), goldens[f"unipc.{steps}_{order}.final"],
        rtol=2e-4, atol=2e-4,
    )


def test_prodigy_matches_golden_trajectory(goldens):
    import optax

    from edgestyle_tpu.training.prodigy import get_d, prodigy

    params, targets, scales = gm.prodigy_problem()
    opt = prodigy(learning_rate=1.0, weight_decay=1e-4,
                  safeguard_warmup=True, use_bias_correction=True)
    jp = [jnp.asarray(p) for p in params]
    state = opt.init(jp)
    jt = [jnp.asarray(t) for t in targets]

    @jax.jit
    def step(ps, st):
        gs = [s * (p - t) for p, t, s in zip(ps, jt, scales)]
        upd, st2 = opt.update(gs, st, ps)
        return optax.apply_updates(ps, upd), st2

    d_got = []
    for it in range(gm.PRODIGY_STEPS):
        jp, state = step(jp, state)
        if it in gm.PRODIGY_CHECKPOINTS:
            d_got.append(float(get_d(state)))
            for j, p in enumerate(jp):
                np.testing.assert_allclose(
                    np.asarray(p), goldens[f"prodigy.step{it}.p{j}"],
                    rtol=2e-4, atol=2e-5, err_msg=f"step {it} p{j}",
                )
    np.testing.assert_allclose(d_got, goldens["prodigy.d_trace"], rtol=1e-3)
