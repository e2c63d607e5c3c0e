"""Full numeric parity vs reference goldens — auto-skips unless
EDGESTYLE_GOLDENS points at a capture from scripts/capture_goldens.py.

When goldens exist this is the strongest fidelity gate: real diffusers
weights ported through our mappers, outputs compared at fp32 tolerances
(SURVEY.md §7 stage-by-stage parity plan)."""

import os

import numpy as np
import pytest

GOLDENS = os.environ.get("EDGESTYLE_GOLDENS")

pytestmark = pytest.mark.skipif(
    not (GOLDENS and os.path.exists(GOLDENS)),
    reason="set EDGESTYLE_GOLDENS=/path/to/goldens.npz (scripts/capture_goldens.py)",
)


@pytest.fixture(scope="module")
def suite():
    from edgestyle_tpu.utils.golden import GoldenSuite

    return GoldenSuite(GOLDENS)


def _port(path, fn):
    from edgestyle_tpu.core import porting

    sd = porting.load_safetensors(path)
    return porting.unflatten(fn(sd))


def test_vae_parity(suite):
    import jax.numpy as jnp

    from edgestyle_tpu.models.vae import AutoencoderKL, VAEConfig, port_vae_state_dict

    params = _port(GOLDENS + ".vae.safetensors", port_vae_state_dict)
    vae = AutoencoderKL(VAEConfig())
    x = jnp.asarray(suite.get("vae.input"))
    mean, logvar = vae.apply({"params": params}, x, method=vae.encode_moments)
    ref = suite.get("vae.moments")
    np.testing.assert_allclose(np.asarray(mean), ref[..., :4], atol=5e-4)
    dec = vae.apply({"params": params}, jnp.asarray(ref[..., :4]), method=vae.decode)
    r = suite.check("vae.decode", np.asarray(dec), atol=1e-3, rtol=1e-3)
    assert r.passed, r


def test_unet_parity(suite):
    import jax.numpy as jnp

    from edgestyle_tpu.models.unet import SD15UNet, port_unet_state_dict

    params = _port(GOLDENS + ".unet.safetensors", port_unet_state_dict)
    unet = SD15UNet(attn_impl="xla")
    out = unet.apply(
        {"params": params},
        jnp.asarray(suite.get("unet.latents")),
        jnp.asarray(suite.data["unet.t"]),
        jnp.asarray(suite.data["unet.context"]),
    )
    r = suite.check("unet.out", np.asarray(out), atol=2e-3, rtol=1e-3)
    assert r.passed, r


def test_controlnet_parity(suite):
    import jax.numpy as jnp

    from edgestyle_tpu.models.unet import SD15UNet, port_controlnet_state_dict

    params = _port(GOLDENS + ".cn.safetensors", port_controlnet_state_dict)
    cn = SD15UNet(controlnet_mode=True, attn_impl="xla")
    emb = cn.apply({"params": params}, jnp.asarray(suite.get("cn.cond")),
                   method="embed_cond")
    down, mid = cn.apply(
        {"params": params},
        jnp.asarray(suite.get("unet.latents")),
        jnp.asarray(suite.data["unet.t"]),
        jnp.asarray(suite.data["unet.context"]),
        emb, method="controlnet_forward",
    )
    for i, d in enumerate(down):
        r = suite.check(f"cn.down{i}", np.asarray(d), atol=2e-3, rtol=1e-3)
        assert r.passed, r
    r = suite.check("cn.mid", np.asarray(mid), atol=2e-3, rtol=1e-3)
    assert r.passed, r


def test_clip_parity(suite):
    import jax.numpy as jnp

    from edgestyle_tpu.models.clip_text import CLIPTextEncoder, port_clip_text_state_dict

    params = _port(GOLDENS + ".clip.safetensors", port_clip_text_state_dict)
    clip = CLIPTextEncoder()
    out = clip.apply({"params": params}, jnp.asarray(suite.data["clip.ids"]))
    r = suite.check("clip.hidden", np.asarray(out["last_hidden_state"]),
                    atol=5e-4, rtol=1e-3)
    assert r.passed, r
