"""CLIP text encoder parity vs transformers' CLIPTextModel (random init,
no download needed). This is a true golden test: same weights, full 12-layer
(shrunk to 4 for speed) forward, last_hidden_state + pooled output."""

import jax
import jax.numpy as jnp
import numpy as np
import torch
from transformers import CLIPTextConfig as HFConfig
from transformers import CLIPTextModel

from edgestyle_tpu.core import porting
from edgestyle_tpu.models.clip_text import (
    CLIPTextConfig,
    CLIPTextEncoder,
    port_clip_text_state_dict,
)


def test_clip_text_parity_with_transformers(rng):
    hf_cfg = HFConfig(
        vocab_size=1000,
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=4,
        num_attention_heads=4,
        max_position_embeddings=77,
        hidden_act="quick_gelu",
        # the real openai/clip-vit-large-patch14 config carries eos_token_id=2,
        # which selects HF's legacy argmax pooling path — the one we implement
        eos_token_id=2,
    )
    torch.manual_seed(0)
    tmod = CLIPTextModel(hf_cfg).eval()

    ids = rng.integers(1, 999, size=(2, 77))
    ids[:, -1] = 999  # "EOS" = max id so argmax pooling matches
    with torch.no_grad():
        ref = tmod(torch.from_numpy(ids))
    ref_hidden = ref.last_hidden_state.numpy()
    ref_pooled = ref.pooler_output.numpy()

    cfg = CLIPTextConfig(
        vocab_size=1000, hidden_size=64, num_layers=4, num_heads=4, intermediate_size=128
    )
    mod = CLIPTextEncoder(cfg)
    sd = porting.load_torch_state_dict(tmod)
    params = porting.unflatten(port_clip_text_state_dict(sd, num_layers=4))
    out = jax.jit(mod.apply)({"params": params}, jnp.asarray(ids.astype(np.int32)))

    np.testing.assert_allclose(np.asarray(out["last_hidden_state"]), ref_hidden, atol=2e-5)
    np.testing.assert_allclose(np.asarray(out["pooled_output"]), ref_pooled, atol=2e-5)
