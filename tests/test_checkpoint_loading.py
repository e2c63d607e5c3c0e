"""App-path real-checkpoint loading (VERDICT r1 item 4: apps/tryon.py's
_load_sam_params was a NotImplementedError stub).

Feeds synthetic torch-layout EfficientViT-SAM checkpoints — every layout
the reference produces (full state_dict, {'state_dict': ...} wrapper,
decoder-only save, plus a safetensors conversion) — through the app
loader and asserts the resulting param tree matches TryOnPreprocessor's
expected structure exactly.
"""

import numpy as np
import pytest
import torch

from edgestyle_tpu.apps.convert_checkpoint import convert
from edgestyle_tpu.apps.tryon import _load_sam_params, sam_head_paths
from edgestyle_tpu.core import porting
from edgestyle_tpu.models.efficientvit.sam import SAM_L0
from edgestyle_tpu.pipelines.preprocess import HEAD_NAMES, TryOnPreprocessor

from tests.test_sam_porting import synthetic_torch_sd


@pytest.fixture(scope="module")
def ckpts(tmp_path_factory):
    d = tmp_path_factory.mktemp("sam_ckpts")
    sd, flat = synthetic_torch_sd(SAM_L0, dtype=np.float16)
    tsd = {k: torch.from_numpy(v) for k, v in sd.items()}

    base = d / "l0.pt"
    torch.save({"state_dict": tsd}, base)  # wrapper layout (network.py:72-73)

    # decoder-only save: segmenter_training_*.py:463
    dec = {k[len("mask_decoder."):]: v for k, v in tsd.items()
           if k.startswith("mask_decoder.")}
    subject = d / "trained_decoder_subject.pt"
    torch.save(dec, subject)

    # full-model raw state dict: segmenter_training_*.py:464
    clothes = d / "trained_model_clothes.pt"
    torch.save(tsd, clothes)

    # safetensors conversion path
    head_st = d / "trained_model_head.safetensors"
    n = convert(str(clothes), str(head_st))
    assert n == len(tsd)

    return {"base": str(base), "subject": str(subject),
            "clothes": str(clothes), "head": str(head_st), "flat": flat}


def test_load_sam_params_all_layouts(ckpts):
    pre = TryOnPreprocessor(SAM_L0)
    params = _load_sam_params(
        pre, ckpts["base"],
        {"subject": ckpts["subject"], "agnostic": None,
         "clothes": ckpts["clothes"], "head": ckpts["head"]},
    )
    want = ckpts["flat"]
    got_sam = porting.flatten(params["sam"])
    assert set(got_sam) == set(want)
    for k in want:
        assert got_sam[k].shape == tuple(want[k].shape), k

    dec_want = {k[len("mask_decoder."):]: v for k, v in want.items()
                if k.startswith("mask_decoder.")}
    assert set(params["decoders"]) == set(HEAD_NAMES)
    for name in HEAD_NAMES:
        got = porting.flatten(params["decoders"][name])
        assert set(got) == set(dec_want), name
        for k in dec_want:
            assert got[k].shape == tuple(dec_want[k].shape), (name, k)


def test_cli_flags_reach_loader():
    from edgestyle_tpu.apps.tryon import parse_args

    a = parse_args([
        "--subject", "s", "--clothes1", "a", "--clothes2", "b",
        "--sam_checkpoint", "/base.pt", "--sam_subject", "/s.pt",
        "--sam_clothes", "/c.pt",
    ])
    paths = sam_head_paths(a)
    assert paths == {"subject": "/s.pt", "agnostic": None,
                     "clothes": "/c.pt", "head": None}


def test_module_pickle_rejected(tmp_path):
    p = tmp_path / "module.pt"
    torch.save(torch.nn.Linear(2, 2), p)  # full-module pickle
    with pytest.raises(ValueError, match="weights-only"):
        porting.load_torch_checkpoint(str(p))


def test_serve_and_extract_share_model_flags():
    from edgestyle_tpu.apps.serve import parse_args as serve_args

    a = serve_args(["--sam_checkpoint", "/b.pt", "--sam_head", "/h.pt"])
    assert sam_head_paths(a)["head"] == "/h.pt"
    assert a.sam_checkpoint == "/b.pt"
