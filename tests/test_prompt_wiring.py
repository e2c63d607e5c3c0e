"""ADVICE r1 regressions: serving/CLI prompt conditioning.

The round-1 serve path fed all-zero token ids to CLIP (token 0 = '!'), had
no tokenizer/prompt plumbing at all, and train.py's --use_agnostic_images
could never be disabled. These pin the fixes.
"""

import numpy as np
import pytest

from edgestyle_tpu.apps.serve import encode_prompts, parse_args as serve_args
from edgestyle_tpu.apps.train import check_batch_divisible, parse_args as train_args
from edgestyle_tpu.apps.tryon import parse_args as tryon_args
from edgestyle_tpu.data.tokenizer import (
    CLIP_BOS_ID,
    CLIP_EOS_ID,
    make_tiny_tokenizer,
)


def test_no_tokenizer_falls_back_to_empty_prompt_not_zeros():
    ids, neg = encode_prompts(None, None, None, "x", None)
    assert ids.shape == (1, 77) and neg.shape == (1, 77)
    assert int(ids[0, 0]) == CLIP_BOS_ID
    assert (np.asarray(ids[0, 1:]) == CLIP_EOS_ID).all()
    assert not (np.asarray(ids) == 0).all()


def test_no_tokenizer_rejects_explicit_prompt():
    """An explicit prompt must not be silently discarded when the server
    has no tokenizer — the caller gets an error instead of an
    unconditioned generation."""
    import pytest

    with pytest.raises(ValueError, match="tokenizer"):
        encode_prompts(None, None, "red dress", "x", None)


def test_tokenizer_encodes_request_prompt():
    tok = make_tiny_tokenizer()
    ids, neg = encode_prompts(tok, None, "abc", "de", None)
    want_ids = tok(["abc"])
    want_neg = tok(["de"])
    assert (np.asarray(ids) == want_ids).all()
    assert (np.asarray(neg) == want_neg).all()
    assert not (np.asarray(ids) == np.asarray(neg)).all()


def test_miner_used_when_no_prompt_given():
    tok = make_tiny_tokenizer()

    class Miner:
        def __init__(self):
            self.calls = []

        def __call__(self, imgs):
            self.calls.append(np.asarray(imgs).shape)
            return ["abc"]

    m = Miner()
    clothes = np.zeros((8, 8, 3), np.float32)
    ids, _ = encode_prompts(tok, m, None, "", clothes)
    assert m.calls == [(1, 8, 8, 3)]
    assert (np.asarray(ids) == tok(["abc"])).all()

    # explicit prompt suppresses mining
    m2 = Miner()
    encode_prompts(tok, m2, "explicit", "", clothes)
    assert m2.calls == []


def test_serve_args_have_prompt_surface():
    a = serve_args(["--tokenizer_dir", "/x", "--clip_model", "/y",
                    "--prompt", "p", "--negative_prompt", "n"])
    assert (a.tokenizer_dir, a.clip_model, a.prompt, a.negative_prompt) == (
        "/x", "/y", "p", "n"
    )


def test_tryon_args_have_clip_model():
    a = tryon_args(["--subject", "s", "--clothes1", "a", "--clothes2", "b",
                    "--clip_model", "/y"])
    assert a.clip_model == "/y"
    assert a.prompt is None


def test_use_agnostic_images_default_and_toggle():
    """Default False = head crops, matching the reference (its flag is
    store_true at train...py:559 and the README recipe never sets it)."""
    base = ["--random_init"]
    assert train_args(base).use_agnostic_images is False
    assert train_args(base + ["--no-use_agnostic_images"]).use_agnostic_images is False
    assert train_args(base + ["--use_agnostic_images"]).use_agnostic_images is True


def test_batch_divisibility_guard():
    check_batch_divisible(8, 8)
    check_batch_divisible(16, 8)
    with pytest.raises(SystemExit, match="divisible"):
        check_batch_divisible(2, 8)
