"""Tokenizer unicode parity (ADVICE r1: ASCII-only word split produced
wrong ids for non-ASCII text vs HF CLIPTokenizer).

Strategy: build a merges-free vocab covering every byte-level unicode char
both bare and with the `</w>` suffix, write it to disk, and load it through
BOTH our CLIPTokenizer and transformers.CLIPTokenizer. With no merges, BPE
degenerates to per-char tokens, so any id mismatch isolates the
pre-tokenization (word-split) behavior under test.

Note: the in-image transformers lacks ftfy, so HF falls back to
BasicTokenizer text cleanup, which inserts spaces around CJK chars. The
canonical CLIP behavior (OpenAI simple_tokenizer / HF with ftfy) keeps a
CJK run as ONE \\p{L}+ word; we pin that with our own golden instead.
"""

import json
import os

import numpy as np
import pytest

from edgestyle_tpu.data.tokenizer import (
    CLIP_BOS_ID,
    CLIP_EOS_ID,
    CLIPTokenizer,
    _bytes_to_unicode,
    empty_prompt_ids,
)


@pytest.fixture(scope="module")
def vocab_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("clip_vocab")
    chars = sorted(set(_bytes_to_unicode().values()))
    vocab = {}
    for c in chars:
        vocab[c] = len(vocab)
    for c in chars:
        vocab[c + "</w>"] = len(vocab)
    vocab["<|startoftext|>"] = len(vocab)
    vocab["<|endoftext|>"] = len(vocab)
    with open(os.path.join(d, "vocab.json"), "w") as f:
        json.dump(vocab, f)
    with open(os.path.join(d, "merges.txt"), "w") as f:
        f.write("#version: 0.2\n")
    return str(d)


@pytest.fixture(scope="module")
def ours(vocab_dir):
    return CLIPTokenizer.from_pretrained_dir(vocab_dir, max_length=77)


@pytest.fixture(scope="module")
def hf(vocab_dir):
    from transformers import CLIPTokenizer as HFTok

    return HFTok(
        os.path.join(vocab_dir, "vocab.json"),
        os.path.join(vocab_dir, "merges.txt"),
        model_max_length=77,
    )


TEXTS = [
    "a photo of a red shirt",
    "don't stop, it's fine 'll 've",
    "héllo wörld café naïve",              # accented latin: \p{L} must group
    "l'été ça va très vite",
    "price 42 dollars 7%!?",
    "ĄĆĘŁŃ óśźż",                          # non-latin1 letters
    "ελληνικά κείμενο",                    # greek
    "русский текст",                       # cyrillic
    "٣ ١٢",                                # arabic-indic digits: \p{N} single
    "",
    "   spaces   everywhere   ",
]


@pytest.mark.parametrize("text", TEXTS)
def test_matches_hf_tokenizer(ours, hf, text):
    got = ours([text])[0]
    want = hf([text], padding="max_length", max_length=77, truncation=True)[
        "input_ids"
    ][0]
    assert got.tolist() == list(want), (
        text,
        ours.decode(got),
    )


def test_cjk_run_single_word_end(ours):
    # Canonical CLIP (\p{L}+ with ftfy) keeps a CJK run as one word: only
    # the run's final char carries </w>. 日本 = 6 utf-8 bytes → 6 byte-level
    # chars, exactly one of which is a </w> variant.
    ids = ours.encode("日本")
    toks = [ours.decoder[i] for i in ids]
    assert len(toks) == 6
    assert sum(t.endswith("</w>") for t in toks) == 1
    assert toks[-1].endswith("</w>")


def test_empty_prompt_ids_shape_and_content():
    ids = empty_prompt_ids(batch=2)
    assert ids.shape == (2, 77)
    assert ids.dtype == np.int32
    assert (ids[:, 0] == CLIP_BOS_ID).all()
    assert (ids[:, 1:] == CLIP_EOS_ID).all()


def test_empty_prompt_matches_tokenizer_empty(ours):
    # With the synthetic vocab the ids differ, but the STRUCTURE must match
    # what the real tokenizer produces for "": BOS, EOS, then EOS padding.
    got = ours([""])[0]
    assert got[0] == ours.bos
    assert (got[1:] == ours.eos).all()
