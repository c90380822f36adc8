"""Fuzz bit-identity: random unicode text through our encoder vs HF lib.

Strengthens the bit-identity claim beyond curated probes: 200 random
strings drawn from mixed scripts, whitespace runs, digits, punctuation and
astral-plane codepoints must encode identically.
"""

import random

import pytest

from mit_tpu.config import Config
from mit_tpu.text.tokenizer import train_tokenizer

POOLS = [
    "abcdefghijklmnopqrstuvwxyz",
    "ABCDEFGHIJKLMNOPQRSTUVWXYZ",
    "0123456789",
    " \t\n",
    ".,!?;:'\"()[]{}<>-+=/\\|@#$%^&*~`",
    "àéîöûñçßøåæœ",
    "汉字日本語한국어",
    "παλλάσαττention",
    "🙂🚀🐈🌲𝔘𝔫𝔦",
    "'s't're've'll",
]


def _rand_text(rng: random.Random, max_len=60) -> str:
    n = rng.randint(0, max_len)
    out = []
    for _ in range(n):
        pool = rng.choice(POOLS)
        out.append(rng.choice(pool))
    return "".join(out)


@pytest.fixture(scope="module")
def pair(tmp_path_factory):
    d = tmp_path_factory.mktemp("fuzz")
    cfg = Config(DATA_DIR=str(d), MAX_SEQ_LEN=64)
    corpus = [
        "the quick brown fox jumps over the lazy dog",
        "châteaux and 日本語 mixed with 123 numbers!",
        "emoji 🙂 everywhere 🙂 in captions",
        "punctuation, of; all: kinds?! (yes)",
    ] * 3
    tok = train_tokenizer(iter(corpus), 500, cfg.VOCAB_PATH, cfg.MERGES_PATH, cfg)

    from tokenizers import ByteLevelBPETokenizer

    hf = ByteLevelBPETokenizer(vocab=cfg.VOCAB_PATH, merges=cfg.MERGES_PATH)
    return tok, hf


def test_fuzz_bit_identity_python(pair):
    tok, hf = pair
    rng = random.Random(1234)
    for i in range(200):
        text = _rand_text(rng)
        ours = tok.bpe.encode_ids(text, unk_id=tok.unk_id)
        theirs = hf.encode(text).ids
        assert ours == theirs, f"case {i}: {text!r}"


def test_fuzz_bit_identity_native(pair):
    import shutil

    if shutil.which("g++") is None:
        pytest.skip("no C++ toolchain")
    from mit_tpu.text.native import NativeBPE

    tok, hf = pair
    native = NativeBPE(tok.bpe)
    rng = random.Random(99)
    for i in range(200):
        text = _rand_text(rng)
        ours = native.encode_ids(text)
        theirs = hf.encode(text).ids
        assert ours == theirs, f"case {i}: {text!r}"
