"""Tokenizer tests: bit-identity vs HF `tokenizers`, round-trips, padding.

Coverage intent mirrors the reference's self-test (tokenizer.py:355-461):
train a small BPE, reload from files, round-trip encode/decode, verify
special-token IDs, padding, and truncation — upgraded to real asserts and a
bit-identity check against the HF library output (BASELINE.md requirement).
"""

import json
import os

import numpy as np
import pytest

from mit_tpu.config import Config
from mit_tpu.text import tokenizer as tok_mod
from mit_tpu.text.bpe import ByteLevelBPE, bytes_to_unicode
from mit_tpu.text.tokenizer import Tokenizer, train_tokenizer

CAPTIONS = [
    "A black cat sat on a mat.",
    "Another cat, this one white, sat on the same mat.",
    "Why do cats like mats so much? It is a mystery.",
    "Maybe the mat is comfortable for the cat.",
    "The cat sleeps on the mat all day.",
    "Two dogs are running through a grassy field together.",
    "A man in a red shirt climbs a steep rock face.",
    "Children play soccer on a sunny afternoon in the park.",
    "A woman reading a book next to a window with coffee.",
    "The quick brown fox jumps over the lazy dog 42 times!",
]


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    d = tmp_path_factory.mktemp("tok")
    cfg = Config(DATA_DIR=str(d), MAX_SEQ_LEN=24)
    vocab_path = os.path.join(str(d), "vocab.json")
    merges_path = os.path.join(str(d), "merges.txt")
    tok = train_tokenizer(iter(CAPTIONS), 400, vocab_path, merges_path, cfg)
    return cfg, tok, vocab_path, merges_path


def test_byte_map_size():
    m = bytes_to_unicode()
    assert len(m) == 256
    assert len(set(m.values())) == 256
    assert m[ord("A")] == "A"
    assert m[ord(" ")] == "Ġ"  # 'Ġ'


def test_special_token_ids_derived_from_vocab(trained):
    _, tok, _, _ = trained
    # Trained order is [PAD, UNK, START, END] (reference tokenizer.py:202-208).
    assert tok.pad_id == 0
    assert tok.unk_id == 1
    assert tok.start_id == 2
    assert tok.end_id == 3


def test_config_with_tokenizer_ids(trained):
    cfg, tok, _, _ = trained
    cfg2 = cfg.with_tokenizer_ids(tok)
    assert cfg2.START_TOKEN_ID == tok.start_id
    assert cfg2.END_TOKEN_ID == tok.end_id
    assert cfg2.UNK_TOKEN_ID == tok.unk_id
    assert cfg2.PAD_TOKEN_ID == tok.pad_id


def test_bit_identity_vs_hf(trained):
    """Our encoder must be bit-identical to the HF library pipeline."""
    cfg, tok, vocab_path, merges_path = trained
    from tokenizers import ByteLevelBPETokenizer
    from tokenizers.processors import BertProcessing

    hf = ByteLevelBPETokenizer(vocab=vocab_path, merges=merges_path)
    sid = hf.token_to_id(cfg.START_TOKEN)
    eid = hf.token_to_id(cfg.END_TOKEN)
    hf._tokenizer.post_processor = BertProcessing(
        sep=(cfg.END_TOKEN, eid), cls=(cfg.START_TOKEN, sid)
    )
    hf.enable_padding(pad_id=0, pad_token=cfg.PAD_TOKEN, length=cfg.MAX_SEQ_LEN)
    hf.enable_truncation(max_length=cfg.MAX_SEQ_LEN)

    probes = CAPTIONS + [
        "unseen words zebra quixotic 12345 !!",
        "  leading and   multiple   spaces ",
        "caffè latte – naïve résumé 😀",
        "the cat sat " * 30,  # forces truncation
        "",
        "a",
    ]
    for text in probes:
        ours = tok.encode(text)
        theirs = hf.encode(text).ids
        assert ours == theirs, f"mismatch on {text!r}:\n {ours}\n {theirs}"


def test_roundtrip_decode(trained):
    _, tok, _, _ = trained
    text = "A black cat sat on a mat."
    ids = tok.encode(text, pad=False)
    assert ids[0] == tok.start_id and ids[-1] == tok.end_id
    assert tok.decode(ids) == text


def test_decode_keeps_specials_when_asked(trained):
    _, tok, _, _ = trained
    ids = tok.encode("a cat", pad=False)
    s = tok.decode(ids, skip_special_tokens=False)
    assert s.startswith("<START>") and s.endswith("<END>")


def test_truncation_and_padding_shapes(trained):
    cfg, tok, _, _ = trained
    long = "the cat sat on the mat " * 50
    ids = tok.encode(long)
    assert len(ids) == cfg.MAX_SEQ_LEN
    assert ids[0] == tok.start_id and ids[-1] == tok.end_id
    short = tok.encode("a")
    assert len(short) == cfg.MAX_SEQ_LEN
    assert short[-1] == tok.pad_id


def test_encode_batch_shape(trained):
    cfg, tok, _, _ = trained
    arr = tok.encode_batch(CAPTIONS[:4])
    assert arr.shape == (4, cfg.MAX_SEQ_LEN)
    assert arr.dtype == np.int32


def test_save_reload_identical(trained, tmp_path):
    cfg, tok, vocab_path, merges_path = trained
    v2 = str(tmp_path / "v.json")
    m2 = str(tmp_path / "m.txt")
    tok.bpe.save(v2, m2)
    re = ByteLevelBPE.from_files(v2, m2)
    assert re.vocab == tok.bpe.vocab
    assert re.merge_ranks == tok.bpe.merge_ranks


def test_vocab_file_format_matches_hf(trained):
    """vocab.json from HF training parses and starts with the 4 specials."""
    cfg, _, vocab_path, _ = trained
    with open(vocab_path) as f:
        v = json.load(f)
    assert v[cfg.PAD_TOKEN] == 0
    assert v[cfg.UNK_TOKEN] == 1
    assert v[cfg.START_TOKEN] == 2
    assert v[cfg.END_TOKEN] == 3


def test_helper_functions(trained):
    cfg, tok, _, _ = trained
    tok_mod._tokenizer_instance = tok
    try:
        assert tok_mod.get_tokenizer_vocab_size() == tok.get_vocab_size()
        assert tok_mod.get_token_id(cfg.PAD_TOKEN) == 0
        # unknown token falls back to UNK id (reference tokenizer.py:342-352)
        assert tok_mod.get_token_id("definitely-not-a-token-xyz") == tok.unk_id
        ids = tok_mod.encode_text("a cat")
        assert tok_mod.decode_ids(ids) == "a cat"
    finally:
        tok_mod._tokenizer_instance = None
