"""First-party BPE trainer: bit-identity with the HF `tokenizers` trainer
on vocab.json AND merges.txt across varied corpora."""

import json
import os

import pytest

from mit_tpu.text.train_bpe import train_bpe, train_bpe_files

SPECIALS = ["<PAD>", "<UNK>", "<START>", "<END>"]


def _hf_train(caps, vocab_size, tmp, min_frequency=2):
    from tokenizers import ByteLevelBPETokenizer

    t = ByteLevelBPETokenizer()
    t.train_from_iterator(
        caps, vocab_size=vocab_size, min_frequency=min_frequency,
        special_tokens=SPECIALS,
    )
    d = str(tmp)
    t.save_model(d)
    vocab = json.load(open(os.path.join(d, "vocab.json")))
    merges = [
        l.rstrip("\n")
        for l in open(os.path.join(d, "merges.txt"))
        if not l.startswith("#version") and l.strip()
    ]
    return vocab, merges


CORPORA = {
    "captions": [
        "A black cat sat on a mat.",
        "Another cat, this one white, sat on the same mat.",
        "Why do cats like mats so much? It is a mystery.",
        "Maybe the mat is comfortable for the cat.",
        "The cat sleeps on the mat all day.",
        "Two dogs are running through a grassy field together.",
        "A man in a red shirt climbs a steep rock face.",
        "Children play soccer on a sunny afternoon in the park.",
    ],
    "ties": ["xy", "xy", "qr", "qr", "ab cd ab cd", "abc abc def def"],
    "overlaps": ["aaa aaa", "zzzz zzzz yyy", "aaaa bbb aaaa bbb"],
    "unicode": ["café naïve résumé", "café au lait ☕", "naïve café déjà vu"],
    "numbers": ["route 66 and 66 times 42", "42 42 cats, 66 dogs!"],
}


@pytest.mark.parametrize("name", list(CORPORA))
@pytest.mark.parametrize("vocab_size", [280, 320, 500])
def test_trainer_bit_identity(name, vocab_size, tmp_path):
    caps = CORPORA[name]
    ref_vocab, ref_merges = _hf_train(caps, vocab_size, tmp_path)
    ours = train_bpe(caps, vocab_size, SPECIALS, min_frequency=2)
    our_merges = [
        f"{a} {b}"
        for (a, b), _ in sorted(ours.merge_ranks.items(), key=lambda kv: kv[1])
    ]
    assert our_merges == ref_merges, f"{name}/{vocab_size} merges differ"
    assert ours.vocab == ref_vocab, f"{name}/{vocab_size} vocab differs"


def test_trainer_min_frequency_respected(tmp_path):
    caps = ["ab", "cd"]  # every pair appears once → no merges at minfreq 2
    ours = train_bpe(caps, 1000, SPECIALS, min_frequency=2)
    assert len(ours.merge_ranks) == 0
    ref_vocab, ref_merges = _hf_train(caps, 1000, tmp_path)
    assert ref_merges == []
    assert ours.vocab == ref_vocab


def test_trained_files_load_into_tokenizer(tmp_path):
    from mit_tpu.config import Config
    from mit_tpu.text.tokenizer import Tokenizer

    vp = str(tmp_path / "vocab.json")
    mp = str(tmp_path / "merges.txt")
    train_bpe_files(CORPORA["captions"], 400, vp, mp, SPECIALS)
    cfg = Config(DATA_DIR=str(tmp_path), MAX_SEQ_LEN=24)
    tok = Tokenizer.from_files(vp, mp, cfg)
    ids = tok.encode("A black cat sat on a mat.", pad=False)
    assert tok.decode(ids) == "A black cat sat on a mat."


def test_trained_files_loadable_by_hf_lib(tmp_path):
    """Interchange: HF library must load and agree with our trained files."""
    from tokenizers import ByteLevelBPETokenizer

    vp = str(tmp_path / "vocab.json")
    mp = str(tmp_path / "merges.txt")
    ours = train_bpe_files(CORPORA["captions"], 400, vp, mp, SPECIALS)
    hf = ByteLevelBPETokenizer(vocab=vp, merges=mp)
    for text in CORPORA["captions"]:
        assert hf.encode(text).ids == ours.encode_ids(text)
