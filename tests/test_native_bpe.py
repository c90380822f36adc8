"""C++ BPE fast path: bit-identity with the Python reference implementation
(and hence with the HF library, which the Python path is tested against)."""

import os
import shutil

import pytest

from mit_tpu.config import Config
from mit_tpu.text.tokenizer import train_tokenizer

pytestmark = pytest.mark.skipif(
    shutil.which("make") is None or shutil.which("g++") is None,
    reason="no C++ toolchain",
)

CAPTIONS = [
    "A black cat sat on a mat.",
    "Two dogs are running through a grassy field together.",
    "A man in a red shirt climbs a steep rock face.",
    "Children play soccer on a sunny afternoon in the park.",
    "The quick brown fox jumps over the lazy dog 42 times!",
]


@pytest.fixture(scope="module")
def tok(tmp_path_factory):
    d = tmp_path_factory.mktemp("ntok")
    cfg = Config(DATA_DIR=str(d), MAX_SEQ_LEN=32)
    return train_tokenizer(
        iter(CAPTIONS), 400,
        os.path.join(str(d), "vocab.json"), os.path.join(str(d), "merges.txt"),
        cfg,
    )


def test_native_builds_and_attaches(tok):
    assert tok.use_native(), "C++ BPE library failed to build/load"
    assert tok._native is not None


def test_native_bit_identity(tok):
    from mit_tpu.text.native import NativeBPE

    native = NativeBPE(tok.bpe)
    probes = CAPTIONS + [
        "",
        "a",
        "unseen zebra words 999",
        "  múltiple   spaces and unicode café 😀",
        "the cat sat " * 40,
    ]
    for text in probes:
        py = tok.bpe.encode_ids(text, unk_id=tok.unk_id)
        cc = native.encode_ids(text)
        assert py == cc, f"mismatch on {text!r}: {py} vs {cc}"


def test_tokenizer_encode_same_with_native(tok):
    baseline = [tok.encode(t) for t in CAPTIONS]
    assert tok.use_native()
    with_native = [tok.encode(t) for t in CAPTIONS]
    assert baseline == with_native
    tok._native = None  # detach for other tests


def test_native_throughput_sane(tok):
    """The C++ path should not be slower than pure Python (cold cache)."""
    import time

    from mit_tpu.text.native import NativeBPE

    text = " ".join(CAPTIONS) * 50
    native = NativeBPE(tok.bpe)

    # The correctness contract is bit-identity; the speed check is a smoke
    # test. Wall-clock on a loaded 1-CPU box is noisy, so compare the
    # MEDIAN of several interleaved trials and keep a generous bound — a
    # genuine pathology (native slower than Python by 5x) still fails.
    t_py, t_cc = [], []
    py = cc = None
    for _ in range(5):
        tok.bpe._word_cache.clear()
        t0 = time.perf_counter()
        py = tok.bpe.encode_ids(text, unk_id=tok.unk_id)
        t_py.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        cc = native.encode_ids(text)
        t_cc.append(time.perf_counter() - t0)
    assert py == cc
    t_py.sort()
    t_cc.sort()
    assert t_cc[2] < t_py[2] * 5.0, (t_py, t_cc)
