"""ctypes binding for the C++ byte-level BPE encode fast path.

Converts the loaded tokenizer's vocab/merges from byte-level *unicode*
strings back to raw *byte* strings (the GPT-2 alphabet is a byte bijection,
so the BPE merge process is isomorphic over bytes) and hands them to
``native/libbpe_core.so``. Pre-tokenization (the GPT-2 regex) stays in
Python's C-backed ``regex`` module; the per-word merge loop — the O(n²)
hot part — runs in C++.

Falls back silently: ``Tokenizer.use_native()`` returns False when the
shared library is missing and cannot be built.
"""

from __future__ import annotations

import ctypes
import os
import struct
import subprocess
from typing import List

from mit_tpu.text.bpe import ByteLevelBPE, _GPT2_PAT, unicode_to_bytes

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_LIB_PATH = os.path.abspath(os.path.join(_NATIVE_DIR, "libbpe_core.so"))


def _ensure_lib() -> str:
    if not os.path.exists(_LIB_PATH):
        subprocess.run(
            ["make", "-C", os.path.dirname(_LIB_PATH)],
            check=True,
            capture_output=True,
        )
    return _LIB_PATH


def _to_bytes(token: str) -> bytes:
    """Byte-level unicode token string → raw bytes (inverse alphabet map)."""
    u2b = unicode_to_bytes()
    out = bytearray()
    for ch in token:
        b = u2b.get(ch)
        if b is None:
            out.extend(ch.encode("utf-8"))  # special tokens like <PAD>
        else:
            out.append(b)
    return bytes(out)


class NativeBPE:
    def __init__(self, bpe: ByteLevelBPE):
        lib = ctypes.CDLL(_ensure_lib())
        lib.bpe_create.restype = ctypes.c_void_p
        lib.bpe_create.argtypes = [
            ctypes.c_char_p, ctypes.c_int32,
            ctypes.c_char_p, ctypes.c_int32, ctypes.c_int32,
        ]
        lib.bpe_encode_words.restype = ctypes.c_int32
        lib.bpe_encode_words.argtypes = [
            ctypes.c_void_p, ctypes.c_char_p, ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int32,
        ]
        lib.bpe_free.argtypes = [ctypes.c_void_p]
        self._lib = lib

        tokens_blob = bytearray()
        for tok, tid in bpe.vocab.items():
            raw = _to_bytes(tok)
            tokens_blob += struct.pack("<I", len(raw)) + raw + struct.pack("<i", tid)
        merges_blob = bytearray()
        ordered = sorted(bpe.merge_ranks.items(), key=lambda kv: kv[1])
        for (a, b), _ in ordered:
            ra, rb = _to_bytes(a), _to_bytes(b)
            merges_blob += struct.pack("<I", len(ra)) + ra
            merges_blob += struct.pack("<I", len(rb)) + rb

        unk = bpe.vocab.get("<UNK>", -1)
        self._handle = lib.bpe_create(
            bytes(tokens_blob), len(bpe.vocab), bytes(merges_blob), len(ordered),
            unk,
        )
        if not self._handle:
            raise RuntimeError("bpe_create failed")

    def encode_ids(self, text: str) -> List[int]:
        words = [m.group().encode("utf-8") for m in _GPT2_PAT.finditer(text)]
        if not words:
            return []
        blob = bytearray()
        total = 0
        for w in words:
            blob += struct.pack("<I", len(w)) + w
            total += len(w)
        max_out = total + 8
        out = (ctypes.c_int32 * max_out)()
        n = self._lib.bpe_encode_words(
            self._handle, bytes(blob), len(words), out, max_out
        )
        if n < 0:
            raise RuntimeError("bpe_encode_words: output buffer too small")
        return list(out[:n])

    def __del__(self):
        try:
            if getattr(self, "_handle", None):
                self._lib.bpe_free(self._handle)
        except Exception:
            pass
