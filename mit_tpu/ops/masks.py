"""Attention mask utilities.

Reference: utils.py:11-70 (``generate_square_subsequent_mask`` — additive
causal mask of 0/-inf floats — and ``create_padding_mask`` — boolean (B, T)
with True at PAD positions).

TPU-first note: on the hot path these masks are *not* materialized as
(T, T) tensors fed to attention — the fused attention kernels apply causal
and padding masking from indices (see mit_tpu/ops/attention.py and the
Pallas kernels). These helpers exist for the general/XLA path and to keep
semantic parity testable against the reference.
"""

from __future__ import annotations

import jax.numpy as jnp

# Large-negative instead of -inf: with fully-masked rows, -inf softmax rows
# produce NaNs; a finite large-negative keeps XLA's softmax well-defined while
# being exactly 0 after softmax in every practical dtype.
NEG_INF = -1e9


def causal_mask(sz: int, dtype=jnp.float32) -> jnp.ndarray:
    """Additive causal mask (sz, sz): 0 where j <= i, -inf-like where j > i.

    Semantics match reference utils.py:11-37 (position i attends to 0..i).
    """
    i = jnp.arange(sz)[:, None]
    j = jnp.arange(sz)[None, :]
    return jnp.where(j <= i, 0.0, NEG_INF).astype(dtype)


def padding_mask(seq: jnp.ndarray, pad_idx: int) -> jnp.ndarray:
    """Boolean (B, T) mask, True at PAD positions (reference utils.py:47-70)."""
    return seq == pad_idx


def combine_causal_and_padding(
    sz: int, seq: jnp.ndarray, pad_idx: int, dtype=jnp.float32
) -> jnp.ndarray:
    """Additive (B, 1, T, T) mask merging causal and key-padding masks.

    Broadcastable over heads; equivalent to what torch's MultiheadAttention
    builds internally from ``attn_mask`` + ``key_padding_mask``.
    """
    c = causal_mask(sz, dtype)[None, None, :, :]
    p = jnp.where(padding_mask(seq, pad_idx), NEG_INF, 0.0).astype(dtype)
    return c + p[:, None, None, :]
