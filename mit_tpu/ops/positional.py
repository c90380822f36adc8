"""Sinusoidal positional encodings.

Reference: decoder.py:16-72 (``PositionalEncodingBatchFirst``) — the standard
sin/cos table added to scaled token embeddings.

TPU-first: the table is a pure function of (max_len, d_model); under jit it
is constant-folded by XLA into the compiled executable, so there is no
"buffer" to manage (the reference registers a torch buffer, decoder.py:55).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def sinusoid_table(max_len: int, d_model: int, dtype=jnp.float32) -> jnp.ndarray:
    """(max_len, d_model) table; even dims sin, odd dims cos.

    Formula matches reference decoder.py:33-47 exactly (including the
    ``exp(-log(10000)/d * 2k)`` frequency layout) for logit parity.
    """
    position = np.arange(max_len, dtype=np.float64)[:, None]
    div_term = np.exp(
        np.arange(0, d_model, 2, dtype=np.float64) * (-np.log(10000.0) / d_model)
    )
    pe = np.zeros((max_len, d_model), dtype=np.float64)
    pe[:, 0::2] = np.sin(position * div_term)
    pe[:, 1::2] = np.cos(position * div_term[: d_model // 2])
    return jnp.asarray(pe, dtype=dtype)


def add_positional(x: jnp.ndarray, table: jnp.ndarray) -> jnp.ndarray:
    """Add the first T rows of the table to x of shape (B, T, D)."""
    t = x.shape[1]
    return x + table[None, :t, :].astype(x.dtype)
