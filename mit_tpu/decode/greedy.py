"""Batched KV-cached greedy decoding.

Semantics match the reference's greedy loop exactly (reference
model.py:219-242): start from START, argmax the last position's logits,
append, stop at END — generalized to a batch with per-sequence END tracking
(``lax.while_loop`` exits as soon as every sequence has finished, preserving
the reference's early-stop behavior without dynamic shapes).
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from mit_tpu.models.decoder import DecoderConfig
from mit_tpu.decode.step import (
    DecodeCache,
    decoder_step,
    init_cache,
    prepare_decode_params,
)


@partial(
    jax.jit,
    static_argnames=("cfg", "start_id", "end_id", "pad_id", "max_len",
                     "compute_dtype"),
)
def greedy_generate(
    params: dict,
    cfg: DecoderConfig,
    memory: jnp.ndarray,               # (B, S, D) projected decoder memory
    start_id: int,
    end_id: int,
    pad_id: int,
    max_len: int,
    memory_padding_mask: Optional[jnp.ndarray] = None,
    compute_dtype=jnp.float32,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """→ (tokens (B, max_len) incl. leading START, lengths (B,)).

    ``lengths`` counts tokens incl. START and END (when generated).
    Positions past a sequence's END hold PAD.
    """
    b = memory.shape[0]
    cache = init_cache(
        params, cfg, memory, memory_padding_mask, max_len, compute_dtype
    )
    # cast + qkv-fuse weights once, outside the decode loop
    params = prepare_decode_params(params, compute_dtype)
    tokens = jnp.full((b, max_len), pad_id, jnp.int32)
    tokens = tokens.at[:, 0].set(start_id)
    finished = jnp.zeros((b,), bool)

    def cond(state):
        pos, tokens, finished, cache = state
        return jnp.logical_and(pos < max_len - 1, ~jnp.all(finished))

    def body(state):
        pos, tokens, finished, cache = state
        cur = jax.lax.dynamic_index_in_dim(tokens, pos, axis=1, keepdims=False)
        logits, cache = decoder_step(
            params, cfg, cur, pos, cache, compute_dtype,
            key_pad=tokens == pad_id,
        )
        nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        nxt = jnp.where(finished, pad_id, nxt)
        tokens = tokens.at[:, pos + 1].set(nxt)
        finished = jnp.logical_or(finished, nxt == end_id)
        return pos + 1, tokens, finished, cache

    _, tokens, finished, _ = jax.lax.while_loop(
        cond, body, (jnp.asarray(0, jnp.int32), tokens, finished, cache)
    )
    lengths = jnp.sum(tokens != pad_id, axis=1)
    return tokens, lengths


def greedy_generate_uncached(
    params: dict,
    cfg: DecoderConfig,
    memory: jnp.ndarray,
    start_id: int,
    end_id: int,
    pad_id: int,
    max_len: int,
) -> jnp.ndarray:
    """Reference-algorithm greedy decode WITHOUT the KV cache: re-runs the
    full decoder over the growing prefix each step, exactly like reference
    model.py:221-240. Used as the equivalence oracle for the cached path
    (and as a readable spec); O(T²) — do not use in production."""
    from mit_tpu.models.decoder import decoder_forward
    import numpy as np

    b = memory.shape[0]
    seqs = [[start_id] for _ in range(b)]
    done = [False] * b
    for _ in range(max_len - 1):
        t = max(len(s) for s in seqs)
        batch = np.full((b, t), pad_id, np.int32)
        for i, s in enumerate(seqs):
            batch[i, : len(s)] = s
        logits = decoder_forward(params, cfg, jnp.asarray(batch), memory)
        for i in range(b):
            if done[i]:
                continue
            nxt = int(jnp.argmax(logits[i, len(seqs[i]) - 1]))
            seqs[i].append(nxt)
            if nxt == end_id:
                done[i] = True
        if all(done):
            break
    out = np.full((b, max_len), pad_id, np.int32)
    for i, s in enumerate(seqs):
        out[i, : len(s)] = s[:max_len]
    return jnp.asarray(out)
