"""Batched KV-cached beam search.

The reference *declares* beam search (``BEAM_SIZE=3``, reference
config.py:137; ``method='beam'`` arm in model.py:244-252) but ships a
placeholder that falls back to greedy. This is the real implementation:

- log-probability beam search over K beams per item, batched (B·K rows run
  through one jitted decoder step);
- finished beams are frozen: they only ever extend with PAD at score 0, so
  their totals stay comparable while alive beams keep expanding;
- beam reordering gathers the KV cache along the batch axis each step;
- the returned hypothesis is the highest total log-probability beam across
  finished and max-length-unfinished candidates (HF semantics, no length
  penalty), in greedy's output format — verified globally optimal against
  brute-force enumeration when the width covers the whole frontier
  (tests/test_beam_optimality.py).

With ``beam_size=1`` this reduces exactly to greedy decoding (tested).
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from mit_tpu.models.decoder import DecoderConfig
from mit_tpu.decode.step import (
    decoder_step,
    grow_cache,
    init_cache,
    prepare_decode_params,
    reindex_cache,
)

_NEG = -1e30


@partial(
    jax.jit,
    static_argnames=("cfg", "start_id", "end_id", "pad_id", "max_len",
                     "beam_size", "compute_dtype", "bucket_sizes"),
)
def beam_generate(
    params: dict,
    cfg: DecoderConfig,
    memory: jnp.ndarray,               # (B, S, D)
    start_id: int,
    end_id: int,
    pad_id: int,
    max_len: int,
    beam_size: int = 3,
    memory_padding_mask: Optional[jnp.ndarray] = None,
    compute_dtype=jnp.float32,
    bucket_sizes: Optional[Tuple[int, ...]] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """→ (tokens (B, max_len), scores (B,)) — best beam per item.

    ``scores`` is the sum of token log-probabilities of the returned beam.

    Uses the same KV-cache growth ladder as greedy/sampling (one
    ``while_loop`` per static cache size, the cache copied up only while
    some beam is alive) — at B·K decoder rows the masked-tail traffic of a
    full-size cache is K× greedy's, so the cut matters even more here.
    """
    b, s, d = memory.shape
    k = beam_size
    v = cfg.vocab_size
    if max_len > cfg.max_seq_len:
        raise ValueError(
            f"max_len={max_len} exceeds the positional table "
            f"(max_seq_len={cfg.max_seq_len}); positions past it would "
            "silently clamp."
        )

    from mit_tpu.decode.greedy import check_bucket_sizes

    bucket_sizes = check_bucket_sizes(bucket_sizes, max_len)

    # Expand memory to (B*K, S, D): rows grouped per item [i0b0..i0bk, i1b0..].
    mem = jnp.repeat(memory, k, axis=0)
    mem_mask = (
        None if memory_padding_mask is None else jnp.repeat(memory_padding_mask, k, 0)
    )
    cache = init_cache(params, cfg, mem, mem_mask, bucket_sizes[0],
                       compute_dtype)
    # cast + qkv-fuse weights once, outside the decode loop
    params = prepare_decode_params(params, compute_dtype)

    tokens = jnp.full((b * k, max_len), pad_id, jnp.int32).at[:, 0].set(start_id)
    finished = jnp.zeros((b, k), bool)
    # Only beam 0 of each item is alive at step 0 (all beams are identical
    # copies of START; without this, top-k would pick k duplicates).
    scores = jnp.where(jnp.arange(k)[None, :] == 0, 0.0, _NEG)
    scores = jnp.broadcast_to(scores, (b, k))

    item_offset = (jnp.arange(b) * k)[:, None]          # (B,1)

    def make_cond(bucket):
        def cond(state):
            pos, tokens, scores, finished, cache = state
            running = jnp.logical_and(pos < max_len - 1, ~jnp.all(finished))
            return jnp.logical_and(running, pos < bucket)

        return cond

    def make_body(bucket):
        def body(state):
            pos, tokens, scores, finished, cache = state
            cur = jax.lax.dynamic_index_in_dim(
                tokens, pos, axis=1, keepdims=False
            )
            logits, cache = decoder_step(
                params, cfg, cur, pos, cache, compute_dtype,
                key_pad=(tokens == pad_id)[:, :bucket],
            )
            logp = jax.nn.log_softmax(logits, axis=-1).reshape(b, k, v)

            # Finished beams: force PAD continuation at zero incremental
            # score.
            pad_onehot = jnp.where(
                jnp.arange(v)[None, None, :] == pad_id, 0.0, _NEG
            )
            logp = jnp.where(finished[..., None], pad_onehot, logp)

            total = scores[..., None] + logp             # (B, K, V)
            flat = total.reshape(b, k * v)
            new_scores, flat_idx = jax.lax.top_k(flat, k)   # (B, K)
            src_beam = flat_idx // v                     # (B, K) parent beam
            new_tok = (flat_idx % v).astype(jnp.int32)   # (B, K)

            gather = (item_offset + src_beam).reshape(-1)  # (B*K,) rows
            tokens = jnp.take(tokens, gather, axis=0)
            tokens = tokens.at[:, pos + 1].set(new_tok.reshape(-1))
            cache = reindex_cache(cache, gather)
            finished = jnp.take_along_axis(finished, src_beam, axis=1)
            finished = jnp.logical_or(finished, new_tok == end_id)
            return pos + 1, tokens, new_scores, finished, cache

        return body

    state = (jnp.asarray(0, jnp.int32), tokens, scores, finished, cache)
    for i, bucket in enumerate(bucket_sizes):
        if i > 0:
            pos, tokens, scores, finished, cache = state
            state = (pos, tokens, scores, finished, grow_cache(cache, bucket))
        state = jax.lax.while_loop(make_cond(bucket), make_body(bucket), state)
    _, tokens, scores, finished, _ = state

    # Final hypothesis = highest total log-probability, finished or not:
    # finished beams stopped accumulating (PAD extensions at score 0), so
    # raw sums compare fairly — the same rule HF-style beam search applies
    # when unfinished beams reach max length (no length penalty).
    best = jnp.argmax(scores, axis=1)                    # (B,)
    rows = jnp.arange(b) * k + best
    return jnp.take(tokens, rows, axis=0), jnp.take_along_axis(
        scores, best[:, None], axis=1
    )[:, 0]
