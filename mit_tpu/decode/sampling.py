"""Stochastic decoding: temperature / top-k / top-p sampling.

Beyond the reference's surface (greedy + beam placeholder, reference
model.py:218-255) — a serving framework needs stochastic decoding for
caption diversity. Same KV-cached machinery as greedy; the token choice is
a categorical draw over a filtered, temperature-scaled distribution.

All filtering happens with static shapes: top-k via ``lax.top_k`` + value
threshold, top-p via sorted cumulative mass with the standard
"keep the first token that crosses p" rule.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from mit_tpu.models.decoder import DecoderConfig
from mit_tpu.decode.step import init_cache, prepare_decode_params

_NEG = -1e30


def filter_logits(
    logits: jnp.ndarray,               # (B, V) fp32
    temperature: float = 1.0,
    top_k: int = 0,
    top_p: float = 1.0,
) -> jnp.ndarray:
    """Scale by temperature, then mask everything outside top-k / top-p."""
    if temperature != 1.0:
        logits = logits / jnp.maximum(temperature, 1e-6)
    if top_k and top_k > 0:
        kth = jax.lax.top_k(logits, top_k)[0][:, -1:]
        logits = jnp.where(logits < kth, _NEG, logits)
    if top_p < 1.0:
        sorted_logits = jnp.sort(logits, axis=-1)[:, ::-1]
        probs = jax.nn.softmax(sorted_logits, axis=-1)
        cum = jnp.cumsum(probs, axis=-1)
        # keep tokens while the mass *before* them is < p (always ≥ 1 token)
        keep_sorted = (cum - probs) < top_p
        # threshold logit = smallest kept logit per row
        thresh = jnp.min(
            jnp.where(keep_sorted, sorted_logits, jnp.inf), axis=-1, keepdims=True
        )
        logits = jnp.where(logits < thresh, _NEG, logits)
    return logits


@partial(
    jax.jit,
    static_argnames=("cfg", "start_id", "end_id", "pad_id", "max_len",
                     "temperature", "top_k", "top_p", "compute_dtype",
                     "bucket_sizes"),
)
def sample_generate(
    params: dict,
    cfg: DecoderConfig,
    memory: jnp.ndarray,               # (B, S, D)
    rng: jax.Array,
    start_id: int,
    end_id: int,
    pad_id: int,
    max_len: int,
    temperature: float = 1.0,
    top_k: int = 0,
    top_p: float = 1.0,
    memory_padding_mask: Optional[jnp.ndarray] = None,
    compute_dtype=jnp.float32,
    bucket_sizes: Optional[Tuple[int, ...]] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """→ (tokens (B, max_len), lengths (B,)); greedy loop with a sampled
    next-token rule. temperature=0 degenerates to argmax (greedy).

    Uses the same KV-cache growth ladder as greedy_generate (see
    laddered_decode_loop): short sampled captions never pay HBM reads for
    the masked max_len cache tail."""
    from mit_tpu.decode.greedy import check_bucket_sizes, laddered_decode_loop

    b = memory.shape[0]
    if max_len > cfg.max_seq_len:
        raise ValueError(
            f"max_len={max_len} exceeds the positional table "
            f"(max_seq_len={cfg.max_seq_len}); positions past it would "
            "silently clamp."
        )
    bucket_sizes = check_bucket_sizes(bucket_sizes, max_len)
    cache = init_cache(params, cfg, memory, memory_padding_mask,
                       bucket_sizes[0], compute_dtype)
    prepared = prepare_decode_params(params, compute_dtype)
    tokens = jnp.full((b, max_len), pad_id, jnp.int32).at[:, 0].set(start_id)

    def select(logits, rng):
        if temperature == 0.0:
            return jnp.argmax(logits, axis=-1), rng
        filtered = filter_logits(logits, temperature, top_k, top_p)
        rng, sub = jax.random.split(rng)
        return jax.random.categorical(sub, filtered), rng

    tokens, _, _ = laddered_decode_loop(
        prepared, cfg, cache, tokens, select, rng, end_id, pad_id, max_len,
        bucket_sizes, compute_dtype,
    )
    return tokens, jnp.sum(tokens != pad_id, axis=1)
