"""Multi-head attention primitives (XLA path).

Semantics match ``torch.nn.MultiheadAttention`` (the building block of the
reference's decoder, reference decoder.py:112-120): per-head scaled dot
product with additive masks, dropout on attention probabilities, linear
output projection.

TPU-first notes:
- Q/K/V projections are stored as (D, D) matrices in (in, out) layout so the
  matmuls map directly onto the MXU without transposes; the torch-weight
  converter (models/decoder.py) handles the packed-in-proj split/transpose.
- The single-key cross-attention case (CLS-only memory, the reference's
  training configuration — reference model.py:147-152) degenerates
  algebraically: softmax over one key is 1, so attention output is
  ``out_proj(v)`` independent of the queries. ``single_key_cross_attention``
  exploits that, skipping the Q/K projections and the softmax entirely.
- A Pallas fused kernel handles the self-attention hot path on TPU
  (mit_tpu/ops/pallas_attention.py); this module is the reference XLA
  implementation and the CPU/interpret fallback.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def _split_heads(x: jnp.ndarray, num_heads: int) -> jnp.ndarray:
    """(B, T, D) -> (B, H, T, D/H)."""
    b, t, d = x.shape
    return x.reshape(b, t, num_heads, d // num_heads).transpose(0, 2, 1, 3)


def _merge_heads(x: jnp.ndarray) -> jnp.ndarray:
    """(B, H, T, hd) -> (B, T, D)."""
    b, h, t, hd = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, t, h * hd)


def multihead_attention(
    params: dict,
    q_in: jnp.ndarray,
    kv_in: jnp.ndarray,
    num_heads: int,
    mask: Optional[jnp.ndarray] = None,
    dropout_rate: float = 0.0,
    rng: Optional[jax.Array] = None,
    deterministic: bool = True,
    compute_dtype=jnp.float32,
    use_flash: bool = False,
    causal: bool = False,
    pad_add: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """torch-semantics multi-head attention.

    params: {wq, wk, wv, wo: (D, D) in (in, out) layout; bq, bk, bv, bo: (D,)}
    q_in: (B, T, D) queries source; kv_in: (B, S, D) keys/values source.
    mask: additive, broadcastable to (B, H, T, S) (0 = keep, -1e9 = block).

    Fast path: with ``use_flash`` the score/mask/softmax/PV chain runs in the
    fused Pallas kernel (ops/pallas_attention.py); the mask is then expressed
    structurally as ``causal`` + per-key ``pad_add`` (B, S) instead of a
    materialized ``mask`` tensor. With active attention-prob dropout the
    dropout-fused kernel variant runs (hash-PRNG mask, identical in the
    fused backward).
    """
    d = q_in.shape[-1]
    hd = d // num_heads
    cd = compute_dtype

    dropout_active = dropout_rate > 0.0 and not deterministic
    # Dropout-active training defaults to the XLA path: measured on v5e the
    # autodiff backward (which reuses stored probabilities) beats the fused
    # kernel pair (~2670 vs ~2440 train img/s) because the fused backward
    # recomputes the forward, and activation memory is not the constraint at
    # these shapes. MIT_FUSED_DROPOUT=1 opts into the fused kernels where
    # memory matters more than FLOPs.
    import os

    fused_dropout = os.environ.get("MIT_FUSED_DROPOUT") == "1"
    flash_path = use_flash and (not dropout_active or fused_dropout)

    if q_in is kv_in and not flash_path:
        # self-attention on the XLA path: one fused (D, 3D) projection — 3x
        # the matmul N dim, fewer launches. NOT used before the Pallas
        # kernels: the split outputs force layout copies ahead of
        # pallas_call that cost more than the fusion saves (measured).
        wqkv = jnp.concatenate(
            [params["wq"], params["wk"], params["wv"]], axis=-1
        ).astype(cd)
        bqkv = jnp.concatenate(
            [params["bq"], params["bk"], params["bv"]], axis=-1
        ).astype(cd)
        q, k, v = jnp.split(q_in.astype(cd) @ wqkv + bqkv, 3, axis=-1)
    else:
        q = (q_in.astype(cd) @ params["wq"].astype(cd)) + params["bq"].astype(cd)
        k = (kv_in.astype(cd) @ params["wk"].astype(cd)) + params["bk"].astype(cd)
        v = (kv_in.astype(cd) @ params["wv"].astype(cd)) + params["bv"].astype(cd)

    if flash_path:
        has_pad = pad_add is not None
        if pad_add is None:
            # dummy zeros operand keeps the kernel signature uniform; the
            # kernel skips its add entirely when has_pad=False
            pad_add = jnp.zeros((kv_in.shape[0], kv_in.shape[1]), jnp.float32)
        if dropout_active:
            from mit_tpu.ops.pallas_dropout_attention import (
                flash_attention_dropout,
            )

            seed = jax.random.randint(
                rng, (), 0, jnp.iinfo(jnp.int32).max, dtype=jnp.int32
            )
            ctx = flash_attention_dropout(
                _split_heads(q, num_heads), _split_heads(k, num_heads),
                _split_heads(v, num_heads), pad_add, seed, causal,
                float(dropout_rate),
            )
            out = _merge_heads(ctx)
        else:
            from mit_tpu.ops.pallas_attention import (
                _btd_fits_vmem,
                flash_attention,
                flash_attention_btd,
            )

            if _btd_fits_vmem(q, k, hd):
                # native-layout kernel: no head split/merge transposes
                out = flash_attention_btd(q, k, v, pad_add, causal, hd,
                                          has_pad)
            else:  # huge models: per-head grid streams one head at a time
                ctx = flash_attention(
                    _split_heads(q, num_heads), _split_heads(k, num_heads),
                    _split_heads(v, num_heads), pad_add, causal,
                )
                out = _merge_heads(ctx)
        return (out @ params["wo"].astype(cd)) + params["bo"].astype(cd)

    qh = _split_heads(q, num_heads)  # (B, H, T, hd)
    kh = _split_heads(k, num_heads)  # (B, H, S, hd)
    vh = _split_heads(v, num_heads)

    if mask is None and (causal or pad_add is not None):
        # build the additive mask the slow path needs from the structural form
        t, s = q_in.shape[1], kv_in.shape[1]
        mask = jnp.zeros((1, 1, t, s), jnp.float32)
        if causal:
            i = jnp.arange(t)[:, None]
            j = jnp.arange(s)[None, :]
            from mit_tpu.ops.masks import NEG_INF

            mask = mask + jnp.where(j <= i, 0.0, NEG_INF)[None, None]
        if pad_add is not None:
            mask = mask + pad_add[:, None, None, :]

    scores = jnp.einsum(
        "bhtd,bhsd->bhts", qh, kh, preferred_element_type=jnp.float32
    ) / jnp.sqrt(jnp.float32(hd))
    if mask is not None:
        scores = scores + mask.astype(scores.dtype)
    probs = jax.nn.softmax(scores, axis=-1)

    if dropout_active:
        keep = jax.random.bernoulli(rng, 1.0 - dropout_rate, probs.shape)
        probs = jnp.where(keep, probs / (1.0 - dropout_rate), 0.0)

    ctx = jnp.einsum(
        "bhts,bhsd->bhtd",
        probs.astype(cd),
        vh,
        preferred_element_type=jnp.float32,
    ).astype(cd)
    out = _merge_heads(ctx)
    return (out @ params["wo"].astype(cd)) + params["bo"].astype(cd)


def single_key_cross_attention(
    params: dict,
    q_len: int,
    kv_in: jnp.ndarray,
    num_heads: int,
    dropout_rate: float = 0.0,
    rng: Optional[jax.Array] = None,
    deterministic: bool = True,
    compute_dtype=jnp.float32,
) -> jnp.ndarray:
    """Cross-attention fast path for memory of length 1 (CLS-only mode).

    softmax over a single key is identically 1, so for every query position
    the attention context is just that key's value vector:
        out = out_proj(v_proj(memory))            (broadcast over T)
    Q/K projections and the (B, H, T, 1) softmax vanish — this removes the
    whole cross-attention score pipeline from the reference's hot loop
    (reference model.py:147-158 feeds exactly this shape).

    Attention-prob dropout (torch applies it even to the single-key row,
    zeroing whole rows with prob p) is reproduced with a (B, H, T, 1)
    Bernoulli mask so training statistics match the general path.

    kv_in: (B, 1, D). Returns (B, q_len, D).
    """
    cd = compute_dtype
    b, s, d = kv_in.shape
    assert s == 1, "single_key_cross_attention requires memory length 1"
    hd = d // num_heads

    v = (kv_in.astype(cd) @ params["wv"].astype(cd)) + params["bv"].astype(cd)
    # (B, 1, D) -> per-head (B, H, 1, hd), broadcast to every query position.
    vh = v.reshape(b, 1, num_heads, hd).transpose(0, 2, 1, 3)
    ctx = jnp.broadcast_to(vh, (b, num_heads, q_len, hd))

    if dropout_rate > 0.0 and not deterministic:
        keep = jax.random.bernoulli(
            rng, 1.0 - dropout_rate, (b, num_heads, q_len, 1)
        )
        ctx = jnp.where(keep, ctx / (1.0 - dropout_rate), 0.0)

    out = _merge_heads(ctx)
    return (out @ params["wo"].astype(cd)) + params["bo"].astype(cd)


def layer_norm(params: dict, x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """LayerNorm matching torch defaults (eps=1e-5), computed in fp32."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    return (y * params["scale"] + params["bias"]).astype(x.dtype)
