"""Single-token decoder step with KV cache.

The reference's generate loop re-runs the FULL decoder over the growing
prefix every step — O(T²) layer work per caption with no cache (reference
model.py:219-242, flagged in its own comments). Here each step costs O(T)
attention reads against a static-shape KV cache, jit-compiled once:

- self-attention K/V live in L per-layer (B, T_max, D) cache buffers.
  The layout keeps D=512 on the lane dimension — a per-head (..., hd=64)
  trailing dim would pad to the 128-lane tile and double every step's
  cache read bytes; heads split via a free reshape at the einsum instead
  (same layout the serving step uses). Two properties make the per-step
  cache traffic the ~2 new rows it should be instead of a full-cache copy
  (measured on the B=1024/T=16 flagship step: 5.24 → 3.2-3.3 ms/step,
  the same −40% the benchmarks/ab_decode_step.py `stale` ablation shows):
  * per-layer buffers, not one (L, B, T, D) array — chaining L
    DUS-then-read pairs through a single carried buffer makes XLA
    materialize defensive whole-cache copies;
  * each step attends over the STALE cache with a fresh-row correction
    (the row at t == pos is recomputed from this step's K/V), and all L
    scatters happen at the END of the step body — the DUS is then the
    last consumer of each carried buffer, so XLA's while-loop aliasing
    can update it in place;
- the cross-attention contribution is precomputed ONCE per sequence: in CLS
  memory mode it is a per-layer constant vector (softmax over one key is 1 —
  same algebraic fast path as training), in full mode the memory K/V are
  projected once and reused every step;
- masks come from index comparisons against the current position, so shapes
  never change during generation.
"""

from __future__ import annotations

import math
import os
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from mit_tpu.models.decoder import DecoderConfig
from mit_tpu.ops.attention import layer_norm
from mit_tpu.ops.masks import NEG_INF
from mit_tpu.ops.positional import sinusoid_table


class DecodeCache(NamedTuple):
    """Per-generation state reused across steps."""

    k: tuple                           # L × (B, T_max, D) self-attn keys
    v: tuple                           # L × (B, T_max, D) self-attn values
    cross_const: Optional[jnp.ndarray]  # (L, B, D) CLS-mode constant, or None
    cross_k: Optional[jnp.ndarray]     # (L, B, H, S, hd) full-memory keys
    cross_v: Optional[jnp.ndarray]     # (L, B, H, S, hd) full-memory values
    cross_mask: Optional[jnp.ndarray]  # (B, 1, S) additive, or None


def _split_heads_1(x: jnp.ndarray, h: int) -> jnp.ndarray:
    """(B, D) -> (B, H, hd)."""
    b, d = x.shape
    return x.reshape(b, h, d // h)


def _fused_supported(b: int, t: int, d: int, f: int, cd) -> bool:
    """True when the fused decode-layer kernel can run this geometry
    (interpret mode always can; on TPU a batch block must fit VMEM)."""
    from mit_tpu.ops.pallas_attention import on_tpu
    from mit_tpu.ops.pallas_decode_layer import decode_layer_supported

    if not on_tpu():
        return True
    return decode_layer_supported(b, t, d, f, jnp.dtype(cd).itemsize)


def init_cache(
    params: dict,
    cfg: DecoderConfig,
    memory: jnp.ndarray,               # (B, S, D) projected decoder memory
    memory_padding_mask: Optional[jnp.ndarray] = None,
    max_len: Optional[int] = None,
    compute_dtype=jnp.float32,
) -> DecodeCache:
    """Allocate the KV cache and precompute the cross-attention terms."""
    cd = compute_dtype
    L = cfg.num_layers
    h = cfg.num_heads
    d = cfg.embed_dim
    hd = d // h
    b, s, _ = memory.shape
    t_max = max_len or cfg.max_seq_len
    if t_max > cfg.max_seq_len:
        raise ValueError(
            f"max_len={t_max} exceeds the positional table "
            f"(max_seq_len={cfg.max_seq_len}); positions past it would "
            "silently clamp."
        )

    k = tuple(jnp.zeros((b, t_max, d), cd) for _ in range(L))
    v = tuple(jnp.zeros((b, t_max, d), cd) for _ in range(L))

    layers = params["layers"]
    mem = memory.astype(cd)
    if s == 1 and memory_padding_mask is None:
        # CLS mode: out_proj(v_proj(memory)) per layer — constant per sequence.
        vv = jnp.einsum("bsd,lde->lbse", mem, layers["cross"]["wv"].astype(cd))
        vv = vv + layers["cross"]["bv"].astype(cd)[:, None, None, :]
        out = jnp.einsum("lbse,lef->lbsf", vv, layers["cross"]["wo"].astype(cd))
        out = out + layers["cross"]["bo"].astype(cd)[:, None, None, :]
        return DecodeCache(k, v, out[:, :, 0, :], None, None, None)

    ck = jnp.einsum("bsd,lde->lbse", mem, layers["cross"]["wk"].astype(cd))
    ck = ck + layers["cross"]["bk"].astype(cd)[:, None, None, :]
    cv = jnp.einsum("bsd,lde->lbse", mem, layers["cross"]["wv"].astype(cd))
    cv = cv + layers["cross"]["bv"].astype(cd)[:, None, None, :]
    ck = ck.reshape(L, b, s, h, hd).transpose(0, 1, 3, 2, 4)
    cv = cv.reshape(L, b, s, h, hd).transpose(0, 1, 3, 2, 4)
    cmask = None
    if memory_padding_mask is not None:
        cmask = jnp.where(memory_padding_mask, NEG_INF, 0.0)[:, None, :]
    return DecodeCache(k, v, None, ck, cv, cmask)


def prepare_decode_params(params: dict, compute_dtype=jnp.float32) -> dict:
    """Pre-cast weights to the compute dtype and fuse the Q/K/V projection.

    Done ONCE per generation, *outside* the decode loop — leaving the casts
    and concats inside the jitted while_loop body makes every step re-read
    the fp32 weights and re-materialize the fused matrices (XLA's
    loop-invariant code motion does not reliably hoist the large concats).
    """
    cd = compute_dtype
    layers = params["layers"]
    s = layers["self"]
    c = layers["cross"]
    f = layers["ffn"]
    ln = lambda p: {
        "scale": p["scale"].astype(jnp.float32),
        "bias": p["bias"].astype(jnp.float32),
    }
    return {
        "emb": params["token_embedding"].astype(cd),
        "layers": {
            "wqkv": jnp.concatenate([s["wq"], s["wk"], s["wv"]], -1).astype(cd),
            "bqkv": jnp.concatenate([s["bq"], s["bk"], s["bv"]], -1).astype(cd),
            "wo": s["wo"].astype(cd), "bo": s["bo"].astype(cd),
            "cross_wq": c["wq"].astype(cd), "cross_bq": c["bq"].astype(cd),
            "cross_wo": c["wo"].astype(cd), "cross_bo": c["bo"].astype(cd),
            "w1": f["w1"].astype(cd), "b1": f["b1"].astype(cd),
            "w2": f["w2"].astype(cd), "b2": f["b2"].astype(cd),
            "ln1": ln(layers["ln1"]), "ln2": ln(layers["ln2"]),
            "ln3": ln(layers["ln3"]),
        },
        # logits GEMM operands in the compute dtype (f32 accumulation in the
        # step): storing fc_w at fp32 doubles its per-step HBM read — and on
        # TPU a "fp32" matmul lowers to bf16 passes at default precision
        # anyway, so bf16 operands + f32 accumulate is the same numerics for
        # half the traffic. The bias stays fp32 (added post-accumulation).
        "fc_w": params["fc_out_w"].astype(cd),
        "fc_b": params["fc_out_b"].astype(jnp.float32),
    }


def set_fused_decode(enabled: bool) -> None:
    """Toggle the fused Pallas decode-layer kernel mid-process.

    ``MIT_FUSED_DECODE`` is read at *trace* time inside jitted decode
    functions, so flipping the env var after any decode has been traced
    silently has no effect on already-compiled shapes (jit executable
    caching) — a process could serve a mix of fused and XLA paths with no
    warning. This helper is the supported toggle: it sets the env var AND
    drops the jit caches so every path retraces under the new setting.
    Setting the env var before the first decode needs no helper.
    """
    if enabled:
        os.environ["MIT_FUSED_DECODE"] = "1"
    else:
        os.environ.pop("MIT_FUSED_DECODE", None)
    jax.clear_caches()


def decoder_step(
    params: dict,
    cfg: DecoderConfig,
    tokens: jnp.ndarray,               # (B,) current input token ids
    pos: jnp.ndarray,                  # scalar int32 position of `tokens`
    cache: DecodeCache,
    compute_dtype=jnp.float32,
    key_pad: Optional[jnp.ndarray] = None,   # (B, T_max) bool, True = PAD key
) -> Tuple[jnp.ndarray, DecodeCache]:
    """One decode step → (logits (B, V) fp32, updated cache).

    Accepts raw decoder params or the output of
    :func:`prepare_decode_params` (loop callers pass prepared params so the
    cast/fuse work happens once).

    ``key_pad`` marks generated-PAD positions to exclude as attention keys —
    the reference rebuilds ``tgt_key_padding_mask`` from the growing prefix
    every step (reference decoder.py:162 via model.py:224), so a mid-sequence
    PAD emission must stay masked here too for exact equivalence.
    """
    if "emb" not in params:
        params = prepare_decode_params(params, compute_dtype)
    cd = compute_dtype
    L = cfg.num_layers
    h = cfg.num_heads
    d = cfg.embed_dim
    hd = d // h
    b = tokens.shape[0]
    t_max = cache.k[0].shape[1]
    lay = params["layers"]

    x = params["emb"][tokens] * jnp.asarray(math.sqrt(d), cd)
    pos_table = sinusoid_table(cfg.max_seq_len, d, dtype=cd)
    x = x + jax.lax.dynamic_index_in_dim(pos_table, pos, keepdims=False)

    # visibility mask over cache positions: j <= pos, minus PAD keys
    visible = (jnp.arange(t_max) <= pos)[None, None, :]  # (1,1,T)
    if key_pad is not None:
        visible = jnp.logical_and(visible, ~key_pad[:, None, :])  # (B,1,T)

    k_cache, v_cache = cache.k, cache.v
    scale = jnp.asarray(1.0 / math.sqrt(hd), jnp.float32)

    # Fused whole-layer Pallas step (opt-in, CLS memory mode): one kernel
    # per layer instead of ~30 XLA ops — see ops/pallas_decode_layer.py.
    # Falls back to the XLA path when no batch block of this geometry fits
    # VMEM (huge T buckets on small-VMEM generations).
    if (
        os.environ.get("MIT_FUSED_DECODE") == "1"
        and cache.cross_const is not None
        and _fused_supported(b, t_max, d, lay["w1"].shape[-1], cd)
    ):
        from mit_tpu.ops.pallas_decode_layer import fused_decode_layer

        madd = jnp.broadcast_to(
            jnp.where(visible, 0.0, NEG_INF)[:, 0, :], (b, t_max)
        ).astype(jnp.float32)
        new_k, new_v = [], []
        for l in range(L):
            # the kernel attends over the stale cache block internally
            # (fresh-row correction at t == pos); scatters batch at the end
            x, k_new, v_new = fused_decode_layer(
                x, pos, madd, k_cache[l], v_cache[l],
                cache.cross_const[l], lay, l, h,
            )
            new_k.append(k_new)
            new_v.append(v_new)
        k_cache = tuple(
            c.at[:, pos, :].set(new_k[l]) for l, c in enumerate(k_cache)
        )
        v_cache = tuple(
            c.at[:, pos, :].set(new_v[l]) for l, c in enumerate(v_cache)
        )
        logits = jnp.dot(
            x, params["fc_w"].astype(cd), preferred_element_type=jnp.float32
        ) + params["fc_b"]
        return logits, DecodeCache(
            k_cache, v_cache, cache.cross_const, cache.cross_k,
            cache.cross_v, cache.cross_mask,
        )

    # NOTE: this block is the scalar-pos twin of the serving step's per-row-
    # position attention (decode/service.py _one_token_logits) — op order
    # and rounding must stay BIT-IDENTICAL between the two (probs cast to cd
    # before P·V, f32 score/ctx accumulation) or the service-vs-batch
    # token-identity contract breaks; tests/test_service.py pins it. Mirror
    # any numerics change in both places.
    at_pos = (jnp.arange(t_max) == pos)[None, None, :]       # (1, 1, T)
    new_k, new_v = [], []
    for l in range(L):
        qf, kf, vf = jnp.split(x @ lay["wqkv"][l] + lay["bqkv"][l], 3, axis=-1)
        q = _split_heads_1(qf, h)
        new_k.append(kf)
        new_v.append(vf)
        # attend over the STALE cache; the row at t == pos is corrected
        # from this step's fresh K/V below (see module docstring)
        k_l = k_cache[l].reshape(b, t_max, h, hd)
        v_l = v_cache[l].reshape(b, t_max, h, hd)

        scores = jnp.einsum(
            "bhe,bthe->bht", q, k_l, preferred_element_type=jnp.float32
        ) * scale
        s_pos = (
            qf.astype(jnp.float32) * kf.astype(jnp.float32)
        ).reshape(b, h, hd).sum(-1) * scale                   # (B, H)
        scores = jnp.where(at_pos, s_pos[:, :, None], scores)
        scores = jnp.where(visible, scores, NEG_INF)
        # probs round to cd FIRST (as a cache-row read would) so the
        # fresh-row split only reorders the f32 accumulation
        probs = jax.nn.softmax(scores, axis=-1).astype(cd)
        p_pos = jnp.sum(
            jnp.where(at_pos, probs, 0.0).astype(jnp.float32), -1
        )                                                     # (B, H)
        p_cache = jnp.where(at_pos, jnp.asarray(0.0, cd), probs)
        ctx = jnp.einsum(
            "bht,bthe->bhe", p_cache, v_l,
            preferred_element_type=jnp.float32,
        )
        ctx = ctx + p_pos[..., None] * vf.astype(jnp.float32).reshape(b, h, hd)
        sa = ctx.astype(cd).reshape(b, d) @ lay["wo"][l] + lay["bo"][l]
        x = layer_norm(jax.tree.map(lambda a: a[l], lay["ln1"]), x + sa)

        # cross-attention
        if cache.cross_const is not None:
            ca = cache.cross_const[l]
        else:
            qc = _split_heads_1(
                x @ lay["cross_wq"][l] + lay["cross_bq"][l], h
            )
            cs = jnp.einsum(
                "bhe,bhse->bhs", qc, cache.cross_k[l],
                preferred_element_type=jnp.float32,
            ) * scale
            if cache.cross_mask is not None:
                cs = cs + cache.cross_mask
            cprobs = jax.nn.softmax(cs, axis=-1).astype(cd)
            cctx = jnp.einsum(
                "bhs,bhse->bhe", cprobs, cache.cross_v[l],
                preferred_element_type=jnp.float32,
            ).astype(cd)
            ca = cctx.reshape(b, d) @ lay["cross_wo"][l] + lay["cross_bo"][l]
        x = layer_norm(jax.tree.map(lambda a: a[l], lay["ln2"]), x + ca)

        y = jax.nn.relu(x @ lay["w1"][l] + lay["b1"][l])
        y = y @ lay["w2"][l] + lay["b2"][l]
        x = layer_norm(jax.tree.map(lambda a: a[l], lay["ln3"]), x + y)

    # all scatters at the END of the body: each carried buffer's last
    # consumer is its own DUS → in-place while-loop aliasing, no copies
    k_cache = tuple(
        c.at[:, pos, :].set(new_k[l]) for l, c in enumerate(k_cache)
    )
    v_cache = tuple(
        c.at[:, pos, :].set(new_v[l]) for l, c in enumerate(v_cache)
    )
    logits = jnp.dot(
        x, params["fc_w"].astype(cd), preferred_element_type=jnp.float32
    ) + params["fc_b"]
    return logits, DecodeCache(
        k_cache, v_cache, cache.cross_const, cache.cross_k, cache.cross_v,
        cache.cross_mask,
    )


def grow_cache(cache: DecodeCache, bucket: int) -> DecodeCache:
    """Copy the self-attn K/V into a larger static T_max (ladder growth)."""
    grow = lambda a: (
        jnp.zeros((a.shape[0], bucket) + a.shape[2:], a.dtype)
        .at[:, : a.shape[1]].set(a)
    )
    return cache._replace(
        k=tuple(grow(a) for a in cache.k),
        v=tuple(grow(a) for a in cache.v),
    )


def reindex_cache(cache: DecodeCache, idx: jnp.ndarray) -> DecodeCache:
    """Gather batch rows (beam reordering): idx (B,) into the batch dim."""
    take = lambda a: None if a is None else jnp.take(a, idx, axis=1)
    return DecodeCache(
        k=tuple(jnp.take(a, idx, axis=0) for a in cache.k),
        v=tuple(jnp.take(a, idx, axis=0) for a in cache.v),
        cross_const=take(cache.cross_const),
        cross_k=take(cache.cross_k),
        cross_v=take(cache.cross_v),
        cross_mask=None
        if cache.cross_mask is None
        else jnp.take(cache.cross_mask, idx, axis=0),
    )
