"""Continuously-batched captioning service.

BASELINE.json config 5: a serving loop that keeps a static batch of decode
slots full — when one caption finishes, a new image is admitted into its
slot immediately instead of waiting for the whole batch (the reference can
only caption one image per process invocation, reference inference.py).

TPU-first constraints drive the design:
- ONE jitted decode step advances every active slot by one token; shapes
  never change (static slot count, static max_len), so nothing recompiles
  across admissions/evictions;
- slots decode at *different* positions, so the step takes a per-slot
  position vector (the batch greedy loop's scalar position generalized);
- admission swaps a slot's cross-attention constant with an in-place
  row scatter on device (the KV cache needs no reset — stale rows are
  unreachable); the host only orchestrates (submit/collect), it never
  touches token math.

Both memory modes are served. CLS (the reference's configuration) keeps one
(L, R, D) constant cross-attention output per slot; full-sequence memory
(reference encoder.py:107's documented alternative) projects each admitted
memory's cross K/V once at chunk-land time into per-slot
(L, R, H, S_mem, hd) buffers and attends over them every step — the
serving twin of the batch path's ``DecodeCache.cross_k/cross_v``
(decode/step.py init_cache).
"""

from __future__ import annotations

import math
import os
from functools import partial
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from mit_tpu.models.decoder import DecoderConfig
from mit_tpu.ops.attention import layer_norm
from mit_tpu.ops.masks import NEG_INF
from mit_tpu.ops.positional import sinusoid_table

# beam-score mask (matches decode/beam.py's _NEG so service beam search is
# token-identical to beam_generate; NEG_INF above is the attention constant)
_NEG = -1e30


def _one_token_logits(params, cfg, tokens, pos, key_pad, k_cache, v_cache,
                      cross, cd):
    """Advance every slot one token at its own position → (logits, k, v).

    ``cross`` is the per-slot cross-attention state, tagged by key:
    ``{"const": (L, R, D)}`` for CLS memory (the precomputed constant
    output) or ``{"k": (L, R, H, S_mem, hd), "v": ...}`` for full-sequence
    memory (projected K/V; q comes from the running activations each step,
    bit-identical to the batch decoder_step's full-memory block).

    Perf-critical properties (measured — see BENCHMARKS.md):
    - caches live as L per-layer (S, T, D) buffers, DONATED by the jitted
      callers; each step attends over the STALE cache with a fresh-row
      correction at t == pos[slot] and scatters all L new K/V rows at the
      END of the step — the DUS is then each buffer's last consumer, so
      XLA updates it in place instead of inserting per-layer defensive
      whole-cache copies (the batch step's measured −40%/step fix — see
      decode/step.py and benchmarks/ab_decode_step.py);
    - admitted slots need NO cache reset: the visibility mask
      (key j visible iff j ≤ pos[slot]) hides stale rows beyond pos, and
      the row AT pos comes from the fresh-row correction, never the stale
      buffer contents;
    - greedy selection happens ON DEVICE — the host needs (S,) token ids
      (1 KB), never the (S, V) fp32 logits.
    """
    L = len(k_cache)
    s_slots, t_max, d = k_cache[0].shape
    h = cfg.num_heads
    hd = d // h
    lay = params["layers"]

    x = params["emb"][tokens] * jnp.asarray(math.sqrt(d), cd)
    pos_table = sinusoid_table(cfg.max_seq_len, d, dtype=cd)
    x = x + pos_table[jnp.clip(pos, 0, cfg.max_seq_len - 1)]

    # per-slot visibility: key j visible iff j <= pos[slot] and not PAD
    visible = jnp.arange(t_max)[None, None, :] <= pos[:, None, None]  # (S,1,T)
    visible = jnp.logical_and(visible, ~key_pad[:, None, :])
    scale = jnp.asarray(1.0 / math.sqrt(hd), jnp.float32)
    rows = jnp.arange(s_slots)

    # Fused whole-layer Pallas step (opt-in): the kernel takes per-row
    # positions, so the service's ragged slots reuse the batch kernel —
    # see ops/pallas_decode_layer.py.
    from mit_tpu.decode.step import _fused_supported

    if (
        os.environ.get("MIT_FUSED_DECODE") == "1"
        and "const" in cross
        and _fused_supported(s_slots, t_max, d, lay["w1"].shape[-1], cd)
    ):
        from mit_tpu.ops.pallas_decode_layer import fused_decode_layer

        madd = jnp.where(visible[:, 0, :], 0.0, NEG_INF).astype(jnp.float32)
        new_k, new_v = [], []
        for l in range(L):
            # the kernel attends over the stale cache block internally
            x, k_new, v_new = fused_decode_layer(
                x, pos, madd, k_cache[l], v_cache[l], cross["const"][l],
                lay, l, h,
            )
            new_k.append(k_new.astype(cd))
            new_v.append(v_new.astype(cd))
        k_cache = tuple(
            c.at[rows, pos, :].set(new_k[l]) for l, c in enumerate(k_cache)
        )
        v_cache = tuple(
            c.at[rows, pos, :].set(new_v[l]) for l, c in enumerate(v_cache)
        )
        logits = jnp.dot(
            x, params["fc_w"].astype(cd), preferred_element_type=jnp.float32
        ) + params["fc_b"]
        return logits, k_cache, v_cache

    # NOTE: this stale-attend fresh-row-correction attention is the per-row-
    # position twin of the scalar-pos batch step in decode/step.py
    # (decoder_step) — the two must stay BIT-IDENTICAL in op order and
    # rounding (probs cast to cd before the P·V einsum, f32 score/ctx
    # accumulation) or the service-vs-batch token-identity contract breaks;
    # tests/test_service.py pins it, and any numerics change here must be
    # mirrored there (and vice versa). They stay separate because the batch
    # step's scalar pos admits dynamic-slice reads the per-row gather can't.
    at_pos = jnp.arange(t_max)[None, None, :] == pos[:, None, None]  # (S,1,T)
    new_k, new_v = [], []
    for l in range(L):
        qf, kf, vf = jnp.split(x @ lay["wqkv"][l] + lay["bqkv"][l], 3, -1)
        q = qf.reshape(s_slots, h, hd)
        new_k.append(kf)
        new_v.append(vf)
        # attend over the STALE cache; the row at t == pos[slot] is
        # corrected from this step's fresh K/V below
        k_l = k_cache[l].reshape(s_slots, t_max, h, hd)
        v_l = v_cache[l].reshape(s_slots, t_max, h, hd)

        scores = jnp.einsum(
            "she,sthe->sht", q, k_l, preferred_element_type=jnp.float32
        ) * scale
        s_pos = (
            qf.astype(jnp.float32) * kf.astype(jnp.float32)
        ).reshape(s_slots, h, hd).sum(-1) * scale             # (S, H)
        scores = jnp.where(at_pos, s_pos[:, :, None], scores)
        scores = jnp.where(visible, scores, NEG_INF)
        probs = jax.nn.softmax(scores, axis=-1).astype(cd)
        p_pos = jnp.sum(
            jnp.where(at_pos, probs, 0.0).astype(jnp.float32), -1
        )                                                     # (S, H)
        p_cache = jnp.where(at_pos, jnp.asarray(0.0, cd), probs)
        ctx = jnp.einsum(
            "sht,sthe->she", p_cache, v_l,
            preferred_element_type=jnp.float32,
        )
        ctx = ctx + p_pos[..., None] * vf.astype(jnp.float32).reshape(
            s_slots, h, hd
        )
        sa = ctx.astype(cd).reshape(s_slots, d) @ lay["wo"][l] + lay["bo"][l]
        x = layer_norm(jax.tree.map(lambda a: a[l], lay["ln1"]), x + sa)
        if "const" in cross:
            ca = cross["const"][l].astype(cd)
        else:
            # full-memory cross attention — the per-row twin of the batch
            # decoder_step's cross block (decode/step.py); op order and
            # rounding must stay bit-identical for service==batch tokens
            qc = (
                x @ lay["cross_wq"][l] + lay["cross_bq"][l]
            ).reshape(s_slots, h, hd)
            cs = jnp.einsum(
                "she,shme->shm", qc, cross["k"][l],
                preferred_element_type=jnp.float32,
            ) * scale
            cprobs = jax.nn.softmax(cs, axis=-1).astype(cd)
            cctx = jnp.einsum(
                "shm,shme->she", cprobs, cross["v"][l],
                preferred_element_type=jnp.float32,
            ).astype(cd)
            ca = cctx.reshape(s_slots, d) @ lay["cross_wo"][l] \
                + lay["cross_bo"][l]
        x = layer_norm(
            jax.tree.map(lambda a: a[l], lay["ln2"]),
            x + ca,
        )
        y = jax.nn.relu(x @ lay["w1"][l] + lay["b1"][l])
        y = y @ lay["w2"][l] + lay["b2"][l]
        x = layer_norm(jax.tree.map(lambda a: a[l], lay["ln3"]), x + y)

    # all scatters at the END of the body (in-place loop aliasing)
    k_cache = tuple(
        c.at[rows, pos, :].set(new_k[l]) for l, c in enumerate(k_cache)
    )
    v_cache = tuple(
        c.at[rows, pos, :].set(new_v[l]) for l, c in enumerate(v_cache)
    )
    # compute-dtype operands + f32 accumulation — same lowering as the
    # batch decoder_step, so service and batch argmax identically on ties
    logits = jnp.dot(
        x.astype(cd), params["fc_w"].astype(cd),
        preferred_element_type=jnp.float32,
    ) + params["fc_b"]
    return logits, k_cache, v_cache


@partial(
    jax.jit,
    static_argnames=("cfg", "compute_dtype", "n_steps", "temperature",
                     "top_k", "top_p"),
    donate_argnames=("k_cache", "v_cache"),
)
def service_decode_window(
    params: dict,
    cfg: DecoderConfig,
    tokens: jnp.ndarray,        # (S,) current token per slot
    pos: jnp.ndarray,           # (S,) int32 decode position per slot
    active: jnp.ndarray,        # (S,) bool
    key_pad: jnp.ndarray,       # (S, T) bool — PAD keys to mask (reference
                                # rebuilds tgt_key_padding_mask each step)
    k_cache: tuple,             # L × (S, T, D) — donated, updated in place
    v_cache: tuple,
    cross: dict,                # {"const": (L, S, D)} or {"k","v"} full-mem
    end_id: jnp.ndarray,
    pad_id: jnp.ndarray,
    compute_dtype=jnp.float32,
    n_steps: int = 1,
    rng: Optional[jax.Array] = None,
    temperature: float = 0.0,
    top_k: int = 0,
    top_p: float = 1.0,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """``n_steps`` tokens for every slot → (ids (S, n_steps), pos', active',
    k', v').

    The window amortizes the host round trip: one dispatch + one (S,
    n_steps) fetch per n_steps tokens. Slot state (token/position/active/
    PAD-key masks) advances ON DEVICE between the window's micro-steps with
    exactly the host loop's semantics, so results are token-identical to
    n_steps=1; admission granularity becomes n_steps tokens (finished slots
    idle until the window closes — pick n_steps ≪ typical caption length).
    ``params`` is the *prepared* pytree from
    :func:`mit_tpu.decode.step.prepare_decode_params`.

    ``temperature=0`` (the default) selects by argmax — the greedy service.
    ``temperature>0`` draws each slot's token from the temperature-scaled,
    top-k/top-p-filtered distribution (the same static-shape filter as the
    batch sampler, :func:`mit_tpu.decode.sampling.filter_logits`), with
    ``rng`` split once per micro-step — the serving counterpart of the
    reference's missing stochastic decoding.
    """
    cd = compute_dtype
    t_max = k_cache[0].shape[1]
    rows = jnp.arange(tokens.shape[0])
    outs = []
    for _ in range(n_steps):
        logits, k_cache, v_cache = _one_token_logits(
            params, cfg, tokens, pos, key_pad, k_cache, v_cache,
            cross, cd,
        )
        if temperature == 0.0:
            nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        else:
            from mit_tpu.decode.sampling import filter_logits

            rng, sub = jax.random.split(rng)
            nxt = jax.random.categorical(
                sub, filter_logits(logits, temperature, top_k, top_p)
            ).astype(jnp.int32)
        outs.append(nxt)
        newpos = jnp.minimum(pos + 1, t_max - 1)
        key_pad = key_pad.at[rows, newpos].set(
            jnp.where(active, nxt == pad_id, key_pad[rows, newpos])
        )
        done = active & ((nxt == end_id) | (pos + 1 >= t_max - 1))
        tokens = jnp.where(active, nxt, tokens)
        pos = jnp.where(active, newpos, pos)
        active = active & ~done
    return jnp.stack(outs, axis=1), pos, active, k_cache, v_cache


@partial(
    jax.jit,
    static_argnames=("cfg", "beam_size", "compute_dtype", "n_steps",
                     "gather_skip"),
    donate_argnames=("k_cache", "v_cache"),
)
def service_beam_window(
    params: dict,
    cfg: DecoderConfig,
    tokens: jnp.ndarray,        # (R,) current token per beam row, R = S*K
    pos: jnp.ndarray,           # (S,) int32 decode position per slot
    active: jnp.ndarray,        # (S,) bool
    key_pad: jnp.ndarray,       # (R, T) bool
    k_cache: tuple,             # L × (R, T, D) — donated, updated in place
    v_cache: tuple,
    cross: dict,                # cross state, each slot's row repeated K×
    scores: jnp.ndarray,        # (S, K) fp32 total log-probability per beam
    finished: jnp.ndarray,      # (S, K) bool
    end_id: jnp.ndarray,
    pad_id: jnp.ndarray,
    beam_size: int = 3,
    compute_dtype=jnp.float32,
    n_steps: int = 1,
    gather_skip: bool = True,
):
    """``n_steps`` beam-search tokens for every slot.

    → (new_tok (S, K, n), src_beam (S, K, n), scores', finished', pos',
    active', k', v').

    The continuous-batching generalization of
    :func:`mit_tpu.decode.beam.beam_generate` (its per-slot semantics are
    identical and tested token-for-token equal): every slot owns K
    consecutive decoder rows; each micro-step scores all R = S·K rows in one
    decoder pass, takes the per-slot top-K over (K·V) continuations, and
    reorders the slot's K cache/key-pad rows by parent beam — a gather that
    stays inside the slot's row block, so under a slot-sharded mesh it never
    crosses shards. Finished beams extend with PAD at zero incremental
    score (frozen totals stay comparable); a slot deactivates when all K of
    its beams are finished or the length cap is hit. Inactive slots are
    bit-frozen. The host replays (new_tok, src_beam) to maintain token
    histories — the device never materializes (S, K, T) token storage.
    """
    cd = compute_dtype
    k = beam_size
    r = tokens.shape[0]
    s_slots = r // k
    t_max = k_cache[0].shape[1]
    v = params["fc_b"].shape[0]
    rows = jnp.arange(r)
    slot_offset = (jnp.arange(s_slots) * k)[:, None]        # (S, 1)
    ident = slot_offset + jnp.arange(k)[None, :]            # (S, K)
    pad_onehot = jnp.where(jnp.arange(v)[None, None, :] == pad_id, 0.0,
                           _NEG)
    tok_outs, src_outs = [], []
    for _ in range(n_steps):
        pos_rows = jnp.repeat(pos, k)
        logits, k_cache, v_cache = _one_token_logits(
            params, cfg, tokens, pos_rows, key_pad, k_cache, v_cache,
            cross, cd,
        )
        logp = jax.nn.log_softmax(logits, axis=-1).reshape(s_slots, k, v)
        logp = jnp.where(finished[..., None], pad_onehot, logp)
        total = scores[..., None] + logp                    # (S, K, V)
        new_scores, flat_idx = jax.lax.top_k(total.reshape(s_slots, k * v), k)
        src_beam = flat_idx // v                            # (S, K)
        new_tok = (flat_idx % v).astype(jnp.int32)          # (S, K)
        tok_outs.append(new_tok)
        src_outs.append(src_beam)

        # freeze inactive slots: identity gather, unchanged state
        gather = jnp.where(active[:, None], slot_offset + src_beam,
                           ident).reshape(-1)               # (R,)
        # Optionally skip the L x (R, T, D) x 2 cache reorder when every
        # active slot's src_beam is the identity (beams settled/finished:
        # top_k stable, finished beams extend with PAD at zero incremental
        # score). The gather roughly triples per-step cache traffic, so
        # the skip looked like a win on paper — but the round-5 on-chip
        # ladder measured the lax.cond a ~10% NET LOSS in both bucketed
        # and unbucketed regimes (benchmarks/bench_beam_ladder_r05.json):
        # the branch is a fusion barrier inside the scanned window and the
        # any() predicate is a per-microstep reduction. Default OFF;
        # ``gather_skip`` is a STATIC arg (MIT_BEAM_GATHER_SKIP=1 opts in)
        # so the A/B harness can trace both variants in one process.
        if gather_skip:
            k_cache, v_cache, key_pad = jax.lax.cond(
                jnp.any(gather != jnp.arange(r)),
                lambda kc, vc, kp: (
                    tuple(jnp.take(c, gather, axis=0) for c in kc),
                    tuple(jnp.take(c, gather, axis=0) for c in vc),
                    jnp.take(kp, gather, axis=0),
                ),
                lambda kc, vc, kp: (kc, vc, kp),
                k_cache, v_cache, key_pad,
            )
        else:
            k_cache = tuple(jnp.take(c, gather, axis=0) for c in k_cache)
            v_cache = tuple(jnp.take(c, gather, axis=0) for c in v_cache)
            key_pad = jnp.take(key_pad, gather, axis=0)
        finished = jnp.where(
            active[:, None],
            jnp.take_along_axis(finished, src_beam, axis=1)
            | (new_tok == end_id),
            finished,
        )
        scores = jnp.where(active[:, None], new_scores, scores)

        newpos = jnp.minimum(pos + 1, t_max - 1)
        sel_tok = jnp.where(active[:, None], new_tok,
                            tokens.reshape(s_slots, k)).reshape(-1)
        newpos_rows = jnp.repeat(newpos, k)
        key_pad = key_pad.at[rows, newpos_rows].set(
            jnp.where(jnp.repeat(active, k), sel_tok == pad_id,
                      key_pad[rows, newpos_rows])
        )
        tokens = sel_tok
        done = active & (jnp.all(finished, axis=1) | (pos + 1 >= t_max - 1))
        pos = jnp.where(active, newpos, pos)
        active = active & ~done
    return (
        jnp.stack(tok_outs, axis=2), jnp.stack(src_outs, axis=2),
        scores, finished, pos, active, k_cache, v_cache,
    )


def service_decode_step(
    params, cfg, tokens, pos, active, key_pad, k_cache, v_cache,
    cross, compute_dtype=jnp.float32,
):
    """Single-token compatibility wrapper → (next_ids, k', v')."""
    ids, _, _, k, v = service_decode_window(
        params, cfg, tokens, pos, active, key_pad, k_cache, v_cache,
        cross, jnp.int32(-1), jnp.int32(-1),
        compute_dtype=compute_dtype, n_steps=1,
    )
    return ids[:, 0], k, v


@partial(jax.jit, static_argnames=())
def _cross_const_for(params_layers_cross: dict, memory: jnp.ndarray) -> jnp.ndarray:
    """(L, B, D) per-layer constant cross-attention output for CLS memory."""
    wv = params_layers_cross["wv"]
    bv = params_layers_cross["bv"]
    wo = params_layers_cross["wo"]
    bo = params_layers_cross["bo"]
    vv = jnp.einsum("bsd,lde->lbse", memory, wv) + bv[:, None, None, :]
    out = jnp.einsum("lbse,lef->lbsf", vv, wo) + bo[:, None, None, :]
    return out[:, :, 0, :]


@partial(jax.jit, static_argnames=("h", "cd"))
def _cross_kv_for(params_layers_cross: dict, memory: jnp.ndarray,
                  h: int, cd) -> dict:
    """Full-memory cross K/V projected once per chunk →
    ``{"k": (L, C, H, S, hd), "v": ...}``.

    Operand casts, einsum contraction and head reshape/transpose are the
    batch path's init_cache (decode/step.py) verbatim, so service captions
    stay bit-identical to batch full-memory decode."""
    mem = memory.astype(cd)
    wk = params_layers_cross["wk"].astype(cd)
    bk = params_layers_cross["bk"].astype(cd)
    wv = params_layers_cross["wv"].astype(cd)
    bv = params_layers_cross["bv"].astype(cd)
    ck = jnp.einsum("bsd,lde->lbse", mem, wk) + bk[:, None, None, :]
    cv = jnp.einsum("bsd,lde->lbse", mem, wv) + bv[:, None, None, :]
    L, c, s, e = ck.shape
    hd = e // h
    ck = ck.reshape(L, c, s, h, hd).transpose(0, 1, 3, 2, 4)
    cv = cv.reshape(L, c, s, h, hd).transpose(0, 1, 3, 2, 4)
    return {"k": ck, "v": cv}


@partial(jax.jit, donate_argnums=(0,))
def _scatter_cross_gathered(cross, chunk_cross, src, idx):
    """cross state ← chunk rows ``src`` (W,) scattered at decoder rows
    ``idx`` (W,), in place — the zero-copy admission path (cross constants
    or K/V precomputed per chunk at land time). Every leaf of both pytrees
    keeps the decoder-row dimension on axis 1 ((L, R, D) const or
    (L, R, H, S, hd) K/V), so one scatter covers both memory modes."""
    return jax.tree.map(
        lambda c, ch: c.at[:, idx].set(ch[:, src]), cross, chunk_cross
    )


@partial(jax.jit, donate_argnums=(0,))
def _scatter_cross_rows(cross, rows, idx):
    """cross state ← per-row cross values at row indices idx (W,), in
    place (axis-1 row dimension on every leaf, both memory modes)."""
    return jax.tree.map(lambda c, r: c.at[:, idx].set(r), cross, rows)


class CaptionService:
    """Host-side orchestration of the continuously-batched decode loop."""

    def __init__(
        self,
        captioner,                         # decode.api.Captioner
        num_slots: int = 64,
        max_len: Optional[int] = None,
        compute_dtype=jnp.float32,
        mesh=None,
        steps_per_sync: int = 1,
        method: str = "greedy",
        beam_size: Optional[int] = None,
        temperature: float = 1.0,
        top_k: int = 0,
        top_p: float = 1.0,
        rng: Optional[jax.Array] = None,
        cache_len: Optional[int] = None,
        beam_gather_skip: Optional[bool] = None,
    ):
        """``steps_per_sync``: tokens decoded per host round trip (device
        windows, token-identical to 1; admission granularity coarsens —
        keep it well under the typical caption length).

        ``cache_len``: static length of the per-slot KV caches (default:
        ``max_len``). Every decode step reads the caches' FULL static
        extent, so a ``max_len``-sized cache pays (R, max_len, D) reads per
        token even when captions END at ~12 — the serving twin of the batch
        path's bucket ladder (:func:`mit_tpu.decode.greedy.greedy_generate`).
        Set it just above the typical caption length: a slot whose caption
        hits the bucket cap without ENDing is evicted and re-decoded at
        full ``max_len`` through the batch path when the service drains
        (rare-by-construction; decode is deterministic, so the re-run is
        token-identical to an unbucketed service for greedy and beam —
        ``method='sample'`` re-draws the overflow caption from a fresh rng
        stream, so pick ``cache_len=None`` there if bit-reproducibility
        across cache sizes matters).

        ``mesh``: an optional ``jax.sharding.Mesh`` with a "data" axis —
        decode slots (and their KV caches) shard across it, so one service
        instance drives a whole v5e-8 slice (BASELINE config 5). Weights
        replicate; the host keeps the full token/position bookkeeping and
        GSPMD runs each slot's math on its owning chip. ``num_slots`` must
        divide evenly across the "data" axis.

        ``method``: ``'greedy'`` (default), ``'beam'`` or ``'sample'`` —
        the same three decode methods as the batch API
        (:meth:`mit_tpu.decode.api.Captioner.generate_from_memory`), served
        from the continuous-batching loop. Beam runs K =
        ``beam_size or cfg.BEAM_SIZE`` beams per slot (K decoder rows each,
        token-identical to :func:`mit_tpu.decode.beam.beam_generate`);
        sample draws from the temperature/top-k/top-p-filtered distribution
        on device, seeded by ``rng`` (deterministic for a fixed submission
        order)."""
        if method not in ("greedy", "beam", "sample"):
            raise ValueError(
                f"method must be 'greedy', 'beam' or 'sample', got {method!r}"
            )
        # Full-sequence memory (reference encoder.py:107's documented
        # alternative) swaps the (L, R, D) CLS cross constant for per-slot
        # (L, R, H, S_mem, hd) cross K/V buffers — S_mem× the cross state
        # (e.g. 197× for ViT-B), so size num_slots to HBM accordingly.
        self.full_mem = getattr(captioner.mcfg, "memory_mode", "cls") != "cls"
        self.s_mem = captioner.mcfg.vision.seq_len if self.full_mem else 1
        self.cap = captioner
        cfg = captioner.mcfg.decoder
        self.cfg = cfg
        self.S = num_slots
        self.T = min(max_len or cfg.max_seq_len, cfg.max_seq_len)
        if cache_len is not None and cache_len < 4:
            raise ValueError(
                f"cache_len={cache_len} leaves no room to decode "
                "(START + at least two generated tokens); use >= 4."
            )
        # static KV extent per slot; < T turns on overflow migration
        self.Tc = min(cache_len, self.T) if cache_len is not None else self.T
        self.cd = compute_dtype
        self.steps_per_sync = max(1, int(steps_per_sync))
        self.method = method
        self.K = (
            (beam_size or getattr(captioner.cfg, "BEAM_SIZE", 3))
            if method == "beam" else 1
        )
        self.temperature = float(temperature)
        self.top_k = int(top_k)
        self.top_p = float(top_p)
        # pay-per-use beam cache reorder (see service_beam_window); None
        # defers to MIT_BEAM_GATHER_SKIP (default OFF — the round-5
        # on-chip ladder measured the lax.cond wrapper a ~10% NET LOSS in
        # both bucketed and unbucketed regimes even with trained beams
        # that settle/finish at 12 tokens, benchmarks/
        # bench_beam_ladder_r05.json; the branch blocks fusion inside the
        # scanned window and its any() predicate is itself a per-microstep
        # reduction). An explicit bool lets one process A/B both traces
        # (the arg is jit-static).
        self._beam_gather_skip = (
            os.environ.get("MIT_BEAM_GATHER_SKIP", "0") == "1"
            if beam_gather_skip is None else bool(beam_gather_skip)
        )
        self._base_rng = rng if rng is not None else jax.random.PRNGKey(0)
        self._wave = 0
        from mit_tpu.decode.step import prepare_decode_params

        self.mesh = mesh
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            n_data = mesh.shape["data"]
            if num_slots % n_data != 0:
                raise ValueError(
                    f"num_slots={num_slots} must be divisible by the mesh "
                    f"data axis ({n_data})."
                )
            self._shard = lambda x, dim: jax.device_put(
                x, NamedSharding(
                    mesh, P(*(["data" if i == dim else None
                               for i in range(x.ndim)]))
                )
            )
            self._replicate = lambda x: jax.device_put(
                x, NamedSharding(mesh, P())
            )
        else:
            self._shard = lambda x, dim: x
            self._replicate = lambda x: x

        # cast + qkv-fuse the decoder weights once for the whole service life
        self._prepared = jax.tree.map(
            self._replicate,
            jax.jit(lambda p: prepare_decode_params(p, compute_dtype))(
                captioner.params["decoder"]
            ),
        )
        # admission's cross-constant projections, prepared/replicated once —
        # reading them from captioner.params every wave pulled the weights
        # from the un-replicated host copy on a mesh
        cross_raw = captioner.params["decoder"]["layers"]["cross"]
        self._cross_proj = {
            k: self._replicate(jnp.asarray(cross_raw[k]))
            for k in (("wk", "bk", "wv", "bv") if self.full_mem
                      else ("wv", "bv", "wo", "bo"))
        }
        L, d = cfg.num_layers, cfg.embed_dim
        # beam slots own K consecutive decoder rows; R = S (greedy/sample)
        self.R = num_slots * self.K
        # L per-layer (R, Tc, D) buffers, slot-sharded on dim 0 (see
        # _one_token_logits for why the cache is split per layer)
        self.k_cache = tuple(
            self._shard(jnp.zeros((self.R, self.Tc, d), compute_dtype), 0)
            for _ in range(L)
        )
        self.v_cache = tuple(
            self._shard(jnp.zeros((self.R, self.Tc, d), compute_dtype), 0)
            for _ in range(L)
        )
        if self.full_mem:
            h = cfg.num_heads
            kv = lambda: self._shard(
                jnp.zeros((L, self.R, h, self.s_mem, d // h), compute_dtype),
                1,
            )
            self.cross = {"k": kv(), "v": kv()}
        else:
            self.cross = {
                "const": self._shard(jnp.zeros((L, self.R, d), jnp.float32), 1)
            }
        pad = captioner.tokenizer.pad_id
        if method == "beam":
            # (S, K, Tc) token history per beam; the device returns
            # (new_tok, src_beam) per micro-step and the host replays the
            # beam reorder — the device never stores token history.
            self.tokens = np.full((num_slots, self.K, self.Tc), pad, np.int32)
            self.scores = np.zeros((num_slots, self.K), np.float32)
            self.finished = np.zeros((num_slots, self.K), bool)
        else:
            self.tokens = np.full((num_slots, self.Tc), pad, np.int32)
        self.pos = np.zeros((num_slots,), np.int32)
        self.active = np.zeros((num_slots,), bool)
        self.slot_request: List[Optional[int]] = [None] * num_slots
        # each active slot's memory row, kept so a bucket-capped caption can
        # migrate to the full-length batch path: a host (1, 1, d) row, or a
        # ("dev", chunk_id, row) reference into a device-resident chunk
        self.slot_memory: List[Optional[object]] = [None] * num_slots
        # (request_id, memory handle): host row or ("dev", chunk_id, row)
        self._queue: List[Tuple[int, object]] = []
        # device-resident encode chunks: chunk_id -> {"mem": (C, 1, d) f32
        # device array, "cross": (L, C, D) precomputed cross constants}.
        # Zero-copy admission: the memory BYTES never visit the host — the
        # per-chunk materialize/re-upload of the round-3 path cost a full
        # tunnel round trip (plus ~1 MB both ways) per chunk, and the cross
        # constants now compute at chunk-land time, off the admission path.
        self._chunks: Dict[int, Dict[str, jnp.ndarray]] = {}
        self._next_chunk = 0
        self._overflow: List[Tuple[int, np.ndarray]] = []
        self._results: Dict[int, List[int]] = {}
        self._next_id = 0
        self.steps_run = 0
        self.overflowed = 0

    # ------------------------------------------------------------------
    def _cross_rows_for(self, mem_batch: jnp.ndarray) -> dict:
        """(W, S_mem, d) memories → per-row cross state (tagged dict)."""
        if self.full_mem:
            return _cross_kv_for(
                self._cross_proj, mem_batch, self.cfg.num_heads, self.cd
            )
        return {"const": _cross_const_for(self._cross_proj, mem_batch)}

    def _enqueue(self, memory) -> int:
        rid = self._next_id
        self._next_id += 1
        self._queue.append(
            (rid, np.asarray(memory).reshape(1, self.s_mem, -1))
        )
        return rid

    def submit(self, image) -> int:
        """Queue one PIL image; returns a request id."""
        return self._enqueue(self.cap.memory_from_images([image]))

    def submit_memory(self, memory_row: np.ndarray) -> int:
        return self._enqueue(memory_row)

    def submit_memory_batch(self, memory, real: Optional[int] = None
                            ) -> List[int]:
        """Queue a batch of memory rows ZERO-COPY (device-resident).

        ``memory``: (C, d) / (C, 1, d) projected CLS memory, or
        (C, S_mem, d) full-sequence memory — a jax array stays on device
        end-to-end (the bytes never cross the host link); numpy uploads
        once. The per-row cross state (CLS constants, or full-memory cross
        K/V) computes here, at chunk-land time, so admission is a pure
        device-side gather+scatter.
        ``real``: number of leading rows to queue (default all) — encoder
        chunks pad to power-of-two batch shapes.
        """
        mem = jnp.asarray(memory, jnp.float32)
        c = mem.shape[0]
        mem = mem.reshape(c, self.s_mem, -1)
        real = c if real is None else real
        cid = self._next_chunk
        self._next_chunk += 1
        self._chunks[cid] = {
            "mem": mem,
            "cross": self._cross_rows_for(mem),
        }
        ids = []
        for r in range(real):
            rid = self._next_id
            self._next_id += 1
            self._queue.append((rid, ("dev", cid, r)))
            ids.append(rid)
        return ids

    def _gc_chunks(self) -> None:
        """Drop device chunks no longer referenced by the queue or any
        active slot (overflow entries materialized at eviction time)."""
        if not self._chunks:
            return
        live = {m[1] for _, m in self._queue
                if isinstance(m, tuple) and m[0] == "dev"}
        live |= {m[1] for m in self.slot_memory
                 if isinstance(m, tuple) and m[0] == "dev"}
        for cid in [c for c in self._chunks if c not in live]:
            del self._chunks[cid]

    def submit_batch(self, images: Sequence,
                     encode_batch_size: int = 256) -> List[int]:
        """Queue many images with BATCHED encoding.

        ``submit`` pays a full batch-1 encoder dispatch per image (~30 ms +
        round trip each) — at service rates the encoder becomes the
        bottleneck long before the decode slots do. Here images encode in
        fixed-size chunks; the final partial chunk pads by repetition to
        the next power of two, so the jitted encoder compiles a small
        bounded set of batch shapes (full chunks share one). Per-row
        memories then enter the admission queue as usual.

        Chunks stay DEVICE-RESIDENT end-to-end (``submit_memory_batch``):
        the encoded memory bytes never cross the host link, and each
        chunk's cross constants compute at land time, off the admission
        path. (The round-3 path materialized every chunk with
        ``np.asarray`` and re-uploaded it at admission — a dependent fetch
        plus ~1 MB both ways per chunk through a ~26 ms-RTT tunnel.)
        """
        ids: List[int] = []
        n = len(images)
        for i in range(0, n, encode_batch_size):
            chunk = list(images[i:i + encode_batch_size])
            real = len(chunk)
            # pad the (only) partial chunk to the next power of two so the
            # jitted encoder sees a small bounded set of batch shapes
            target = 1
            while target < real:
                target *= 2
            target = min(target, encode_batch_size)
            while len(chunk) < target:
                chunk.append(chunk[-1])
            mem = self.cap.memory_from_images(chunk)
            ids.extend(self.submit_memory_batch(mem, real))
        return ids

    def _admit(self) -> None:
        """Fill free slots from the queue.

        Admission is HOST bookkeeping plus one WAVE-sized device call: the
        cross constants are computed for the admitted rows only and
        row-scattered into the (L, R, D) buffer in place (recomputing all R
        rows made admission cost scale with slot count, not wave size). The
        wave pads to the next power of two, capped at R, so the jits see a
        small bounded set of shapes. The K/V caches need no reset — the
        step's visibility masks make stale rows unreachable. Per-slot
        device updates here were the round-1 service bottleneck: every
        ``.at[slot].set`` copied the full cache and variable wave sizes
        recompiled the scatter (measured 38 captions/s; batched fixed-shape
        admission + donated row-scatter steps reach ~2,900)."""
        free = [i for i in range(self.S) if not self.active[i]]
        # consecutive admissions from the same source batch into one device
        # call: (kind, payload) runs — ("host", [rows]) or ("dev", cid,
        # [chunk rows]) — each with its slot list
        runs: List[list] = []
        while free and self._queue:
            slot = free.pop()
            rid, memory = self._queue.pop(0)
            if isinstance(memory, tuple) and memory[0] == "dev":
                _, cid, r = memory
                if runs and runs[-1][0] == "dev" and runs[-1][1] == cid:
                    runs[-1][2].append(r)
                    runs[-1][3].append(slot)
                else:
                    runs.append(["dev", cid, [r], [slot]])
            else:
                row = np.asarray(memory, np.float32).reshape(self.s_mem, -1)
                if runs and runs[-1][0] == "host":
                    runs[-1][2].append(row)
                    runs[-1][3].append(slot)
                else:
                    runs.append(["host", None, [row], [slot]])
            self.tokens[slot] = self.cap.tokenizer.pad_id
            if self.method == "beam":
                self.tokens[slot, :, 0] = self.cap.tokenizer.start_id
                # only beam 0 is alive at step 0 (all K rows are identical
                # START copies; without this top-k would pick K duplicates)
                self.scores[slot] = _NEG
                self.scores[slot, 0] = 0.0
                self.finished[slot] = False
            else:
                self.tokens[slot, 0] = self.cap.tokenizer.start_id
            self.pos[slot] = 0
            self.active[slot] = True
            self.slot_request[slot] = rid
            self.slot_memory[slot] = memory
        for kind, cid, payload, slots in runs:
            # each admitted slot owns K consecutive decoder rows sharing its
            # memory; duplicate pad indices rewrite the first admitted row
            # with identical values (scatter order is then irrelevant)
            idx = [s * self.K + k for s in slots for k in range(self.K)]
            src = [r for r in payload for _ in range(self.K)]
            wave = 1
            while wave < len(idx):
                wave *= 2
            wave = min(wave, self.R)
            while len(idx) < wave:
                idx.append(idx[0])
                src.append(src[0])
            idx_j = jnp.asarray(np.asarray(idx, np.int32))
            if kind == "dev":
                self.cross = _scatter_cross_gathered(
                    self.cross, self._chunks[cid]["cross"],
                    jnp.asarray(np.asarray(src, np.int32)), idx_j,
                )
            else:
                rows = self._cross_rows_for(
                    jnp.asarray(np.stack(src))         # (W, S_mem, d)
                )
                self.cross = _scatter_cross_rows(self.cross, rows, idx_j)
        if runs:
            self._gc_chunks()

    def _finish(self, slot: int) -> None:
        rid = self.slot_request[slot]
        if self.method == "beam":
            # best total log-probability across finished and length-capped
            # beams — beam_generate's final-hypothesis rule
            best = int(np.argmax(self.scores[slot]))
            row = self.tokens[slot, best]
            length = int((row != self.cap.tokenizer.pad_id).sum())
            self._results[rid] = row[:length].tolist()
        else:
            length = int(self.pos[slot]) + 1
            self._results[rid] = self.tokens[slot, :length].tolist()
        self.active[slot] = False
        self.slot_request[slot] = None
        self.slot_memory[slot] = None

    def _overflow_slot(self, slot: int) -> None:
        """Evict a caption that outgrew the KV bucket; it re-decodes at full
        ``max_len`` through the batch path when the service drains."""
        m = self.slot_memory[slot]
        if isinstance(m, tuple) and m[0] == "dev":
            # materialize the one row now (overflow is rare-by-construction)
            # so the chunk itself can be garbage-collected
            m = np.asarray(self._chunks[m[1]]["mem"][m[2]])[None]
        self._overflow.append((self.slot_request[slot], m))
        self.overflowed += 1
        self.active[slot] = False
        self.slot_request[slot] = None
        self.slot_memory[slot] = None

    def _drain_overflow(self) -> None:
        """Batch-decode every bucket-capped request at full length.

        Decode is deterministic for greedy/beam, so re-running from the
        stored memory reproduces the bucketed prefix exactly and continues
        past it — token-identical to an unbucketed service. The batch pads
        to the next power of two so the jitted decode sees a bounded shape
        set. Runs unsharded (host-placed params) — overflow is
        rare-by-construction when ``cache_len`` is sized to the caption
        length distribution."""
        if not self._overflow:
            return
        from mit_tpu.decode.beam import beam_generate
        from mit_tpu.decode.greedy import greedy_generate

        pending, self._overflow = self._overflow, []
        tok = self.cap.tokenizer
        dec = self.cap.params["decoder"]
        rids = [r for r, _ in pending]
        mems = np.concatenate([m for _, m in pending], axis=0)
        self._gc_chunks()
        real = len(rids)
        target = 1
        while target < real:
            target *= 2
        if target > real:
            mems = np.concatenate(
                [mems, np.repeat(mems[:1], target - real, axis=0)], axis=0
            )
        mem_j = jnp.asarray(mems, jnp.float32)
        if self.method == "beam":
            tokens, _ = beam_generate(
                dec, self.cfg, mem_j, tok.start_id, tok.end_id, tok.pad_id,
                self.T, self.K, compute_dtype=self.cd,
            )
            lengths = np.asarray((np.asarray(tokens) != tok.pad_id).sum(1))
        elif self.method == "sample":
            from mit_tpu.decode.sampling import sample_generate

            rng = jax.random.fold_in(self._base_rng, (1 << 20) + self._wave)
            self._wave += 1
            tokens, lengths = sample_generate(
                dec, self.cfg, mem_j, rng, tok.start_id, tok.end_id,
                tok.pad_id, self.T, temperature=self.temperature,
                top_k=self.top_k, top_p=self.top_p, compute_dtype=self.cd,
            )
        else:
            tokens, lengths = greedy_generate(
                dec, self.cfg, mem_j, tok.start_id, tok.end_id, tok.pad_id,
                self.T, compute_dtype=self.cd,
            )
        tokens = np.asarray(tokens)
        lengths = np.asarray(lengths)
        for i, rid in enumerate(rids):
            self._results[rid] = tokens[i, : lengths[i]].tolist()

    def step(self) -> None:
        """One decode window (``steps_per_sync`` tokens) for all active
        slots + admissions/evictions."""
        self._admit()
        if not self.active.any():
            return
        if self.method == "beam":
            self._step_beam()
        else:
            self._step_flat()

    def _step_flat(self) -> None:
        """Greedy/sample window: one decoder row per slot."""
        end_id = self.cap.tokenizer.end_id
        pad_id = self.cap.tokenizer.pad_id
        if self.method == "sample":
            rng = jax.random.fold_in(self._base_rng, self._wave)
            self._wave += 1
            temperature = self.temperature
        else:
            rng, temperature = None, 0.0
        cur = self.tokens[np.arange(self.S), self.pos]
        ids, _, _, self.k_cache, self.v_cache = service_decode_window(
            self._prepared, self.cfg,
            jnp.asarray(cur), jnp.asarray(self.pos), jnp.asarray(self.active),
            jnp.asarray(self.tokens == pad_id),
            self.k_cache, self.v_cache, self.cross,
            jnp.int32(end_id), jnp.int32(pad_id),
            self.cd, self.steps_per_sync,
            rng, temperature, self.top_k, self.top_p,
        )
        ids = np.asarray(ids)                           # (S, n_steps)
        # replay the window's micro-steps in host bookkeeping (the device
        # advanced slot state with identical semantics)
        for i in range(ids.shape[1]):
            act = self.active.copy()
            if not act.any():
                break
            nxt = ids[:, i]
            p = self.pos + 1
            self.tokens[np.where(act)[0], p[act]] = nxt[act]
            self.pos[act] = p[act]
            self.steps_run += 1
            ended = act & (nxt == end_id)
            capped = act & ~ended & (p >= self.Tc - 1)
            for slot in np.where(ended | capped)[0]:
                if capped[slot] and self.Tc < self.T:
                    self._overflow_slot(int(slot))
                else:
                    self._finish(int(slot))

    def _step_beam(self) -> None:
        """Beam window: K decoder rows per slot, host-replayed reorder."""
        end_id = self.cap.tokenizer.end_id
        pad_id = self.cap.tokenizer.pad_id
        s_idx = np.arange(self.S)[:, None]
        cur = self.tokens[s_idx, np.arange(self.K)[None, :],
                          self.pos[:, None]].reshape(self.R)
        (ids, srcs, scores, _, _, _, self.k_cache, self.v_cache,
         ) = service_beam_window(
            self._prepared, self.cfg,
            jnp.asarray(cur), jnp.asarray(self.pos), jnp.asarray(self.active),
            jnp.asarray((self.tokens == pad_id).reshape(self.R, self.Tc)),
            self.k_cache, self.v_cache, self.cross,
            jnp.asarray(self.scores), jnp.asarray(self.finished),
            jnp.int32(end_id), jnp.int32(pad_id),
            self.K, self.cd, self.steps_per_sync,
            gather_skip=self._beam_gather_skip,
        )
        ids = np.asarray(ids)                           # (S, K, n_steps)
        srcs = np.asarray(srcs)
        # the device freezes a slot's scores at deactivation, so the final
        # window scores ARE each slot's at-finish scores — safe to adopt
        # wholesale before replaying micro-steps
        self.scores = np.array(scores)      # copy: jax buffers are read-only
        for i in range(ids.shape[2]):
            act = self.active.copy()
            if not act.any():
                break
            nt = ids[:, :, i]                            # (S, K)
            sb = srcs[:, :, i]
            p = self.pos + 1
            idx = np.where(act)[0]
            sb_a = sb[idx]
            self.tokens[idx] = np.take_along_axis(
                self.tokens[idx], sb_a[:, :, None], axis=1
            )
            self.tokens[idx[:, None], np.arange(self.K)[None, :],
                        p[idx][:, None]] = nt[idx]
            self.finished[idx] = (
                np.take_along_axis(self.finished[idx], sb_a, axis=1)
                | (nt[idx] == end_id)
            )
            self.pos[act] = p[act]
            self.steps_run += 1
            all_fin = self.finished.all(axis=1)
            done = act & (all_fin | (p >= self.Tc - 1))
            for slot in np.where(done)[0]:
                # a bucket-capped slot with live beams migrates: full-length
                # beam search could still find a better finished hypothesis
                if not all_fin[slot] and self.Tc < self.T:
                    self._overflow_slot(int(slot))
                else:
                    self._finish(int(slot))

    # ------------------------------------------------------------------
    def run_to_completion(self, max_steps: int = 100000) -> Dict[int, List[int]]:
        steps = 0
        while (self._queue or self.active.any()) and steps < max_steps:
            self.step()
            steps += 1
        self._drain_overflow()
        self._gc_chunks()
        return dict(self._results)

    def run_stream(self, encodes, lookahead: int = 2,
                   max_steps: int = 100000) -> List[int]:
        """Drive the decode loop over a LAZY stream of encoder chunks.

        ``encodes`` is an iterator yielding ``(memory, real_rows)`` pairs,
        where ``memory`` is an un-materialized device array of (chunk, S_mem,
        D) encoder outputs — each ``next()`` should *dispatch* one encoder
        chunk (JAX dispatch is async). Pulling chunks lazily from inside the
        decode loop interleaves them with the decode windows in the device
        stream: the chunk dispatched right after a window executes during the
        window's host round trip, so encoder time hides inside the RTT gaps
        the decode already pays instead of serializing ahead of the first
        window (``submit_batch`` dispatches everything up front — batch
        semantics, no overlap). ``lookahead`` chunks stay in flight; chunks
        enter the queue ZERO-COPY (``submit_memory_batch`` — the memory
        bytes never visit the host; admission gathers cross constants on
        device).

        Returns request ids in stream order.
        """
        ids: List[int] = []
        inflight: List[Tuple[jnp.ndarray, int]] = []
        exhausted = False

        def pull():
            nonlocal exhausted
            if exhausted:
                return
            try:
                inflight.append(next(encodes))
            except StopIteration:
                exhausted = True

        while len(inflight) < max(1, lookahead) and not exhausted:
            pull()
        steps = 0
        while steps < max_steps:
            # refill the queue from the oldest landed chunks until the next
            # admission wave can run at full slot capacity; dispatch the
            # next chunk(s) to fill the RTT gap
            while inflight and len(self._queue) < self.S:
                memory, real = inflight.pop(0)
                ids.extend(self.submit_memory_batch(memory, real))
                pull()
            if not (self._queue or self.active.any() or inflight):
                break
            self.step()
            steps += 1
        self._drain_overflow()
        self._gc_chunks()
        return ids

    def caption_stream(self, images: Sequence,
                       encode_batch_size: int = 256) -> List[str]:
        """Convenience: continuous-batch a stream of images → captions in
        submission order. Encoder chunks dispatch lazily from inside the
        decode loop (see :meth:`run_stream`) so encode overlaps the decode
        windows' host round trips."""
        n = len(images)

        def encodes():
            for i in range(0, n, encode_batch_size):
                chunk = list(images[i:i + encode_batch_size])
                real = len(chunk)
                target = 1
                while target < real:
                    target *= 2
                target = min(target, encode_batch_size)
                while len(chunk) < target:
                    chunk.append(chunk[-1])
                yield self.cap.memory_from_images(chunk), real

        ids = self.run_stream(encodes())
        return [self.cap.postprocess(self._results[r]) for r in ids]

    def result(self, request_id: int) -> Optional[List[int]]:
        return self._results.get(request_id)
