"""Decompose the per-token decode-step cost on the real TPU (flagship
config: 6-layer/512-dim decoder, B=1024, bucket T=16, CLS memory).

Each variant removes one component from a local copy of
mit_tpu.decode.step.decoder_step, isolating its share of the step time —
the measurement that motivated the (L, B, T, D) cache relayout and the
fused decode-layer kernel (ops/pallas_decode_layer.py).

Usage: python benchmarks/ab_decode_step.py [variant ...]
Env:   DB_B (batch, default 1024)  DB_STEPS (default 12)  DB_CPU=1

Variants:
  repo      — the repo decoder_step, 12 forced steps (fori_loop)
  fused     — repo step with MIT_FUSED_DECODE=1 (Pallas layer kernel)
  base      — local copy of the XLA step (should match repo)
  vpuattn   — attention as broadcast-multiply-reduce (no batched matmuls)
  nologits  — fc_out GEMM replaced by a slice-broadcast
  f32logits — fc_out GEMM with fp32 operands (the pre-round-3 layout)
  noattn    — scores/softmax/ctx replaced by a qf slice
  nocache   — no cache update (attends stale zeros)
  splitcache — cache carried as L separate (B, T, D) buffers (tests the
               hypothesis that chained DUS+read on ONE (L, B, T, D) buffer
               makes XLA insert whole-cache defensive copies each step)
  tfirst    — splitcache with (T, B, D) per-layer buffers: the position
              update becomes a contiguous major-dim slab write
  stale     — splitcache + attend over the STALE cache with a fresh-row
              correction, scattering all new K/V rows at the END of the
              step body (the DUS is then the last consumer of each carried
              buffer, so XLA's loop aliasing can update in place)
  stalem    — stale on the single (L, B, T, D) buffer: all L rows stacked
              into ONE end-of-body DUS per cache (the least-invasive form)
  noffn     — FFN skipped
  noln      — layer norms skipped
  gemmsonly — nologits+noattn+nocache+noln (GEMMs + residuals only)
"""
import sys as _sys, os as _os
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import functools
import math
import sys
import time

import numpy as np
import jax
if __import__("os").environ.get("DB_CPU"):
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

from mit_tpu.config import Config
from mit_tpu.models.decoder import DecoderConfig
from mit_tpu.models.model import ModelConfig, init_model_params
from mit_tpu.decode.step import init_cache, prepare_decode_params, decoder_step
from mit_tpu.ops.attention import layer_norm
from mit_tpu.ops.masks import NEG_INF
from mit_tpu.ops.positional import sinusoid_table

import os
B = int(os.environ.get("DB_B", 1024))
STEPS = int(os.environ.get("DB_STEPS", 12))
BUCKET = 16

cfg = Config()
mcfg = ModelConfig.build(cfg, vocab_size=10000)
dec = mcfg.decoder
L, H, D = dec.num_layers, dec.num_heads, dec.embed_dim
HD = D // H
V = dec.vocab_size
CD = jnp.bfloat16


def local_step(params, tokens, pos, k_cache, v_cache, cross_const, key_pad,
               flags):
    cd = CD
    b = tokens.shape[0]
    if isinstance(k_cache, tuple):
        t_max = k_cache[0].shape[0 if "tfirst" in flags else 1]
    else:
        t_max = k_cache.shape[2]
    lay = params["layers"]
    x = params["emb"][tokens] * jnp.asarray(math.sqrt(D), cd)
    pos_table = sinusoid_table(dec.max_seq_len, D, dtype=cd)
    x = x + jax.lax.dynamic_index_in_dim(pos_table, pos, keepdims=False)
    visible = (jnp.arange(t_max) <= pos)[None, None, :]
    visible = jnp.logical_and(visible, ~key_pad[:, None, :])
    scale = jnp.asarray(1.0 / math.sqrt(HD), jnp.float32)

    split = isinstance(k_cache, tuple)
    tfirst = "tfirst" in flags
    stale = "stale" in flags
    new_rows = []
    for l in range(L):
        qf, kf, vf = jnp.split(x @ lay["wqkv"][l] + lay["bqkv"][l], 3, axis=-1)
        q = qf.reshape(b, H, HD)
        if stale:
            new_rows.append((kf, vf))
        elif tfirst:
            # (T, B, D) buffers: position update = contiguous slab at [pos]
            k_cache = tuple(
                c.at[pos].set(kf) if i == l else c
                for i, c in enumerate(k_cache))
            v_cache = tuple(
                c.at[pos].set(vf) if i == l else c
                for i, c in enumerate(v_cache))
        elif split:
            # per-layer buffers: the DUS and the read touch only THIS
            # layer's (B, T, D) array, so no whole-cache aliasing hazard
            k_cache = tuple(
                c.at[:, pos, :].set(kf) if i == l else c
                for i, c in enumerate(k_cache))
            v_cache = tuple(
                c.at[:, pos, :].set(vf) if i == l else c
                for i, c in enumerate(v_cache))
        elif "nocache" not in flags:
            k_cache = k_cache.at[l, :, pos, :].set(kf)
            v_cache = v_cache.at[l, :, pos, :].set(vf)
        if "noattn" in flags:
            sa = qf @ lay["wo"][l] + lay["bo"][l]
        elif "vpuattn" in flags:
            # broadcast-mul-reduce form: no batched tiny matmuls on the MXU
            k_l = k_cache[l].reshape(b, 1, t_max, D)
            v_l = v_cache[l].reshape(b, t_max, H, HD)
            prod = qf.astype(jnp.float32).reshape(b, 1, 1, D) * k_l.astype(jnp.float32)
            scores = prod.reshape(b, t_max, H, HD).sum(-1) * scale  # (B,T,H)
            vis = jnp.transpose(visible, (0, 2, 1))                  # (B,T,1)
            scores = jnp.where(vis, scores, NEG_INF)
            probs = jax.nn.softmax(scores, axis=1)                   # over T
            ctx = (probs.astype(jnp.float32)[..., None]
                   * v_l.astype(jnp.float32)).sum(1)                 # (B,H,HD)
            sa = ctx.reshape(b, D).astype(cd) @ lay["wo"][l] + lay["bo"][l]
        elif stale:
            if tfirst:
                k_l = k_cache[l].reshape(t_max, b, H, HD)
                v_l = v_cache[l].reshape(t_max, b, H, HD)
                scores = jnp.einsum("bhe,tbhe->bht", q, k_l,
                                    preferred_element_type=jnp.float32) * scale
            else:
                k_l = k_cache[l].reshape(b, t_max, H, HD)
                v_l = v_cache[l].reshape(b, t_max, H, HD)
                scores = jnp.einsum("bhe,bthe->bht", q, k_l,
                                    preferred_element_type=jnp.float32) * scale
            # the cache row at t == pos is stale: overwrite with the fresh
            # score, and add the fresh V row's contribution separately
            s_pos = (qf.astype(jnp.float32) * kf.astype(jnp.float32)
                     ).reshape(b, H, HD).sum(-1) * scale          # (B,H)
            at_pos = (jnp.arange(t_max) == pos)[None, None, :]    # (1,1,T)
            scores = jnp.where(at_pos, s_pos[:, :, None], scores)
            scores = jnp.where(visible, scores, NEG_INF)
            # round probs to cd FIRST (as base does) so the fresh-row split
            # only reorders the f32 accumulation, it doesn't change operands
            probs = jax.nn.softmax(scores, axis=-1).astype(cd)    # (B,H,T)
            p_pos = jnp.sum(jnp.where(at_pos, probs, 0.0)
                            .astype(jnp.float32), -1)             # (B,H)
            p_cache = jnp.where(at_pos, jnp.asarray(0.0, cd), probs)
            ctx = jnp.einsum("bht,tbhe->bhe" if tfirst else "bht,bthe->bhe",
                             p_cache, v_l,
                             preferred_element_type=jnp.float32)
            ctx = ctx + p_pos[..., None] * vf.astype(jnp.float32).reshape(b, H, HD)
            sa = ctx.astype(cd).reshape(b, D) @ lay["wo"][l] + lay["bo"][l]
        elif tfirst:
            k_l = k_cache[l].reshape(t_max, b, H, HD)
            v_l = v_cache[l].reshape(t_max, b, H, HD)
            scores = jnp.einsum("bhe,tbhe->bht", q, k_l,
                                preferred_element_type=jnp.float32) * scale
            scores = jnp.where(visible, scores, NEG_INF)
            probs = jax.nn.softmax(scores, axis=-1).astype(cd)
            ctx = jnp.einsum("bht,tbhe->bhe", probs, v_l,
                             preferred_element_type=jnp.float32).astype(cd)
            sa = ctx.reshape(b, D) @ lay["wo"][l] + lay["bo"][l]
        else:
            k_l = k_cache[l].reshape(b, t_max, H, HD)
            v_l = v_cache[l].reshape(b, t_max, H, HD)
            scores = jnp.einsum("bhe,bthe->bht", q, k_l,
                                preferred_element_type=jnp.float32) * scale
            scores = jnp.where(visible, scores, NEG_INF)
            probs = jax.nn.softmax(scores, axis=-1).astype(cd)
            ctx = jnp.einsum("bht,bthe->bhe", probs, v_l,
                             preferred_element_type=jnp.float32).astype(cd)
            sa = ctx.reshape(b, D) @ lay["wo"][l] + lay["bo"][l]
        if "noln" in flags:
            x = x + sa
        else:
            x = layer_norm(jax.tree.map(lambda a: a[l], lay["ln1"]), x + sa)
        ca = cross_const[l]
        if "noln" in flags:
            x = x + ca
        else:
            x = layer_norm(jax.tree.map(lambda a: a[l], lay["ln2"]), x + ca)
        if "noffn" not in flags:
            y = jax.nn.relu(x @ lay["w1"][l] + lay["b1"][l])
            y = y @ lay["w2"][l] + lay["b2"][l]
        else:
            y = x
        if "noln" in flags:
            x = x + y
        else:
            x = layer_norm(jax.tree.map(lambda a: a[l], lay["ln3"]), x + y)

    if stale:
        # all scatters at the end of the body: each carried buffer's last
        # consumer is its own DUS → eligible for in-place loop aliasing
        if not split:
            # mono (L, B, T, D) buffer: ONE stacked DUS per cache
            k_cache = k_cache.at[:, :, pos, :].set(
                jnp.stack([r[0] for r in new_rows]))
            v_cache = v_cache.at[:, :, pos, :].set(
                jnp.stack([r[1] for r in new_rows]))
        elif tfirst:
            k_cache = tuple(c.at[pos].set(new_rows[i][0])
                            for i, c in enumerate(k_cache))
            v_cache = tuple(c.at[pos].set(new_rows[i][1])
                            for i, c in enumerate(v_cache))
        else:
            k_cache = tuple(c.at[:, pos, :].set(new_rows[i][0])
                            for i, c in enumerate(k_cache))
            v_cache = tuple(c.at[:, pos, :].set(new_rows[i][1])
                            for i, c in enumerate(v_cache))

    if "nologits" in flags:
        logits = jnp.broadcast_to(x.astype(jnp.float32)[:, :1], (b, V))
    elif "f32logits" in flags:
        logits = x.astype(jnp.float32) @ params["fc_w"].astype(jnp.float32) + params["fc_b"]
    else:
        logits = jnp.dot(x, params["fc_w"].astype(cd),
                         preferred_element_type=jnp.float32) + params["fc_b"]
    return logits, k_cache, v_cache


def build_local(flags=()):
    flags = set(flags)

    @jax.jit
    def run(params, raw, memory, tokens0):
        cache = init_cache({"layers": raw}, dec, memory, None, BUCKET, CD)
        # init_cache returns per-layer tuples (the production layout);
        # mono variants model the pre-round-3 single (L, B, T, D) buffer
        k_cache, v_cache, cross_const = cache.k, cache.v, cache.cross_const
        if "tfirst" in flags:
            k_cache = tuple(jnp.transpose(c, (1, 0, 2)) for c in k_cache)
            v_cache = tuple(jnp.transpose(c, (1, 0, 2)) for c in v_cache)
        elif not (("splitcache" in flags or "stale" in flags)
                  and "mono" not in flags):
            k_cache = jnp.stack(k_cache)
            v_cache = jnp.stack(v_cache)

        def body(i, st):
            tokens, k_cache, v_cache = st
            cur = jax.lax.dynamic_index_in_dim(tokens, i, 1, keepdims=False)
            logits, k_cache, v_cache = local_step(
                params, cur, i, k_cache, v_cache, cross_const,
                (tokens == 0)[:, :BUCKET], flags)
            nxt = jnp.argmax(logits, -1).astype(jnp.int32)
            tokens = tokens.at[:, i + 1].set(nxt)
            return tokens, k_cache, v_cache

        tokens, _, _ = jax.lax.fori_loop(0, STEPS, body, (tokens0, k_cache, v_cache))
        return tokens

    return run


def build_repo():
    from mit_tpu.decode.greedy import laddered_decode_loop

    @jax.jit
    def run(params, raw, memory, tokens0):
        cache = init_cache({"layers": raw}, dec, memory, None, BUCKET, CD)

        def body(i, st):
            tokens, cache = st
            cur = jax.lax.dynamic_index_in_dim(tokens, i, 1, keepdims=False)
            logits, cache = decoder_step(
                params, dec, cur, i, cache, CD,
                key_pad=(tokens == 0)[:, :BUCKET])
            nxt = jnp.argmax(logits, -1).astype(jnp.int32)
            tokens = tokens.at[:, i + 1].set(nxt)
            return tokens, cache

        tokens, _ = jax.lax.fori_loop(0, STEPS, body, (tokens0, cache))
        return tokens

    return run


VARIANTS = {
    "base": (),
    "nologits": ("nologits",),
    "f32logits": ("f32logits",),
    "noattn": ("noattn",),
    "nocache": ("nocache",),
    "splitcache": ("splitcache",),
    "tfirst": ("tfirst",),
    "stale": ("stale",),
    "stalet": ("stale", "tfirst"),
    "stalem": ("stale", "mono"),
    "noffn": ("noffn",),
    "noln": ("noln",),
    "vpuattn": ("vpuattn",),
    "gemmsonly": ("nologits", "noattn", "nocache", "noln"),
}


def main():
    global raw_layers
    rng = jax.random.PRNGKey(0)
    params = init_model_params(rng, mcfg)
    raw_layers = params["decoder"]["layers"]
    prepared = prepare_decode_params(params["decoder"], CD)
    memory = jnp.asarray(
        np.random.default_rng(0).normal(size=(B, 1, D)) * 0.3, CD)
    tokens0 = jnp.full((B, 100), 0, jnp.int32).at[:, 0].set(2)

    names = sys.argv[1:] or ["repo", "base", "nologits", "f32logits",
                             "noattn", "nocache", "noffn", "noln", "gemmsonly"]
    for v in names:
        if v == "fused":
            import os as _os
            _os.environ["MIT_FUSED_DECODE"] = "1"
            run = build_repo()
        elif v == "repo":
            _os = None
            run = build_repo()
        else:
            _os = None
            run = build_local(VARIANTS[v])
        r = run(prepared, raw_layers, memory, tokens0)
        int(jnp.sum(r))
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            int(jnp.sum(run(prepared, raw_layers, memory, tokens0)))
            ts.append(time.perf_counter() - t0)
        ms = 1e3 * float(np.median(ts))
        print(f"{v:10s} {ms:7.2f} ms /{STEPS} steps = {ms/STEPS:6.3f} ms/step",
              flush=True)
        if v == "fused":
            import os
            os.environ.pop("MIT_FUSED_DECODE", None)


if __name__ == "__main__":
    main()
