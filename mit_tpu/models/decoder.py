"""Trainable transformer decoder (functional, jit-first).

Re-designs the reference decoder (reference decoder.py:75-193: embedding →
sinusoidal PE → stack of post-LN ``nn.TransformerDecoderLayer`` → vocab
projection) as a pure function over an explicit parameter pytree:

- layer parameters are *stacked* along a leading layer axis and the stack is
  traversed with ``lax.scan`` — XLA compiles one layer body regardless of
  depth (the reference re-traces 6 separate modules);
- masks are built from indices inside the function, never passed in;
- the CLS-memory cross-attention collapses to the single-key fast path
  (see ops/attention.py), removing the reference's per-layer cross-attention
  score pipeline entirely;
- compute runs in a configurable dtype (bf16 on the MXU), params stay fp32.

Semantics parity: with identical weights, logits match torch's
``nn.TransformerDecoder(TransformerDecoderLayer(batch_first=True))`` stack to
fp tolerance (tests/test_decoder_parity.py), including the reference's
embedding scaling by sqrt(D) (decoder.py:168), additive causal + key-padding
masks (decoder.py:153-162), post-LN residual layout and ReLU FFN.
"""

from __future__ import annotations

import math
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from mit_tpu.ops.attention import (
    layer_norm,
    multihead_attention,
    single_key_cross_attention,
)
from mit_tpu.ops.masks import NEG_INF
from mit_tpu.ops.positional import sinusoid_table


class DecoderConfig(NamedTuple):
    """Architecture knobs (names follow reference config.py:55-72)."""

    vocab_size: int
    embed_dim: int = 512
    num_heads: int = 8
    num_layers: int = 6
    ff_dim: int = 2048
    max_seq_len: int = 100
    dropout: float = 0.1
    pad_idx: int = 0


# ----------------------------------------------------------------------
# Initialization
# ----------------------------------------------------------------------
def _xavier(key, shape, fan_in, fan_out, dtype=jnp.float32):
    limit = math.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(key, shape, dtype, -limit, limit)


def _init_attn(key, L, d):
    """Per-layer attention params, stacked (L, ...).

    Matches the reference's init statistics: torch packs Q/K/V into one
    (3D, D) ``in_proj_weight`` which reference decoder.py:128-132 inits with
    xavier-uniform — fan sum is D + 3D — so we draw the packed matrix and
    split it.
    """
    ks = jax.random.split(key, L + 1)
    packed = jnp.stack(
        [_xavier(k, (d, 3 * d), fan_in=d, fan_out=3 * d) for k in ks[:L]]
    )  # (L, D, 3D) in (in, out) layout
    wq, wk, wv = jnp.split(packed, 3, axis=2)
    wo = jnp.stack(
        [
            _xavier(k, (d, d), d, d)
            for k in jax.random.split(ks[L], L)
        ]
    )
    zeros = jnp.zeros((L, d))
    return {
        "wq": wq, "wk": wk, "wv": wv, "wo": wo,
        "bq": zeros, "bk": zeros, "bv": zeros, "bo": zeros,
    }


def init_decoder_params(key: jax.Array, cfg: DecoderConfig) -> dict:
    """Xavier-uniform for >1-D params, zero biases, unit LN scales.

    Mirrors reference decoder.py:128-132 (xavier on every dim>1 param —
    including the embedding table, which overwrites torch's zeroed pad row;
    the pad row is instead kept frozen by zeroing its gradient in the train
    step, reproducing ``padding_idx`` semantics).
    """
    v, d, f, L = cfg.vocab_size, cfg.embed_dim, cfg.ff_dim, cfg.num_layers
    k_emb, k_self, k_cross, k_ffn, k_out = jax.random.split(key, 5)

    kf = jax.random.split(k_ffn, 2 * L)
    w1 = jnp.stack([_xavier(k, (d, f), d, f) for k in kf[:L]])
    w2 = jnp.stack([_xavier(k, (f, d), f, d) for k in kf[L:]])

    ln = {"scale": jnp.ones((L, d)), "bias": jnp.zeros((L, d))}
    return {
        "token_embedding": _xavier(k_emb, (v, d), fan_in=d, fan_out=v),
        "layers": {
            "self": _init_attn(k_self, L, d),
            "cross": _init_attn(k_cross, L, d),
            "ffn": {
                "w1": w1, "b1": jnp.zeros((L, f)),
                "w2": w2, "b2": jnp.zeros((L, d)),
            },
            "ln1": dict(ln), "ln2": dict(ln), "ln3": dict(ln),
        },
        "fc_out_w": _xavier(k_out, (d, v), fan_in=d, fan_out=v),
        "fc_out_b": jnp.zeros((v,)),
    }


# ----------------------------------------------------------------------
# Forward (teacher-forced, full sequence)
# ----------------------------------------------------------------------
def _dropout(x, rate, rng, deterministic):
    if rate <= 0.0 or deterministic:
        return x
    keep = jax.random.bernoulli(rng, 1.0 - rate, x.shape)
    return jnp.where(keep, x / (1.0 - rate), 0.0)


def decoder_forward(
    params: dict,
    cfg: DecoderConfig,
    tgt_tokens: jnp.ndarray,          # (B, T) int32
    memory: jnp.ndarray,              # (B, S, D)
    memory_padding_mask: Optional[jnp.ndarray] = None,  # (B, S) bool, True=pad
    deterministic: bool = True,
    rng: Optional[jax.Array] = None,
    compute_dtype=jnp.float32,
    use_pallas: Optional[bool] = None,
    remat: bool = False,
) -> jnp.ndarray:
    """Full-sequence forward → logits (B, T, V) in fp32.

    Equivalent of reference decoder.py:134-193 forward. ``use_pallas=None``
    auto-enables the fused attention kernel on TPU.

    ``remat`` applies per-layer rematerialization (``jax.checkpoint`` on the
    scanned layer body): activations inside each layer are recomputed in the
    backward pass instead of stored — the standard HBM-for-FLOPs trade for
    training configurations that don't fit otherwise (no reference
    equivalent; torch would use ``torch.utils.checkpoint``).
    """
    if use_pallas is None:
        from mit_tpu.ops.pallas_attention import pallas_enabled

        use_pallas = pallas_enabled()
    b, t = tgt_tokens.shape
    d = cfg.embed_dim
    cd = compute_dtype
    drop = cfg.dropout

    # Masking is structural (causal flag + per-key pad vector) — fused into
    # the attention kernel; the reference materializes (T,T) float masks
    # (reference decoder.py:153-162).
    tgt_pad = jnp.where(tgt_tokens == cfg.pad_idx, NEG_INF, 0.0)

    mem_mask = None
    single_key = memory.shape[1] == 1 and memory_padding_mask is None
    if not single_key and memory_padding_mask is not None:
        mem_mask = jnp.where(memory_padding_mask, NEG_INF, 0.0)[:, None, None, :]

    # Embedding * sqrt(D) + positional + dropout (reference decoder.py:164-170).
    emb = params["token_embedding"].astype(cd)[tgt_tokens] * jnp.asarray(
        math.sqrt(d), cd
    )
    pos = sinusoid_table(cfg.max_seq_len, d, dtype=cd)
    x = emb + pos[None, :t, :]
    if rng is None:
        rng = jax.random.PRNGKey(0)
    rng, r = jax.random.split(rng)
    x = _dropout(x, drop, r, deterministic)

    mem = memory.astype(cd)

    def layer_body(carry, layer):
        x, rng = carry
        rng, r1, r2, r3, r4, r5 = jax.random.split(rng, 6)

        # Self-attention sublayer (post-LN).
        sa = multihead_attention(
            layer["self"], x, x, cfg.num_heads, None,
            drop, r1, deterministic, cd,
            use_flash=use_pallas, causal=True, pad_add=tgt_pad,
        )
        x = layer_norm(layer["ln1"], x + _dropout(sa, drop, r2, deterministic))

        # Cross-attention sublayer.
        if single_key:
            ca = single_key_cross_attention(
                layer["cross"], t, mem, cfg.num_heads,
                drop, r3, deterministic, cd,
            )
        else:
            ca = multihead_attention(
                layer["cross"], x, mem, cfg.num_heads, mem_mask,
                drop, r3, deterministic, cd,
            )
        x = layer_norm(layer["ln2"], x + _dropout(ca, drop, r4, deterministic))

        # FFN sublayer (ReLU, torch TransformerDecoderLayer default).
        f = layer["ffn"]
        h = jax.nn.relu(x @ f["w1"].astype(cd) + f["b1"].astype(cd))
        rng, r_in = jax.random.split(rng)
        h = _dropout(h, drop, r_in, deterministic)
        y = h @ f["w2"].astype(cd) + f["b2"].astype(cd)
        x = layer_norm(layer["ln3"], x + _dropout(y, drop, r5, deterministic))
        return (x, rng), None

    body = jax.checkpoint(layer_body) if remat else layer_body
    (x, _), _ = jax.lax.scan(body, (x, rng), params["layers"])

    # Vocab projection in fp32 for a numerically stable softmax/loss.
    logits = x.astype(jnp.float32) @ params["fc_out_w"].astype(jnp.float32)
    return logits + params["fc_out_b"]


# ----------------------------------------------------------------------
# Torch/safetensors weight interchange
# ----------------------------------------------------------------------
def params_from_torch_state_dict(
    sd: dict, cfg: DecoderConfig, prefix: str = ""
) -> dict:
    """Build our param pytree from a reference-format state dict.

    Accepts the reference's checkpoint naming (reference train.py:424,
    inference.py:66: keys like ``decoder.token_embedding.weight``,
    ``decoder.transformer_decoder.layers.{i}.self_attn.in_proj_weight``).
    Values may be numpy arrays or torch tensors.

    torch Linear stores (out, in); we store (in, out) → transpose.
    torch packs Q/K/V rows in ``in_proj_weight`` (3D, D) → split + transpose.
    """

    def get(name):
        a = sd[prefix + name]
        if hasattr(a, "detach"):
            a = a.detach().cpu().numpy()
        return np.asarray(a, dtype=np.float32)

    L, d = cfg.num_layers, cfg.embed_dim

    def attn(i, mod):
        w = get(f"transformer_decoder.layers.{i}.{mod}.in_proj_weight")
        bq, bk, bv = np.split(
            get(f"transformer_decoder.layers.{i}.{mod}.in_proj_bias"), 3
        )
        wq, wk, wv = np.split(w, 3, axis=0)
        return {
            "wq": wq.T, "wk": wk.T, "wv": wv.T,
            "wo": get(f"transformer_decoder.layers.{i}.{mod}.out_proj.weight").T,
            "bq": bq, "bk": bk, "bv": bv,
            "bo": get(f"transformer_decoder.layers.{i}.{mod}.out_proj.bias"),
        }

    def stack(dicts):
        return {
            k: jnp.asarray(np.stack([d[k] for d in dicts])) for k in dicts[0]
        }

    selfs = stack([attn(i, "self_attn") for i in range(L)])
    crosses = stack([attn(i, "multihead_attn") for i in range(L)])
    ffn = stack(
        [
            {
                "w1": get(f"transformer_decoder.layers.{i}.linear1.weight").T,
                "b1": get(f"transformer_decoder.layers.{i}.linear1.bias"),
                "w2": get(f"transformer_decoder.layers.{i}.linear2.weight").T,
                "b2": get(f"transformer_decoder.layers.{i}.linear2.bias"),
            }
            for i in range(L)
        ]
    )

    def ln(n):
        return stack(
            [
                {
                    "scale": get(f"transformer_decoder.layers.{i}.norm{n}.weight"),
                    "bias": get(f"transformer_decoder.layers.{i}.norm{n}.bias"),
                }
                for i in range(L)
            ]
        )

    return {
        "token_embedding": jnp.asarray(get("token_embedding.weight")),
        "layers": {
            "self": selfs,
            "cross": crosses,
            "ffn": ffn,
            "ln1": ln(1), "ln2": ln(2), "ln3": ln(3),
        },
        "fc_out_w": jnp.asarray(get("fc_out.weight").T),
        "fc_out_b": jnp.asarray(get("fc_out.bias")),
    }


def torch_state_dict_from_params(params: dict, prefix: str = "") -> dict:
    """Inverse of :func:`params_from_torch_state_dict` (numpy values).

    Lets checkpoints trained here be exported to the reference's safetensors
    layout (reference train.py:438-442) for interchange.
    """
    out = {}
    p = np.asarray
    out[prefix + "token_embedding.weight"] = p(params["token_embedding"])
    out[prefix + "fc_out.weight"] = p(params["fc_out_w"]).T
    out[prefix + "fc_out.bias"] = p(params["fc_out_b"])
    layers = params["layers"]
    L = layers["self"]["wq"].shape[0]
    for i in range(L):
        for mod, key in (("self_attn", "self"), ("multihead_attn", "cross")):
            a = layers[key]
            w = np.concatenate(
                [p(a["wq"][i]).T, p(a["wk"][i]).T, p(a["wv"][i]).T], axis=0
            )
            b = np.concatenate([p(a["bq"][i]), p(a["bk"][i]), p(a["bv"][i])])
            base = f"{prefix}transformer_decoder.layers.{i}.{mod}."
            out[base + "in_proj_weight"] = w
            out[base + "in_proj_bias"] = b
            out[base + "out_proj.weight"] = p(a["wo"][i]).T
            out[base + "out_proj.bias"] = p(a["bo"][i])
        base = f"{prefix}transformer_decoder.layers.{i}."
        f = layers["ffn"]
        out[base + "linear1.weight"] = p(f["w1"][i]).T
        out[base + "linear1.bias"] = p(f["b1"][i])
        out[base + "linear2.weight"] = p(f["w2"][i]).T
        out[base + "linear2.bias"] = p(f["b2"][i])
        for n in (1, 2, 3):
            out[base + f"norm{n}.weight"] = p(layers[f"ln{n}"]["scale"][i])
            out[base + f"norm{n}.bias"] = p(layers[f"ln{n}"]["bias"][i])
    return out
