"""Frozen vision encoders: ViT / CLIP-vision / BLIP-vision, TPU-native.

Replaces the reference's use of HF torch models as frozen feature extractors
(reference model.py:32-66 — name-substring dispatch to
``BlipForConditionalGeneration.vision_model`` / ``AutoModel`` /
``.vision_model``; reference encoder.py:20-63) with a single generic pre-LN
ViT implemented as pure JAX functions:

- patch embedding is a *matmul* over unfolded patches, not a convolution —
  identical math, but lands directly on the MXU as one large GEMM
  (the conv weight is flattened at conversion time);
- layer stack traversed with ``lax.scan`` (stacked params, one compiled body);
- family differences are data, not code: pre/post layer-norm placement,
  activation (gelu vs quick_gelu), patch-projection bias, layer-norm eps.

Numerical parity with the HF torch implementations is tested by constructing
small random HF models and comparing ``last_hidden_state``
(tests/test_vision_parity.py); real pretrained weights load through the same
converters from safetensors/torch state dicts.
"""

from __future__ import annotations

import math
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from mit_tpu.ops.attention import layer_norm, multihead_attention


class VisionConfig(NamedTuple):
    """Generic pre-LN ViT family config.

    ``family`` selects HF-compat behaviors:
      vit  — final LN over all tokens (ViTModel.layernorm), eps 1e-12
      clip — LN right after embeddings (pre_layrnorm); last_hidden_state is
             the raw encoder output (post_layernorm only affects pooling)
      blip — final LN over all tokens (post_layernorm)
    """

    family: str = "vit"
    image_size: int = 224
    patch_size: int = 16
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    hidden_act: str = "gelu"          # "gelu" (erf) | "quick_gelu"
    layer_norm_eps: float = 1e-12
    patch_bias: bool = True
    ln_pre: bool = False              # CLIP's pre_layrnorm
    ln_post: bool = True              # ViT/BLIP final LN over all tokens

    @property
    def num_patches(self) -> int:
        return (self.image_size // self.patch_size) ** 2

    @property
    def seq_len(self) -> int:
        return self.num_patches + 1


# ----------------------------------------------------------------------
# Presets for the encoder names the reference config offers
# (reference config.py:41-43). Shapes from the published HF configs.
# ----------------------------------------------------------------------
PRESETS = {
    "google/vit-base-patch16-224-in21k": VisionConfig(
        family="vit", image_size=224, patch_size=16, hidden_size=768,
        num_layers=12, num_heads=12, intermediate_size=3072,
        hidden_act="gelu", layer_norm_eps=1e-12,
        patch_bias=True, ln_pre=False, ln_post=True,
    ),
    "openai/clip-vit-base-patch32": VisionConfig(
        family="clip", image_size=224, patch_size=32, hidden_size=768,
        num_layers=12, num_heads=12, intermediate_size=3072,
        hidden_act="quick_gelu", layer_norm_eps=1e-5,
        patch_bias=False, ln_pre=True, ln_post=False,
    ),
    "openai/clip-vit-large-patch14": VisionConfig(
        family="clip", image_size=224, patch_size=14, hidden_size=1024,
        num_layers=24, num_heads=16, intermediate_size=4096,
        hidden_act="quick_gelu", layer_norm_eps=1e-5,
        patch_bias=False, ln_pre=True, ln_post=False,
    ),
    "Salesforce/blip-image-captioning-base": VisionConfig(
        family="blip", image_size=384, patch_size=16, hidden_size=768,
        num_layers=12, num_heads=12, intermediate_size=3072,
        hidden_act="gelu", layer_norm_eps=1e-5,
        patch_bias=True, ln_pre=False, ln_post=True,
    ),
    # Tiny random-init debug tower (no HF counterpart): lets the full CLI
    # surface (train.py / inference.py / bench) be smoke-driven on a single
    # CPU core in seconds, where ViT-Base compiles take minutes.
    "mit/tiny-vit-debug": VisionConfig(
        family="vit", image_size=224, patch_size=56, hidden_size=48,
        num_layers=1, num_heads=2, intermediate_size=64,
        hidden_act="gelu", layer_norm_eps=1e-12,
        patch_bias=True, ln_pre=False, ln_post=True,
    ),
}


def config_for_encoder(name: str) -> VisionConfig:
    """Name-substring dispatch, mirroring reference model.py:34-55.

    Exact preset names win; otherwise "blip" / "clip" / fallback "vit"
    substring rules pick the family with default ViT-Base geometry. For
    nonstandard geometries, build from the HF config object instead
    (:func:`config_from_hf`).
    """
    if name in PRESETS:
        return PRESETS[name]
    low = name.lower()
    if "blip" in low:
        return PRESETS["Salesforce/blip-image-captioning-base"]
    if "clip" in low:
        return PRESETS["openai/clip-vit-base-patch32"]
    return PRESETS["google/vit-base-patch16-224-in21k"]


def config_from_hf(hf_config, family: Optional[str] = None) -> VisionConfig:
    """Build a VisionConfig from a transformers config object.

    The automatic hidden-dim discovery of reference model.py:59-66: accepts
    ViTConfig / CLIPVisionConfig / BlipVisionConfig, or a composite
    CLIP/BLIP config (takes its ``vision_config`` — the reference's
    ``vision_config`` fallback). ``family`` is inferred from the config
    class name when omitted.
    """
    if hasattr(hf_config, "vision_config"):
        hf_config = hf_config.vision_config
    if family is None:
        cls = type(hf_config).__name__.lower()
        family = "blip" if "blip" in cls else "clip" if "clip" in cls else "vit"
    base = {
        "vit": PRESETS["google/vit-base-patch16-224-in21k"],
        "clip": PRESETS["openai/clip-vit-base-patch32"],
        "blip": PRESETS["Salesforce/blip-image-captioning-base"],
    }[family]
    return base._replace(
        image_size=hf_config.image_size,
        patch_size=hf_config.patch_size,
        hidden_size=hf_config.hidden_size,
        num_layers=hf_config.num_hidden_layers,
        num_heads=hf_config.num_attention_heads,
        intermediate_size=hf_config.intermediate_size,
        hidden_act=getattr(hf_config, "hidden_act", base.hidden_act),
        layer_norm_eps=getattr(hf_config, "layer_norm_eps", base.layer_norm_eps),
    )


# ----------------------------------------------------------------------
# Init (random weights; pretrained paths go through the converters below)
# ----------------------------------------------------------------------
def init_vision_params(key: jax.Array, cfg: VisionConfig) -> dict:
    d, f, L = cfg.hidden_size, cfg.intermediate_size, cfg.num_layers
    pdim = cfg.patch_size * cfg.patch_size * 3
    ks = iter(jax.random.split(key, 16))
    init = lambda k, shape: jax.random.normal(k, shape) * 0.02
    ln = lambda: {"scale": jnp.ones((L, d)), "bias": jnp.zeros((L, d))}
    params = {
        "patch_w": init(next(ks), (pdim, d)),
        "patch_b": jnp.zeros((d,)),
        "cls": init(next(ks), (d,)),
        "pos": init(next(ks), (cfg.seq_len, d)),
        "layers": {
            "attn": {
                "wq": init(next(ks), (L, d, d)),
                "wk": init(next(ks), (L, d, d)),
                "wv": init(next(ks), (L, d, d)),
                "wo": init(next(ks), (L, d, d)),
                "bq": jnp.zeros((L, d)), "bk": jnp.zeros((L, d)),
                "bv": jnp.zeros((L, d)), "bo": jnp.zeros((L, d)),
            },
            "ln1": ln(), "ln2": ln(),
            "fc1": init(next(ks), (L, d, f)), "b1": jnp.zeros((L, f)),
            "fc2": init(next(ks), (L, f, d)), "b2": jnp.zeros((L, d)),
        },
    }
    if cfg.ln_pre:
        params["ln_pre"] = {"scale": jnp.ones((d,)), "bias": jnp.zeros((d,))}
    if cfg.ln_post:
        params["ln_post"] = {"scale": jnp.ones((d,)), "bias": jnp.zeros((d,))}
    return params


# ----------------------------------------------------------------------
# Forward
# ----------------------------------------------------------------------
def _quick_gelu(x):
    return x * jax.nn.sigmoid(1.702 * x)


def _patchify(pixel_values: jnp.ndarray, patch: int) -> jnp.ndarray:
    """(B, 3, H, W) NCHW → (B, N, patch*patch*3) with conv-flatten ordering.

    Ordering matches torch Conv2d weight flattening (C, kH, kW) and row-major
    patch-grid traversal, so the matmul equals the reference's strided conv.
    """
    b, c, h, w = pixel_values.shape
    gh, gw = h // patch, w // patch
    x = pixel_values.reshape(b, c, gh, patch, gw, patch)
    x = x.transpose(0, 2, 4, 1, 3, 5)       # (B, gh, gw, C, p, p)
    return x.reshape(b, gh * gw, c * patch * patch)


def vision_forward(
    params: dict,
    cfg: VisionConfig,
    pixel_values: jnp.ndarray,            # (B, 3, H, W) fp32, NCHW (HF layout)
    compute_dtype=jnp.float32,
    use_pallas: bool = None,
    cls_only: bool = False,
) -> jnp.ndarray:
    """Returns last_hidden_state (B, N+1, D), matching the HF family model.

    Equivalent of the frozen-encoder forward the reference calls under
    ``torch.no_grad()`` (reference model.py:133-141, encoder.py:65-110).
    ``use_pallas=None`` auto-enables the fused attention kernel on TPU.

    ``cls_only=True`` returns only the CLS row (B, 1, D) — bit-equal to
    ``full[:, :1]`` but skipping the last layer's work for the other N
    patch rows (their final-layer outputs influence nothing downstream in
    CLS-memory mode, reference model.py:141): the last layer attends with
    the CLS query alone and runs its MLP on one token. Measured on v5e:
    +7% encoder throughput at ViT-B/16 B=1024.
    """
    if use_pallas is None:
        from mit_tpu.ops.pallas_attention import pallas_enabled

        use_pallas = pallas_enabled()
    cd = compute_dtype
    eps = cfg.layer_norm_eps
    b = pixel_values.shape[0]
    d = cfg.hidden_size

    patches = _patchify(pixel_values.astype(cd), cfg.patch_size)
    x = patches @ params["patch_w"].astype(cd)
    if cfg.patch_bias:
        x = x + params["patch_b"].astype(cd)
    cls = jnp.broadcast_to(params["cls"].astype(cd), (b, 1, d))
    x = jnp.concatenate([cls, x], axis=1)
    x = x + params["pos"].astype(cd)[None, :, :]
    if cfg.ln_pre:
        x = layer_norm(params["ln_pre"], x, eps)

    act = _quick_gelu if cfg.hidden_act == "quick_gelu" else jax.nn.gelu
    # jax.nn.gelu(approximate=False) is the erf gelu HF "gelu" uses.
    exact = cfg.hidden_act != "quick_gelu"

    def body(x, layer):
        h = layer_norm(layer["ln1"], x, eps)
        a = multihead_attention(
            layer["attn"], h, h, cfg.num_heads, compute_dtype=cd,
            use_flash=use_pallas,
        )
        x = x + a
        h = layer_norm(layer["ln2"], x, eps)
        h = h @ layer["fc1"].astype(cd) + layer["b1"].astype(cd)
        h = jax.nn.gelu(h, approximate=False) if exact else act(h)
        h = h @ layer["fc2"].astype(cd) + layer["b2"].astype(cd)
        return x + h, None

    if not cls_only:
        x, _ = jax.lax.scan(body, x, params["layers"])
    else:
        # all-but-last layers in the scan, then the last layer CLS-only
        lay = params["layers"]
        x, _ = jax.lax.scan(body, x, jax.tree.map(lambda a: a[:-1], lay))
        layer = jax.tree.map(lambda a: a[-1], lay)
        h = layer_norm(layer["ln1"], x, eps)
        attn = layer["attn"]
        hd = d // cfg.num_heads
        # keys/values over the full sequence, query = CLS row only
        q1 = (h[:, :1] @ attn["wq"].astype(cd) + attn["bq"].astype(cd))
        k = (h @ attn["wk"].astype(cd) + attn["bk"].astype(cd))
        v_ = (h @ attn["wv"].astype(cd) + attn["bv"].astype(cd))
        bsz, s, _ = k.shape
        q1 = q1.reshape(bsz, cfg.num_heads, hd)
        k = k.reshape(bsz, s, cfg.num_heads, hd)
        v_ = v_.reshape(bsz, s, cfg.num_heads, hd)
        scores = jnp.einsum(
            "bhd,bshd->bhs", q1.astype(jnp.float32), k.astype(jnp.float32)
        ) / math.sqrt(hd)
        probs = jax.nn.softmax(scores, axis=-1)
        ctx = jnp.einsum("bhs,bshd->bhd", probs.astype(cd), v_)
        a = ctx.reshape(bsz, 1, d) @ attn["wo"].astype(cd) + attn["bo"].astype(cd)
        x = x[:, :1] + a
        h = layer_norm(layer["ln2"], x, eps)
        h = h @ layer["fc1"].astype(cd) + layer["b1"].astype(cd)
        h = jax.nn.gelu(h, approximate=False) if exact else act(h)
        x = x + (h @ layer["fc2"].astype(cd) + layer["b2"].astype(cd))

    if cfg.ln_post:
        x = layer_norm(params["ln_post"], x, eps)
    return x


# ----------------------------------------------------------------------
# int8 quantized inference path (W8A8 on the GEMMs, opt-in).
#
# The encoder is FROZEN (reference model.py:85-89), so post-training
# quantization costs nothing at train time and no gradients ever meet the
# int8 weights. The v5e MXU runs int8 at 2x bf16 peak (measured 1.72x on
# GEMM chains); ~96% of ViT FLOPs are plain GEMMs, so those run int8 while
# layernorm / softmax-attention / GELU / residuals stay bf16-fp32.
# ----------------------------------------------------------------------
def quantize_vision_params(params: dict, cfg: VisionConfig) -> dict:
    """Float encoder params → int8 GEMM weights (QuantizedLinear leaves).

    Per-output-channel symmetric scales, computed once at load time.
    Non-GEMM params (layernorms, cls, pos) pass through unchanged.
    """
    from mit_tpu.ops.quant import quantize_weight

    lay = params["layers"]
    attn = lay["attn"]
    # Q/K/V fuse into ONE (L, D, 3D) int8 GEMM: per-output-channel scales
    # make column concatenation exact (each column quantizes independently),
    # and one kernel call quantizes the activation once instead of thrice.
    qp = {
        "patch": quantize_weight(
            params["patch_w"],
            params.get("patch_b") if cfg.patch_bias else None,
        ),
        "cls": params["cls"],
        "pos": params["pos"],
        "layers": {
            "attn": {
                "qkv": quantize_weight(
                    jnp.concatenate(
                        [attn["wq"], attn["wk"], attn["wv"]], axis=-1
                    ),
                    jnp.concatenate(
                        [attn["bq"], attn["bk"], attn["bv"]], axis=-1
                    ),
                ),
                "o": quantize_weight(attn["wo"], attn["bo"]),
            },
            "ln1": lay["ln1"],
            "ln2": lay["ln2"],
            "fc1": quantize_weight(lay["fc1"], lay["b1"]),
            "fc2": quantize_weight(lay["fc2"], lay["b2"]),
        },
    }
    for k in ("ln_pre", "ln_post"):
        if k in params:
            qp[k] = params[k]
    return qp


def _attention_btd(q, k, v, head_dim):
    """Bidirectional unpadded attention on (B, T, D) activations (XLA) —
    the int8 path's non-kernel fallback (the kernel paths carry their own
    fused attention)."""
    from mit_tpu.ops.pallas_attention import _xla_attention_btd

    pad0 = jnp.zeros((q.shape[0], k.shape[1]), jnp.float32)
    return _xla_attention_btd(q, k, v, pad0, False, head_dim)


def vision_forward_int8(
    qparams: dict,
    cfg: VisionConfig,
    pixel_values: jnp.ndarray,            # (B, 3, H, W) fp32, NCHW
    compute_dtype=jnp.bfloat16,
    use_pallas: bool = None,
    cls_only: bool = False,
) -> jnp.ndarray:
    """int8-GEMM twin of :func:`vision_forward` over quantized params.

    Same structure and masks; every GEMM (patch embed, QKV/out projections,
    MLP) runs int8xint8→int32 on the MXU with per-token dynamic activation
    scales. Returns last_hidden_state (B, N+1, D) — or (B, 1, D) with
    ``cls_only`` (same last-layer narrowing as the float path).

    GEMMs run through the fused Pallas int8 kernels
    (ops/pallas_int8_mlp.py): quantize + GEMM + dequant/bias (+ GELU +
    requant for the MLP pair) in one VMEM pass — the naive XLA int8 path
    loses to bf16 because every (M, N) int32 accumulator round-trips HBM
    (measured 21.2 vs 19.5 ms per MLP block; the fused kernel does 14.7).
    """
    from mit_tpu.ops.pallas_int8_mlp import fused_int8_mlp, int8_linear

    if use_pallas is None:
        from mit_tpu.ops.pallas_attention import pallas_enabled

        use_pallas = pallas_enabled()
    cd = compute_dtype
    eps = cfg.layer_norm_eps
    b = pixel_values.shape[0]
    d = cfg.hidden_size
    hd = d // cfg.num_heads

    patch_q = qparams["patch"]
    if patch_q.bias is None:
        patch_q = patch_q._replace(bias=jnp.zeros((d,), jnp.float32))
    patches = _patchify(pixel_values.astype(cd), cfg.patch_size)
    x = int8_linear(patches, patch_q, cd)
    cls = jnp.broadcast_to(qparams["cls"].astype(cd), (b, 1, d))
    x = jnp.concatenate([cls, x], axis=1)
    x = x + qparams["pos"].astype(cd)[None, :, :]
    if cfg.ln_pre:
        x = layer_norm(qparams["ln_pre"], x, eps)

    def attn_block(x, layer, q_rows=None):
        """Attention sublayer; q_rows narrows queries (CLS-only last layer)."""
        h = layer_norm(layer["ln1"], x, eps)
        a = layer["attn"]
        qkv = int8_linear(h, a["qkv"], cd)               # (B, S, 3D)
        if q_rows is None:
            if use_pallas:
                from mit_tpu.ops.pallas_attention import (
                    flash_attention_btd_fusedqkv,
                )

                # fused-qkv kernel: q/k/v are column slices read in VMEM —
                # no splits or copies of the (B, S, 3D) tensor
                ctx = flash_attention_btd_fusedqkv(qkv, hd)
            else:
                q, k, v = jnp.split(qkv, 3, axis=-1)
                ctx = _attention_btd(q, k, v, hd)
            return x + int8_linear(ctx, a["o"], cd)
        bsz, s, _ = qkv.shape
        q1 = qkv[:, :q_rows, :d].reshape(bsz, q_rows, cfg.num_heads, hd)
        kh = qkv[:, :, d:2 * d].reshape(bsz, s, cfg.num_heads, hd)
        vh = qkv[:, :, 2 * d:].reshape(bsz, s, cfg.num_heads, hd)
        scores = jnp.einsum(
            "bqhd,bshd->bhqs", q1.astype(jnp.float32), kh.astype(jnp.float32)
        ) / math.sqrt(hd)
        probs = jax.nn.softmax(scores, axis=-1)
        ctx = jnp.einsum("bhqs,bshd->bqhd", probs.astype(cd), vh)
        return x[:, :q_rows] + int8_linear(
            ctx.reshape(bsz, q_rows, d), a["o"], cd
        )

    mlp_act = "quick_gelu" if cfg.hidden_act == "quick_gelu" else "gelu"

    def mlp_block(x, layer):
        h = layer_norm(layer["ln2"], x, eps)
        # whole MLP in one VMEM-resident kernel: no int32/hidden HBM trips
        return x + fused_int8_mlp(h, layer["fc1"], layer["fc2"], mlp_act, cd)

    from mit_tpu.ops.pallas_int8_layer import (
        _mega_pack,
        fused_int8_vit_layer,
        fused_int8_vit_layer_split,
        kernel_compiles,
        layer_fits_vmem,
        split_fits_vmem,
    )
    from mit_tpu.ops.pallas_attention import on_tpu

    geom = (cfg.seq_len, d, cfg.intermediate_size)

    def _compiles(kind):
        # On a real TPU, settle near-VMEM-budget geometries by actually
        # AOT-compiling the kernel (cached); the static fit estimates can't
        # see compiler buffer reuse. Interpret mode (tests) keeps
        # estimate-only dispatch — there is no Mosaic compile to probe.
        if not on_tpu():
            return True
        t, dd, f = geom
        pb = _mega_pack(b, t, dd, f) if kind == "mega" else 1
        return kernel_compiles(kind, pb, t, dd, f, cfg.num_heads, eps,
                               mlp_act, jnp.dtype(cd).name)

    if use_pallas and layer_fits_vmem(*geom) and _compiles("mega"):
        # Whole-layer mega-kernel (ops/pallas_int8_layer.py): LN1 → QKV →
        # attention → out-proj → LN2 → MLP in ONE VMEM pass — int8 weights
        # (7.1 MB/layer at ViT-B) stay resident, activations never touch
        # HBM inside a layer. Measured 24.1 vs ~31 ms/layer (bf16 XLA).
        def body(x, layer):
            return fused_int8_vit_layer(
                x, layer["ln1"], layer["attn"]["qkv"], layer["attn"]["o"],
                layer["ln2"], layer["fc1"], layer["fc2"],
                num_heads=cfg.num_heads, eps=eps, act=mlp_act,
            ), None
    elif use_pallas and split_fits_vmem(*geom) and _compiles("split"):
        # ViT-L-class geometry: two half-layer kernels (attention, MLP),
        # each with its weights resident; only the residual stream x
        # round-trips HBM between them.
        def body(x, layer):
            return fused_int8_vit_layer_split(
                x, layer["ln1"], layer["attn"]["qkv"], layer["attn"]["o"],
                layer["ln2"], layer["fc1"], layer["fc2"],
                num_heads=cfg.num_heads, eps=eps, act=mlp_act,
            ), None
    else:
        def body(x, layer):
            return mlp_block(attn_block(x, layer), layer), None

    if not cls_only:
        x, _ = jax.lax.scan(body, x, qparams["layers"])
    else:
        lay = qparams["layers"]
        x, _ = jax.lax.scan(body, x, jax.tree.map(lambda a: a[:-1], lay))
        layer = jax.tree.map(lambda a: a[-1], lay)
        x = mlp_block(attn_block(x, layer, q_rows=1), layer)

    if cfg.ln_post:
        x = layer_norm(qparams["ln_post"], x, eps)
    return x


# ----------------------------------------------------------------------
# HF weight conversion (torch/safetensors state dicts → our pytree)
# ----------------------------------------------------------------------
def _np(a):
    if hasattr(a, "detach"):
        a = a.detach().cpu().numpy()
    return np.asarray(a, dtype=np.float32)


def params_from_hf_vision(sd: dict, cfg: VisionConfig, prefix: str = "") -> dict:
    """Convert an HF vision state dict (any of the three families).

    ``prefix`` strips container nesting, e.g. ``"vision_model."`` for
    CLIPVisionModel or for the vision tower sliced out of a full CLIP/BLIP
    checkpoint (the reference takes ``.vision_model`` the same way,
    model.py:38,53).
    """
    g = lambda n: _np(sd[prefix + n])
    L, d = cfg.num_layers, cfg.hidden_size

    if cfg.family == "vit":
        conv_w = g("embeddings.patch_embeddings.projection.weight")
        patch_b = g("embeddings.patch_embeddings.projection.bias")
        cls = g("embeddings.cls_token").reshape(d)
        pos = g("embeddings.position_embeddings").reshape(-1, d)
        lyr = "encoder.layer.{i}."
        names = {
            "q": lyr + "attention.attention.query",
            "k": lyr + "attention.attention.key",
            "v": lyr + "attention.attention.value",
            "o": lyr + "attention.output.dense",
            "ln1": lyr + "layernorm_before",
            "ln2": lyr + "layernorm_after",
            "fc1": lyr + "intermediate.dense",
            "fc2": lyr + "output.dense",
        }
        ln_post = "layernorm"
    else:  # clip / blip share the CLIP-style encoder naming
        if cfg.family == "clip":
            conv_w = g("embeddings.patch_embedding.weight")
            patch_b = np.zeros((d,), np.float32)
            cls = g("embeddings.class_embedding").reshape(d)
            pos = g("embeddings.position_embedding.weight")
        else:  # blip
            conv_w = g("embeddings.patch_embedding.weight")
            patch_b = g("embeddings.patch_embedding.bias")
            cls = g("embeddings.class_embedding").reshape(d)
            pos = g("embeddings.position_embedding").reshape(-1, d)
        lyr = "encoder.layers.{i}."
        names = {
            "q": lyr + "self_attn.q_proj",
            "k": lyr + "self_attn.k_proj",
            "v": lyr + "self_attn.v_proj",
            "o": lyr + "self_attn.out_proj",
            "ln1": lyr + "layer_norm1",
            "ln2": lyr + "layer_norm2",
            "fc1": lyr + "mlp.fc1",
            "fc2": lyr + "mlp.fc2",
        }
        ln_post = "post_layernorm"

    def per_layer(fmt, kind):
        if kind == "w":
            return jnp.asarray(
                np.stack([g(fmt.format(i=i) + ".weight").T for i in range(L)])
            )
        return jnp.asarray(
            np.stack([g(fmt.format(i=i) + ".bias") for i in range(L)])
        )

    def per_layer_ln(fmt):
        return {
            "scale": jnp.asarray(
                np.stack([g(fmt.format(i=i) + ".weight") for i in range(L)])
            ),
            "bias": jnp.asarray(
                np.stack([g(fmt.format(i=i) + ".bias") for i in range(L)])
            ),
        }

    # BLIP packs q/k/v into one (3D, D) "qkv" matrix.
    if cfg.family == "blip":
        qkv_w = np.stack(
            [g(f"encoder.layers.{i}.self_attn.qkv.weight") for i in range(L)]
        )
        qkv_b = np.stack(
            [g(f"encoder.layers.{i}.self_attn.qkv.bias") for i in range(L)]
        )
        wq, wk, wv = np.split(qkv_w, 3, axis=1)   # rows are [q; k; v]
        bq, bk, bv = np.split(qkv_b, 3, axis=1)
        attn = {
            "wq": jnp.asarray(np.swapaxes(wq, 1, 2)),
            "wk": jnp.asarray(np.swapaxes(wk, 1, 2)),
            "wv": jnp.asarray(np.swapaxes(wv, 1, 2)),
            "wo": per_layer("encoder.layers.{i}.self_attn.projection", "w"),
            "bq": jnp.asarray(bq), "bk": jnp.asarray(bk), "bv": jnp.asarray(bv),
            "bo": per_layer("encoder.layers.{i}.self_attn.projection", "b"),
        }
    else:
        attn = {
            "wq": per_layer(names["q"], "w"), "bq": per_layer(names["q"], "b"),
            "wk": per_layer(names["k"], "w"), "bk": per_layer(names["k"], "b"),
            "wv": per_layer(names["v"], "w"), "bv": per_layer(names["v"], "b"),
            "wo": per_layer(names["o"], "w"), "bo": per_layer(names["o"], "b"),
        }

    params = {
        # torch conv weight (D, C, p, p) → flatten (C,p,p) → (C*p*p, D)
        "patch_w": jnp.asarray(conv_w.reshape(d, -1).T),
        "patch_b": jnp.asarray(patch_b),
        "cls": jnp.asarray(cls),
        "pos": jnp.asarray(pos),
        "layers": {
            "attn": attn,
            "ln1": per_layer_ln(names["ln1"]),
            "ln2": per_layer_ln(names["ln2"]),
            "fc1": per_layer(names["fc1"], "w"), "b1": per_layer(names["fc1"], "b"),
            "fc2": per_layer(names["fc2"], "w"), "b2": per_layer(names["fc2"], "b"),
        },
    }
    if cfg.ln_pre:
        params["ln_pre"] = {
            "scale": jnp.asarray(g("pre_layrnorm.weight")),
            "bias": jnp.asarray(g("pre_layrnorm.bias")),
        }
    if cfg.ln_post:
        params["ln_post"] = {
            "scale": jnp.asarray(g(ln_post + ".weight")),
            "bias": jnp.asarray(g(ln_post + ".bias")),
        }
    return params


def hf_vision_state_dict_from_params(
    params: dict, cfg: VisionConfig, prefix: str = ""
) -> dict:
    """Inverse of :func:`params_from_hf_vision` — export to HF naming.

    Enables writing full-model safetensors in the reference's checkpoint
    layout (reference train.py:441 saves the whole model incl. the frozen
    encoder) for interchange with the reference's inference.py.
    """
    out = {}
    p = lambda a: np.asarray(a, dtype=np.float32)
    d = cfg.hidden_size
    L = cfg.num_layers
    patch_w = p(params["patch_w"]).T.reshape(d, 3, cfg.patch_size, cfg.patch_size)

    if cfg.family == "vit":
        out[prefix + "embeddings.patch_embeddings.projection.weight"] = patch_w
        out[prefix + "embeddings.patch_embeddings.projection.bias"] = p(
            params["patch_b"]
        )
        out[prefix + "embeddings.cls_token"] = p(params["cls"]).reshape(1, 1, d)
        out[prefix + "embeddings.position_embeddings"] = p(params["pos"]).reshape(
            1, -1, d
        )
        lyr = "encoder.layer.{i}."
        names = {
            "q": lyr + "attention.attention.query",
            "k": lyr + "attention.attention.key",
            "v": lyr + "attention.attention.value",
            "o": lyr + "attention.output.dense",
            "ln1": lyr + "layernorm_before",
            "ln2": lyr + "layernorm_after",
            "fc1": lyr + "intermediate.dense",
            "fc2": lyr + "output.dense",
        }
        ln_post = "layernorm"
    else:
        out[prefix + "embeddings.patch_embedding.weight"] = patch_w
        if cfg.family == "blip":
            out[prefix + "embeddings.patch_embedding.bias"] = p(params["patch_b"])
            out[prefix + "embeddings.class_embedding"] = p(params["cls"]).reshape(
                1, 1, d
            )
            out[prefix + "embeddings.position_embedding"] = p(
                params["pos"]
            ).reshape(1, -1, d)
        else:  # clip
            out[prefix + "embeddings.class_embedding"] = p(params["cls"])
            out[prefix + "embeddings.position_embedding.weight"] = p(params["pos"])
        lyr = "encoder.layers.{i}."
        names = {
            "q": lyr + "self_attn.q_proj",
            "k": lyr + "self_attn.k_proj",
            "v": lyr + "self_attn.v_proj",
            "o": lyr + "self_attn.out_proj",
            "ln1": lyr + "layer_norm1",
            "ln2": lyr + "layer_norm2",
            "fc1": lyr + "mlp.fc1",
            "fc2": lyr + "mlp.fc2",
        }
        ln_post = "post_layernorm"

    lay = params["layers"]
    attn = lay["attn"]
    for i in range(L):
        if cfg.family == "blip":
            base = prefix + f"encoder.layers.{i}.self_attn."
            qkv_w = np.concatenate(
                [p(attn["wq"][i]).T, p(attn["wk"][i]).T, p(attn["wv"][i]).T], axis=0
            )
            qkv_b = np.concatenate(
                [p(attn["bq"][i]), p(attn["bk"][i]), p(attn["bv"][i])]
            )
            out[base + "qkv.weight"] = qkv_w
            out[base + "qkv.bias"] = qkv_b
            out[base + "projection.weight"] = p(attn["wo"][i]).T
            out[base + "projection.bias"] = p(attn["bo"][i])
        else:
            for key, wn, bn in (
                ("q", "wq", "bq"), ("k", "wk", "bk"),
                ("v", "wv", "bv"), ("o", "wo", "bo"),
            ):
                out[prefix + names[key].format(i=i) + ".weight"] = p(attn[wn][i]).T
                out[prefix + names[key].format(i=i) + ".bias"] = p(attn[bn][i])
        for lname in ("ln1", "ln2"):
            out[prefix + names[lname].format(i=i) + ".weight"] = p(
                lay[lname]["scale"][i]
            )
            out[prefix + names[lname].format(i=i) + ".bias"] = p(lay[lname]["bias"][i])
        out[prefix + names["fc1"].format(i=i) + ".weight"] = p(lay["fc1"][i]).T
        out[prefix + names["fc1"].format(i=i) + ".bias"] = p(lay["b1"][i])
        out[prefix + names["fc2"].format(i=i) + ".weight"] = p(lay["fc2"][i]).T
        out[prefix + names["fc2"].format(i=i) + ".bias"] = p(lay["b2"][i])

    if cfg.ln_pre:
        out[prefix + "pre_layrnorm.weight"] = p(params["ln_pre"]["scale"])
        out[prefix + "pre_layrnorm.bias"] = p(params["ln_pre"]["bias"])
    if cfg.ln_post:
        out[prefix + ln_post + ".weight"] = p(params["ln_post"]["scale"])
        out[prefix + ln_post + ".bias"] = p(params["ln_post"]["bias"])
    return out


def detect_hf_prefix(sd: dict, cfg: VisionConfig) -> str:
    """Find the key prefix of the vision tower inside a state dict.

    Handles: bare vision model, ``vision_model.`` nesting (CLIPVisionModel /
    full CLIP / BLIP checkpoints), and the reference's combined-model export
    where the tower sits under ``encoder.`` (reference model.py:38,53).
    """
    probe = (
        "embeddings.patch_embeddings.projection.weight"
        if cfg.family == "vit"
        else "embeddings.patch_embedding.weight"
    )
    for prefix in ("", "vision_model.", "encoder.", "encoder.vision_model."):
        if prefix + probe in sd:
            return prefix
    raise KeyError(
        f"Could not locate a {cfg.family} vision tower in state dict "
        f"(looked for '*{probe}')."
    )
