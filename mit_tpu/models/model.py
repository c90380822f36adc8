"""Combined image→text model: frozen vision encoder + trainable decoder.

Equivalent of the reference's ``ImageToTextModel`` (reference model.py:12-169):
name-substring encoder dispatch, automatic hidden-dim discovery, automatic
projection insertion when encoder dim ≠ decoder dim, CLS-token memory.

TPU-first re-design:
- pure functions over a params pytree split into ``encoder`` (frozen) /
  ``projection`` + ``decoder`` (trainable), so the train step optimizes only
  the trainable subtree and the encoder can be dropped entirely when
  training from cached features (the encoder output of a frozen model is
  constant per image — reference recomputes it every step, model.py:133-136);
- ``jax.lax.stop_gradient`` replaces ``torch.no_grad`` (model.py:133);
- memory modes: "cls" (length-1 memory, reference model.py:141-152) and
  "full" (whole patch sequence, the path reference encoder.py:107 documents
  but the reference model never wires up).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from mit_tpu.config import Config
from mit_tpu.models.decoder import DecoderConfig, decoder_forward, init_decoder_params
from mit_tpu.models.vision import (
    VisionConfig,
    config_for_encoder,
    init_vision_params,
    vision_forward,
)


class ModelConfig(NamedTuple):
    encoder_name: str
    vision: VisionConfig
    decoder: DecoderConfig
    memory_mode: str = "cls"            # "cls" | "full"

    @classmethod
    def build(cls, cfg: Config, vocab_size: Optional[int] = None) -> "ModelConfig":
        """Assemble from the user config (mirrors reference train.py:303-314:
        the *actual* tokenizer vocab size overrides config.VOCAB_SIZE)."""
        vision = config_for_encoder(cfg.ENCODER_MODEL_NAME)
        decoder = DecoderConfig(
            vocab_size=vocab_size if vocab_size is not None else cfg.VOCAB_SIZE,
            embed_dim=cfg.DECODER_EMBED_DIM,
            num_heads=cfg.DECODER_HEADS,
            num_layers=cfg.DECODER_LAYERS,
            ff_dim=cfg.DECODER_FF_DIM,
            max_seq_len=cfg.MAX_SEQ_LEN,
            dropout=cfg.DECODER_DROPOUT,
            pad_idx=cfg.PAD_TOKEN_ID,
        )
        return cls(
            encoder_name=cfg.ENCODER_MODEL_NAME,
            vision=vision,
            decoder=decoder,
            memory_mode=cfg.MEMORY_MODE,
        )

    @property
    def needs_projection(self) -> bool:
        # Reference model.py:97-102: Linear iff dims differ, else Identity.
        return self.vision.hidden_size != self.decoder.embed_dim


def init_model_params(key: jax.Array, mcfg: ModelConfig) -> dict:
    k_enc, k_proj, k_dec = jax.random.split(key, 3)
    params = {
        "encoder": init_vision_params(k_enc, mcfg.vision),
        "decoder": init_decoder_params(k_dec, mcfg.decoder),
    }
    if mcfg.needs_projection:
        d_in, d_out = mcfg.vision.hidden_size, mcfg.decoder.embed_dim
        import math

        lim = math.sqrt(6.0 / (d_in + d_out))
        params["projection"] = {
            "w": jax.random.uniform(k_proj, (d_in, d_out), minval=-lim, maxval=lim),
            "b": jnp.zeros((d_out,)),
        }
    return params


def init_model_params_pretrained(
    key: jax.Array,
    cfg: Config,
    vocab_size: Optional[int] = None,
    name_or_path: Optional[str] = None,
    local_files_only: bool = False,
):
    """(mcfg, params) with REAL pretrained frozen-encoder weights.

    The reference always boots its encoder from pretrained HF weights
    (reference model.py:50); this is that path: the vision tower is loaded
    through :mod:`mit_tpu.models.pretrained`, its actual geometry replaces
    the preset, and the trainable decoder/projection initialize randomly.
    """
    from mit_tpu.models.pretrained import load_pretrained_encoder

    name = name_or_path or cfg.ENCODER_MODEL_NAME
    vcfg, encoder = load_pretrained_encoder(
        name, local_files_only=local_files_only
    )
    mcfg = ModelConfig.build(cfg, vocab_size)._replace(vision=vcfg)
    params = init_model_params(key, mcfg)
    params["encoder"] = encoder
    return mcfg, params


def split_trainable(params: dict):
    """(trainable, frozen) partition: encoder is frozen (reference
    model.py:85-89 sets requires_grad=False on every encoder param)."""
    frozen = {"encoder": params["encoder"]}
    trainable = {k: v for k, v in params.items() if k != "encoder"}
    return trainable, frozen


def merge_params(trainable: dict, frozen: dict) -> dict:
    return {**trainable, **frozen}


# ----------------------------------------------------------------------
def encode_images(
    params: dict,
    mcfg: ModelConfig,
    pixel_values: jnp.ndarray,          # (B, 3, H, W)
    compute_dtype=jnp.float32,
) -> jnp.ndarray:
    """Frozen-encoder features *before* projection (cacheable).

    Returns (B, 1, H_enc) in "cls" mode (reference model.py:141 takes
    last_hidden_state[:, 0, :]) or (B, N+1, H_enc) in "full" mode.
    Projection is trainable and therefore applied downstream, so cached
    features stay valid across training.

    A quantized encoder subtree (from
    :func:`mit_tpu.models.vision.quantize_vision_params`) routes through
    the int8 GEMM path automatically — opt in by quantizing once at load.
    """
    cls_only = mcfg.memory_mode == "cls"
    enc = params["encoder"]
    if "patch" in enc:                  # int8 tree (quantize_vision_params)
        from mit_tpu.models.vision import vision_forward_int8

        hidden = vision_forward_int8(
            enc, mcfg.vision, pixel_values, compute_dtype, cls_only=cls_only
        )
    else:
        hidden = vision_forward(
            enc, mcfg.vision, pixel_values, compute_dtype, cls_only=cls_only
        )
    return jax.lax.stop_gradient(hidden)


def project_features(
    params: dict, mcfg: ModelConfig, features: jnp.ndarray, compute_dtype=jnp.float32
) -> jnp.ndarray:
    """features (B, S, H_enc) → decoder memory (B, S, D)."""
    if mcfg.needs_projection:
        p = params["projection"]
        return features.astype(compute_dtype) @ p["w"].astype(compute_dtype) + p[
            "b"
        ].astype(compute_dtype)
    return features.astype(compute_dtype)


def forward_from_features(
    params: dict,
    mcfg: ModelConfig,
    features: jnp.ndarray,              # (B, S, H_enc) cached encoder output
    tgt_tokens: jnp.ndarray,            # (B, T)
    deterministic: bool = True,
    rng: Optional[jax.Array] = None,
    compute_dtype=jnp.float32,
    remat: bool = False,
) -> jnp.ndarray:
    memory = project_features(params, mcfg, features, compute_dtype)
    return decoder_forward(
        params["decoder"],
        mcfg.decoder,
        tgt_tokens,
        memory,
        memory_padding_mask=None,       # image memory has no padding
        deterministic=deterministic,
        rng=rng,
        compute_dtype=compute_dtype,
        remat=remat,
    )


def model_forward(
    params: dict,
    mcfg: ModelConfig,
    pixel_values: jnp.ndarray,
    tgt_tokens: jnp.ndarray,
    deterministic: bool = True,
    rng: Optional[jax.Array] = None,
    compute_dtype=jnp.float32,
    remat: bool = False,
) -> jnp.ndarray:
    """Teacher-forced forward → logits (B, T, V). Reference model.py:116-169."""
    features = encode_images(params, mcfg, pixel_values, compute_dtype)
    return forward_from_features(
        params, mcfg, features, tgt_tokens, deterministic, rng, compute_dtype,
        remat,
    )
