"""Standalone image feature extraction — the reference's ``encoder.py``.

The reference keeps a vestigial module (reference encoder.py:20-124,
imported by nothing — model.py:8 dropped it) that documents the
*full-sequence* feature path: ``encode_image()`` returning the whole
``last_hidden_state`` and ``get_encoder_output_dim()``. This is its
functional equivalent, useful for offline feature dumps (the feature cache
in train/features.py is the batched production variant).
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from mit_tpu.config import CONFIG, Config
from mit_tpu.data.preprocess import HostPreprocessor
from mit_tpu.models.vision import (
    VisionConfig,
    config_for_encoder,
    init_vision_params,
    vision_forward,
)

_cache = {}


def _get(encoder_name: str, params: Optional[dict]):
    key = encoder_name
    if key not in _cache:
        vcfg = config_for_encoder(encoder_name)
        if params is None:
            params = init_vision_params(jax.random.PRNGKey(0), vcfg)
        pre = HostPreprocessor(encoder_name, image_size=vcfg.image_size)
        fwd = jax.jit(
            lambda p, px: vision_forward(p, vcfg, px), static_argnums=()
        )
        _cache[key] = (vcfg, params, pre, fwd)
    return _cache[key]


def get_encoder_output_dim(encoder_name: str = None, cfg: Config = CONFIG) -> int:
    """Hidden size of the configured encoder (reference encoder.py:112-124)."""
    return config_for_encoder(encoder_name or cfg.ENCODER_MODEL_NAME).hidden_size


def encode_image(
    image,
    encoder_name: Optional[str] = None,
    params: Optional[dict] = None,
    cfg: Config = CONFIG,
) -> np.ndarray:
    """PIL image → full patch-sequence features (1, S, H)
    (reference encoder.py:65-110 returns last_hidden_state).

    ``params`` loads pretrained weights (via models.vision converters);
    omitted → random-init tower (shape-correct, for plumbing tests).
    """
    name = encoder_name or cfg.ENCODER_MODEL_NAME
    vcfg, params, pre, fwd = _get(name, params)
    pixels = pre(image)[None]
    return np.asarray(fwd(params, jnp.asarray(pixels)))
