"""Combined-model assembly tests (reference model.py:14-169 capabilities)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mit_tpu.config import Config
from mit_tpu.models.decoder import DecoderConfig
from mit_tpu.models.model import (
    ModelConfig,
    encode_images,
    forward_from_features,
    init_model_params,
    merge_params,
    model_forward,
    split_trainable,
)
from mit_tpu.models.vision import VisionConfig

TINY_VISION = VisionConfig(
    family="vit", image_size=32, patch_size=16, hidden_size=48,
    num_layers=2, num_heads=2, intermediate_size=64,
    hidden_act="gelu", layer_norm_eps=1e-12,
    patch_bias=True, ln_pre=False, ln_post=True,
)
TINY_DECODER = DecoderConfig(
    vocab_size=100, embed_dim=32, num_heads=2, num_layers=2,
    ff_dim=64, max_seq_len=20, dropout=0.0, pad_idx=0,
)


@pytest.fixture(scope="module")
def tiny():
    mcfg = ModelConfig(
        encoder_name="tiny-vit", vision=TINY_VISION, decoder=TINY_DECODER,
        memory_mode="cls",
    )
    params = init_model_params(jax.random.PRNGKey(0), mcfg)
    return mcfg, params


def test_build_from_config():
    cfg = Config()
    mcfg = ModelConfig.build(cfg, vocab_size=9876)
    # ViT-B/16 768 -> 512 projection auto-inserted (reference model.py:97-99)
    assert mcfg.needs_projection
    assert mcfg.decoder.vocab_size == 9876        # tokenizer size wins
    assert mcfg.vision.hidden_size == 768
    assert mcfg.decoder.embed_dim == 512


@pytest.mark.slow
def test_forward_shapes_cls(tiny):
    mcfg, params = tiny
    pix = jnp.asarray(np.random.default_rng(0).normal(size=(2, 3, 32, 32)), jnp.float32)
    toks = jnp.asarray(np.random.default_rng(1).integers(1, 100, (2, 10)), jnp.int32)
    logits = model_forward(params, mcfg, pix, toks)
    assert logits.shape == (2, 10, 100)
    feats = encode_images(params, mcfg, pix)
    assert feats.shape == (2, 1, 48)  # CLS-only memory, pre-projection dim


def test_forward_full_memory(tiny):
    mcfg, params = tiny
    mcfg_full = mcfg._replace(memory_mode="full")
    pix = jnp.asarray(np.random.default_rng(0).normal(size=(2, 3, 32, 32)), jnp.float32)
    toks = jnp.asarray(np.random.default_rng(1).integers(1, 100, (2, 10)), jnp.int32)
    feats = encode_images(params, mcfg_full, pix)
    assert feats.shape == (2, 5, 48)  # 4 patches + CLS
    logits = model_forward(params, mcfg_full, pix, toks)
    assert logits.shape == (2, 10, 100)


def test_cached_features_equal_end_to_end(tiny):
    """forward(features) == forward(pixels) — the caching contract."""
    mcfg, params = tiny
    pix = jnp.asarray(np.random.default_rng(2).normal(size=(2, 3, 32, 32)), jnp.float32)
    toks = jnp.asarray(np.random.default_rng(3).integers(1, 100, (2, 10)), jnp.int32)
    direct = model_forward(params, mcfg, pix, toks)
    feats = encode_images(params, mcfg, pix)
    via_cache = forward_from_features(params, mcfg, feats, toks)
    np.testing.assert_allclose(np.asarray(direct), np.asarray(via_cache), rtol=1e-6)


@pytest.mark.slow
def test_frozen_split_and_no_encoder_grads(tiny):
    mcfg, params = tiny
    trainable, frozen = split_trainable(params)
    assert "encoder" in frozen and "encoder" not in trainable
    assert "decoder" in trainable and "projection" in trainable
    assert merge_params(trainable, frozen).keys() == params.keys()

    pix = jnp.asarray(np.random.default_rng(4).normal(size=(2, 3, 32, 32)), jnp.float32)
    toks = jnp.asarray(np.random.default_rng(5).integers(1, 100, (2, 10)), jnp.int32)

    def loss(tr):
        p = merge_params(tr, frozen)
        return jnp.mean(model_forward(p, mcfg, pix, toks) ** 2)

    g = jax.grad(loss)(trainable)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    assert any(float(jnp.abs(l).max()) > 0 for l in leaves)


@pytest.mark.slow
def test_no_projection_when_dims_match():
    vis = TINY_VISION._replace(hidden_size=32)
    mcfg = ModelConfig("x", vis, TINY_DECODER, "cls")
    assert not mcfg.needs_projection
    params = init_model_params(jax.random.PRNGKey(0), mcfg)
    assert "projection" not in params
    pix = jnp.asarray(np.random.default_rng(6).normal(size=(1, 3, 32, 32)), jnp.float32)
    toks = jnp.asarray([[2, 5, 7]], jnp.int32)
    assert model_forward(params, mcfg, pix, toks).shape == (1, 3, 100)
