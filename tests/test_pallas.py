"""Pallas kernel tests (interpret mode on CPU; compiled on real TPU).

The same kernels were verified on the real chip: at (B=4,H=8,T=99,hd=64)
bf16 the compiled Mosaic kernel matched the XLA reference with 0.0 max
diff.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mit_tpu.models.decoder import DecoderConfig, decoder_forward, init_decoder_params
from mit_tpu.models.vision import VisionConfig, init_vision_params, vision_forward
from mit_tpu.ops.pallas_attention import _xla_attention, flash_attention


@pytest.mark.parametrize("causal", [True, False])
@pytest.mark.parametrize("t,s", [(13, 13), (99, 99)])
def test_flash_matches_xla(causal, t, s):
    r = np.random.default_rng(0)
    B, H, HD = 2, 4, 32
    q = jnp.asarray(r.normal(size=(B, H, t, HD)), jnp.float32)
    k = jnp.asarray(r.normal(size=(B, H, s, HD)), jnp.float32)
    v = jnp.asarray(r.normal(size=(B, H, s, HD)), jnp.float32)
    pad = jnp.where(jnp.asarray(r.random((B, s)) > 0.8), -1e9, 0.0).astype(
        jnp.float32
    )
    out = flash_attention(q, k, v, pad, causal)
    ref = _xla_attention(q, k, v, pad, causal)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_flash_backward_matches_xla():
    r = np.random.default_rng(1)
    B, H, T, HD = 2, 2, 17, 16
    q = jnp.asarray(r.normal(size=(B, H, T, HD)), jnp.float32)
    k = jnp.asarray(r.normal(size=(B, H, T, HD)), jnp.float32)
    v = jnp.asarray(r.normal(size=(B, H, T, HD)), jnp.float32)
    pad = jnp.zeros((B, T), jnp.float32)

    def loss_flash(q, k, v):
        return jnp.sum(flash_attention(q, k, v, pad, True) ** 2)

    def loss_xla(q, k, v):
        return jnp.sum(_xla_attention(q, k, v, pad, True) ** 2)

    g1 = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("causal", [True, False])
@pytest.mark.parametrize("t,s", [(13, 13), (99, 99), (17, 1)])
def test_flash_btd_matches_xla(causal, t, s):
    """Native-layout (B, T, D) kernel — the round-2 default path."""
    from mit_tpu.ops.pallas_attention import flash_attention_btd

    r = np.random.default_rng(4)
    B, H, HD = 2, 4, 32
    D = H * HD
    q = jnp.asarray(r.normal(size=(B, t, D)), jnp.float32)
    k = jnp.asarray(r.normal(size=(B, s, D)), jnp.float32)
    v = jnp.asarray(r.normal(size=(B, s, D)), jnp.float32)
    pad = jnp.where(jnp.asarray(r.random((B, s)) > 0.8), -1e9, 0.0).astype(
        jnp.float32
    )
    out = flash_attention_btd(q, k, v, pad, causal, HD)
    sh = lambda x: x.reshape(B, -1, H, HD).transpose(0, 2, 1, 3)
    ref = _xla_attention(sh(q), sh(k), sh(v), pad, causal)
    ref = ref.transpose(0, 2, 1, 3).reshape(B, t, D)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("causal", [True, False])
def test_flash_btd_no_pad_variant_matches(causal):
    """has_pad=False (encoder fast path: pad row skipped in-kernel) must
    match has_pad=True with a zero pad row to fp tolerance (not bit-equal:
    `scores*scale + pad` can compile to an FMA whose unrounded intermediate
    differs from the two-step rounding)."""
    from mit_tpu.ops.pallas_attention import flash_attention_btd

    r = np.random.default_rng(6)
    B, H, HD, T = 2, 4, 32, 21
    D = H * HD
    q = jnp.asarray(r.normal(size=(B, T, D)), jnp.float32)
    k = jnp.asarray(r.normal(size=(B, T, D)), jnp.float32)
    v = jnp.asarray(r.normal(size=(B, T, D)), jnp.float32)
    pad0 = jnp.zeros((B, T), jnp.float32)
    with_pad = flash_attention_btd(q, k, v, pad0, causal, HD, True)
    no_pad = flash_attention_btd(q, k, v, pad0, causal, HD, False)
    np.testing.assert_allclose(np.asarray(with_pad), np.asarray(no_pad),
                               rtol=1e-6, atol=1e-6)


@pytest.mark.slow
def test_flash_btd_backward_matches_xla():
    from mit_tpu.ops.pallas_attention import (
        _xla_attention_btd,
        flash_attention_btd,
    )

    r = np.random.default_rng(5)
    B, T, D, HD = 2, 17, 64, 16
    q = jnp.asarray(r.normal(size=(B, T, D)), jnp.float32)
    k = jnp.asarray(r.normal(size=(B, T, D)), jnp.float32)
    v = jnp.asarray(r.normal(size=(B, T, D)), jnp.float32)
    pad = jnp.zeros((B, T), jnp.float32)

    g1 = jax.grad(
        lambda q, k, v: jnp.sum(flash_attention_btd(q, k, v, pad, True, HD) ** 2),
        argnums=(0, 1, 2),
    )(q, k, v)
    g2 = jax.grad(
        lambda q, k, v: jnp.sum(_xla_attention_btd(q, k, v, pad, True, HD) ** 2),
        argnums=(0, 1, 2),
    )(q, k, v)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)


@pytest.mark.slow
def test_decoder_forward_pallas_equals_xla():
    cfg = DecoderConfig(vocab_size=50, embed_dim=32, num_heads=4,
                        num_layers=2, ff_dim=48, max_seq_len=20,
                        dropout=0.0, pad_idx=0)
    params = init_decoder_params(jax.random.PRNGKey(0), cfg)
    r = np.random.default_rng(2)
    toks = jnp.asarray(r.integers(1, 50, (3, 11)), jnp.int32)
    toks = toks.at[0, 7:].set(0)
    mem = jnp.asarray(r.normal(size=(3, 1, 32)), jnp.float32)
    a = decoder_forward(params, cfg, toks, mem, use_pallas=False)
    b = decoder_forward(params, cfg, toks, mem, use_pallas=True)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.slow
def test_vision_forward_pallas_equals_xla():
    cfg = VisionConfig(family="vit", image_size=32, patch_size=16,
                       hidden_size=32, num_layers=2, num_heads=4,
                       intermediate_size=48, hidden_act="gelu",
                       layer_norm_eps=1e-12, patch_bias=True,
                       ln_pre=False, ln_post=True)
    params = init_vision_params(jax.random.PRNGKey(0), cfg)
    pix = jnp.asarray(
        np.random.default_rng(3).normal(size=(2, 3, 32, 32)), jnp.float32
    )
    a = vision_forward(params, cfg, pix, use_pallas=False)
    b = vision_forward(params, cfg, pix, use_pallas=True)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("use_pallas", [False, True])
@pytest.mark.slow
def test_vision_cls_only_equals_full_slice(use_pallas):
    """cls_only last-layer shortcut == full forward's CLS row (both paths)."""
    cfg = VisionConfig(family="vit", image_size=32, patch_size=16,
                       hidden_size=32, num_layers=2, num_heads=4,
                       intermediate_size=48, hidden_act="gelu",
                       layer_norm_eps=1e-12, patch_bias=True,
                       ln_pre=False, ln_post=True)
    params = init_vision_params(jax.random.PRNGKey(7), cfg)
    pix = jnp.asarray(
        np.random.default_rng(8).normal(size=(2, 3, 32, 32)), jnp.float32
    )
    full = vision_forward(params, cfg, pix, use_pallas=use_pallas)
    cls = vision_forward(params, cfg, pix, use_pallas=use_pallas,
                         cls_only=True)
    assert cls.shape == (2, 1, 32)
    np.testing.assert_allclose(np.asarray(cls), np.asarray(full[:, :1]),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.slow
def test_flash_with_dropout_trains():
    """Training with attention dropout runs through the dropout-fused
    kernel (pallas_dropout_attention) and stays finite."""
    cfg = DecoderConfig(vocab_size=50, embed_dim=32, num_heads=4,
                        num_layers=1, ff_dim=48, max_seq_len=20,
                        dropout=0.3, pad_idx=0)
    params = init_decoder_params(jax.random.PRNGKey(0), cfg)
    toks = jnp.asarray([[2, 5, 9, 11]], jnp.int32)
    mem = jnp.ones((1, 1, 32), jnp.float32)
    out = decoder_forward(params, cfg, toks, mem, deterministic=False,
                          rng=jax.random.PRNGKey(1), use_pallas=True)
    assert np.isfinite(np.asarray(out)).all()
