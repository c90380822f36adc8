"""In-kernel dropout attention: oracle equivalence + backward exactness."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mit_tpu.ops.pallas_dropout_attention import (
    dump_dropout_mask,
    flash_attention_dropout,
)

B, H, T, HD, RATE = 2, 3, 12, 16, 0.25


@pytest.fixture(scope="module")
def qkv():
    r = np.random.default_rng(0)
    q = jnp.asarray(r.normal(size=(B, H, T, HD)), jnp.float32)
    k = jnp.asarray(r.normal(size=(B, H, T, HD)), jnp.float32)
    v = jnp.asarray(r.normal(size=(B, H, T, HD)), jnp.float32)
    pad = jnp.zeros((B, T), jnp.float32)
    return q, k, v, pad


def _xla_with_mask(q, k, v, pad, mask, causal, rate):
    """XLA attention applying the dumped keep-mask — the oracle."""
    import math

    hd = q.shape[-1]
    t, s = q.shape[2], k.shape[2]
    scores = jnp.einsum("bhtd,bhsd->bhts", q, k) / math.sqrt(hd)
    if causal:
        i = jnp.arange(t)[:, None]
        j = jnp.arange(s)[None, :]
        scores = scores + jnp.where(j <= i, 0.0, -1e9)[None, None]
    scores = scores + pad[:, None, None, :]
    p = jax.nn.softmax(scores, axis=-1)
    pd = jnp.where(mask, p / (1.0 - rate), 0.0)
    return jnp.einsum("bhts,bhsd->bhtd", pd, v)


def test_mask_statistics_and_determinism():
    m1 = np.asarray(dump_dropout_mask(B, H, T, T, seed=7, rate=RATE))
    m2 = np.asarray(dump_dropout_mask(B, H, T, T, seed=7, rate=RATE))
    m3 = np.asarray(dump_dropout_mask(B, H, T, T, seed=8, rate=RATE))
    np.testing.assert_array_equal(m1, m2)        # deterministic per seed
    assert (m1 != m3).any()                      # differs across seeds
    # per-cell streams differ
    assert (m1[0, 0] != m1[0, 1]).any()
    keep_rate = m1.mean()
    assert abs(keep_rate - (1 - RATE)) < 0.08


def test_forward_matches_oracle(qkv):
    q, k, v, pad = qkv
    seed = 11
    mask = dump_dropout_mask(B, H, T, T, seed=seed, rate=RATE)
    ours = flash_attention_dropout(q, k, v, pad, jnp.int32(seed), True, RATE)
    oracle = _xla_with_mask(q, k, v, pad, mask, True, RATE)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(oracle),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.slow
def test_backward_matches_oracle_grads(qkv):
    q, k, v, pad = qkv
    seed = 13
    mask = dump_dropout_mask(B, H, T, T, seed=seed, rate=RATE)

    def loss_ours(q, k, v):
        return jnp.sum(
            flash_attention_dropout(q, k, v, pad, jnp.int32(seed), True, RATE)
            ** 2
        )

    def loss_oracle(q, k, v):
        return jnp.sum(_xla_with_mask(q, k, v, pad, mask, True, RATE) ** 2)

    g1 = jax.grad(loss_ours, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss_oracle, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4)


def test_rate_zero_equals_plain_flash(qkv):
    from mit_tpu.ops.pallas_attention import flash_attention

    q, k, v, pad = qkv
    a = flash_attention_dropout(q, k, v, pad, jnp.int32(3), True, 0.0)
    b = flash_attention(q, k, v, pad, True)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=1e-6, atol=1e-6)


def test_padding_respected(qkv):
    q, k, v, _ = qkv
    pad = jnp.where(
        jnp.asarray(np.random.default_rng(4).random((B, T)) > 0.7), -1e9, 0.0
    ).astype(jnp.float32)
    seed = 21
    mask = dump_dropout_mask(B, H, T, T, seed=seed, rate=RATE)
    ours = flash_attention_dropout(q, k, v, pad, jnp.int32(seed), True, RATE)
    oracle = _xla_with_mask(q, k, v, pad, mask, True, RATE)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(oracle),
                               rtol=1e-5, atol=1e-5)
