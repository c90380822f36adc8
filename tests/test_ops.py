"""Mask and positional-encoding parity vs the PyTorch reference semantics."""

import numpy as np
import jax.numpy as jnp

from mit_tpu.ops.masks import causal_mask, padding_mask, combine_causal_and_padding, NEG_INF
from mit_tpu.ops.positional import sinusoid_table, add_positional


def test_causal_mask_semantics():
    m = np.asarray(causal_mask(5))
    for i in range(5):
        for j in range(5):
            if j <= i:
                assert m[i, j] == 0.0
            else:
                assert m[i, j] <= NEG_INF


def test_causal_mask_matches_torch():
    import torch

    sz = 7
    ref = (torch.triu(torch.ones(sz, sz)) == 1).transpose(0, 1)
    ref = (
        ref.float()
        .masked_fill(ref == 0, float("-inf"))
        .masked_fill(ref == 1, float(0.0))
    ).numpy()
    ours = np.asarray(causal_mask(sz))
    # same 0/blocked pattern (we use a finite large-negative, torch uses -inf)
    assert ((ref == 0.0) == (ours == 0.0)).all()


def test_padding_mask():
    seq = jnp.array([[5, 6, 0, 0], [1, 0, 0, 0]])
    m = np.asarray(padding_mask(seq, pad_idx=0))
    assert m.tolist() == [[False, False, True, True], [False, True, True, True]]


def test_combined_mask_shape_and_values():
    seq = jnp.array([[5, 6, 0, 0]])
    m = np.asarray(combine_causal_and_padding(4, seq, 0))
    assert m.shape == (1, 1, 4, 4)
    # position 3 (a pad query) can still see non-pad keys 0,1
    assert m[0, 0, 3, 0] == 0.0 and m[0, 0, 3, 1] == 0.0
    # key 2 is pad: blocked for every query
    assert (m[0, 0, :, 2] <= NEG_INF).all()
    # future blocked
    assert m[0, 0, 0, 1] <= NEG_INF


def test_sinusoid_matches_torch_reference():
    """Bitwise-level parity with reference decoder.py:33-47 formula."""
    import math
    import torch

    d_model, max_len = 64, 50
    position = torch.arange(max_len).unsqueeze(1)
    div_term = torch.exp(
        torch.arange(0, d_model, 2) * (-math.log(10000.0) / d_model)
    )
    pe = torch.zeros(max_len, d_model)
    pe[:, 0::2] = torch.sin(position * div_term)
    pe[:, 1::2] = torch.cos(position * div_term)
    ours = np.asarray(sinusoid_table(max_len, d_model))
    # torch computes the table in fp32; ours is fp64 → fp32, so allow fp32 eps
    np.testing.assert_allclose(ours, pe.numpy(), rtol=1e-5, atol=1e-5)


def test_add_positional_broadcast():
    table = sinusoid_table(10, 8)
    x = jnp.zeros((2, 4, 8))
    y = add_positional(x, table)
    np.testing.assert_allclose(np.asarray(y[0]), np.asarray(table[:4]), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(y[0]), np.asarray(y[1]))
