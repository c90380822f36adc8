"""Decoder logit parity vs the PyTorch reference architecture.

BASELINE.md requirement: "Decoder logits vs PyTorch reference — match to fp
tolerance". We rebuild the reference's exact module (embedding·sqrt(d) +
sin/cos PE + nn.TransformerDecoder(post-LN, batch_first) + fc_out —
reference decoder.py:84-193) in torch, copy its weights into our pytree via
the interchange converter, and compare logits.
"""

import math

import numpy as np
import pytest
import torch
import torch.nn as nn

import jax
import jax.numpy as jnp

from mit_tpu.models.decoder import (
    DecoderConfig,
    decoder_forward,
    init_decoder_params,
    params_from_torch_state_dict,
    torch_state_dict_from_params,
)

V, D, H, L, F, T, B, MAXLEN = 120, 32, 4, 3, 64, 12, 3, 20
PAD = 0


class TorchRefDecoder(nn.Module):
    """Faithful rebuild of reference decoder.py:75-193 (dropout=0)."""

    def __init__(self):
        super().__init__()
        self.token_embedding = nn.Embedding(V, D, padding_idx=PAD)
        layer = nn.TransformerDecoderLayer(
            d_model=D, nhead=H, dim_feedforward=F, dropout=0.0, batch_first=True
        )
        self.transformer_decoder = nn.TransformerDecoder(layer, num_layers=L)
        self.fc_out = nn.Linear(D, V)
        # positional table (reference decoder.py:33-55)
        position = torch.arange(MAXLEN).unsqueeze(1)
        div_term = torch.exp(torch.arange(0, D, 2) * (-math.log(10000.0) / D))
        pe = torch.zeros(MAXLEN, D)
        pe[:, 0::2] = torch.sin(position * div_term)
        pe[:, 1::2] = torch.cos(position * div_term)
        self.register_buffer("pe", pe.unsqueeze(0))
        for p in self.parameters():
            if p.dim() > 1:
                nn.init.xavier_uniform_(p)

    def forward(self, tgt_tokens, memory, memory_padding_mask=None):
        t = tgt_tokens.size(1)
        causal = (torch.triu(torch.ones(t, t)) == 1).transpose(0, 1)
        causal = (
            causal.float()
            .masked_fill(causal == 0, float("-inf"))
            .masked_fill(causal == 1, 0.0)
        )
        pad_mask = tgt_tokens == PAD
        x = self.token_embedding(tgt_tokens) * math.sqrt(D)
        x = x + self.pe[:, :t, :]
        out = self.transformer_decoder(
            tgt=x,
            memory=memory,
            tgt_mask=causal,
            memory_mask=None,
            tgt_key_padding_mask=pad_mask,
            memory_key_padding_mask=memory_padding_mask,
        )
        return self.fc_out(out)


@pytest.fixture(scope="module")
def torch_model():
    torch.manual_seed(7)
    m = TorchRefDecoder().eval()
    return m


@pytest.fixture(scope="module")
def tokens():
    g = torch.Generator().manual_seed(3)
    toks = torch.randint(4, V, (B, T), generator=g)
    toks[:, 0] = 2  # START-ish
    toks[0, 8:] = PAD
    toks[1, 5:] = PAD
    return toks


def _ours_from(m):
    cfg = DecoderConfig(
        vocab_size=V, embed_dim=D, num_heads=H, num_layers=L,
        ff_dim=F, max_seq_len=MAXLEN, dropout=0.0, pad_idx=PAD,
    )
    params = params_from_torch_state_dict(m.state_dict(), cfg)
    return cfg, params


def test_logit_parity_single_key_memory(torch_model, tokens):
    """CLS-only memory (S=1) — the reference training configuration."""
    cfg, params = _ours_from(torch_model)
    g = torch.Generator().manual_seed(11)
    memory = torch.randn(B, 1, D, generator=g)
    with torch.no_grad():
        ref = torch_model(tokens, memory).numpy()
    ours = np.asarray(
        decoder_forward(
            params, cfg, jnp.asarray(tokens.numpy()), jnp.asarray(memory.numpy())
        )
    )
    np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=2e-4)


def test_logit_parity_full_sequence_memory(torch_model, tokens):
    """Full patch-sequence memory (S=7) with a memory padding mask."""
    cfg, params = _ours_from(torch_model)
    g = torch.Generator().manual_seed(13)
    S = 7
    memory = torch.randn(B, S, D, generator=g)
    mem_pad = torch.zeros(B, S, dtype=torch.bool)
    mem_pad[0, 5:] = True
    mem_pad[2, 3:] = True
    with torch.no_grad():
        ref = torch_model(tokens, memory, mem_pad).numpy()
    ours = np.asarray(
        decoder_forward(
            params, cfg,
            jnp.asarray(tokens.numpy()),
            jnp.asarray(memory.numpy()),
            memory_padding_mask=jnp.asarray(mem_pad.numpy()),
        )
    )
    np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=2e-4)


def test_single_key_fast_path_equals_general_path(torch_model, tokens):
    """The algebraic S=1 shortcut must be exact vs the general path."""
    cfg, params = _ours_from(torch_model)
    memory = jnp.asarray(np.random.default_rng(5).normal(size=(B, 1, D)), jnp.float32)
    toks = jnp.asarray(tokens.numpy())
    fast = decoder_forward(params, cfg, toks, memory)
    # Forcing the general path by passing an all-False memory padding mask.
    general = decoder_forward(
        params, cfg, toks, memory,
        memory_padding_mask=jnp.zeros((B, 1), dtype=bool),
    )
    np.testing.assert_allclose(
        np.asarray(fast), np.asarray(general), rtol=1e-5, atol=1e-5
    )


def test_roundtrip_state_dict(torch_model):
    """params -> torch layout -> params is the identity."""
    cfg, params = _ours_from(torch_model)
    sd = torch_state_dict_from_params(params)
    params2 = params_from_torch_state_dict(sd, cfg)
    flat1, _ = jax.tree_util.tree_flatten(params)
    flat2, _ = jax.tree_util.tree_flatten(params2)
    for a, b in zip(flat1, flat2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_init_shapes_and_stats():
    cfg = DecoderConfig(vocab_size=V, embed_dim=D, num_heads=H,
                        num_layers=L, ff_dim=F, max_seq_len=MAXLEN)
    p = init_decoder_params(jax.random.PRNGKey(0), cfg)
    assert p["token_embedding"].shape == (V, D)
    assert p["layers"]["self"]["wq"].shape == (L, D, D)
    assert p["layers"]["ffn"]["w1"].shape == (L, D, F)
    assert p["fc_out_w"].shape == (D, V)
    # xavier bound for the packed (D, 3D) draw
    bound = math.sqrt(6.0 / (D + 3 * D))
    w = np.asarray(p["layers"]["self"]["wq"])
    assert np.abs(w).max() <= bound + 1e-6
    assert np.asarray(p["layers"]["ln1"]["scale"]).min() == 1.0


def test_bf16_compute_close_to_fp32(torch_model, tokens):
    cfg, params = _ours_from(torch_model)
    memory = jnp.asarray(
        np.random.default_rng(9).normal(size=(B, 1, D)), jnp.float32
    )
    toks = jnp.asarray(tokens.numpy())
    full = np.asarray(decoder_forward(params, cfg, toks, memory))
    half = np.asarray(
        decoder_forward(params, cfg, toks, memory, compute_dtype=jnp.bfloat16)
    )
    # bf16 has ~3 decimal digits; logits should still agree coarsely
    assert np.mean(np.abs(full - half)) < 0.15
    assert (np.argmax(full, -1) == np.argmax(half, -1)).mean() > 0.95
