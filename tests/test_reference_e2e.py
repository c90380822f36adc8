"""End-to-end parity vs the reference's full ImageToTextModel.

Builds the reference architecture in torch (HF ViT vision tower + linear
projection + post-LN TransformerDecoder — reference model.py:12-169) with
random weights, exports a state dict in the reference's exact checkpoint
naming, loads it through our interchange converters, and asserts:

1. teacher-forced logits match to fp tolerance (BASELINE.md),
2. greedy decode produces token-for-token identical captions
   (reference model.py:219-242 algorithm vs our KV-cached loop).

This is the full checkpoint-interchange contract: a user can take a
reference-trained .safetensors and serve it here unchanged.
"""

import math

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # heavy end-to-end module (see pyproject)
import torch
import torch.nn as nn

import jax
import jax.numpy as jnp

from mit_tpu.decode.greedy import greedy_generate
from mit_tpu.models.decoder import DecoderConfig
from mit_tpu.models.model import ModelConfig, model_forward, project_features, encode_images
from mit_tpu.models.vision import VisionConfig
from mit_tpu.train.checkpoint import (
    params_from_reference_state_dict,
    reference_state_dict_from_params,
)

D_ENC, D_DEC, HEADS, LAYERS, FF, MAXLEN, IMG, PATCH = 48, 32, 4, 2, 64, 14, 32, 16
V, PAD, START, END = 90, 0, 2, 3


class TorchImageToText(nn.Module):
    """The reference's combined model (model.py:12-169), faithfully rebuilt."""

    def __init__(self):
        super().__init__()
        from transformers import ViTConfig, ViTModel

        self.encoder = ViTModel(
            ViTConfig(
                hidden_size=D_ENC, num_hidden_layers=2, num_attention_heads=2,
                intermediate_size=96, image_size=IMG, patch_size=PATCH,
            ),
            add_pooling_layer=False,
        )
        self.projection = nn.Linear(D_ENC, D_DEC)

        class Dec(nn.Module):
            def __init__(self):
                super().__init__()
                self.token_embedding = nn.Embedding(V, D_DEC, padding_idx=PAD)
                layer = nn.TransformerDecoderLayer(
                    d_model=D_DEC, nhead=HEADS, dim_feedforward=FF,
                    dropout=0.0, batch_first=True,
                )
                self.transformer_decoder = nn.TransformerDecoder(layer, LAYERS)
                self.fc_out = nn.Linear(D_DEC, V)
                position = torch.arange(MAXLEN).unsqueeze(1)
                div = torch.exp(
                    torch.arange(0, D_DEC, 2) * (-math.log(10000.0) / D_DEC)
                )
                pe = torch.zeros(MAXLEN, D_DEC)
                pe[:, 0::2] = torch.sin(position * div)
                pe[:, 1::2] = torch.cos(position * div)
                self.register_buffer("pe", pe.unsqueeze(0))
                for p in self.parameters():
                    if p.dim() > 1:
                        nn.init.xavier_uniform_(p)

            def forward(self, tgt, memory):
                t = tgt.size(1)
                causal = (torch.triu(torch.ones(t, t)) == 1).transpose(0, 1)
                causal = (
                    causal.float()
                    .masked_fill(causal == 0, float("-inf"))
                    .masked_fill(causal == 1, 0.0)
                )
                x = self.token_embedding(tgt) * math.sqrt(D_DEC)
                x = x + self.pe[:, :t, :]
                out = self.transformer_decoder(
                    tgt=x, memory=memory, tgt_mask=causal,
                    tgt_key_padding_mask=tgt == PAD,
                )
                return self.fc_out(out)

        self.decoder = Dec()

    def forward(self, pixels, tgt_tokens):
        with torch.no_grad():
            feats = self.encoder(pixel_values=pixels).last_hidden_state[:, 0, :]
        memory = self.projection(feats).unsqueeze(1)
        return self.decoder(tgt_tokens, memory)

    def generate_greedy(self, pixels, max_len):
        """Reference model.py:219-242 algorithm, batch 1."""
        with torch.no_grad():
            feats = self.encoder(pixel_values=pixels).last_hidden_state[:, 0, :]
            memory = self.projection(feats).unsqueeze(1)
            ids = torch.tensor([[START]], dtype=torch.long)
            for _ in range(max_len - 1):
                logits = self.decoder(ids, memory)
                nxt = torch.argmax(logits[:, -1, :], dim=-1).unsqueeze(0)
                ids = torch.cat([ids, nxt], dim=1)
                if nxt.item() == END:
                    break
            return ids[0].tolist()


@pytest.fixture(scope="module")
def pair():
    torch.manual_seed(42)
    tm = TorchImageToText().eval()
    mcfg = ModelConfig(
        encoder_name="test/vit-tiny",
        vision=VisionConfig(
            family="vit", image_size=IMG, patch_size=PATCH, hidden_size=D_ENC,
            num_layers=2, num_heads=2, intermediate_size=96,
            hidden_act="gelu", layer_norm_eps=1e-12,
            patch_bias=True, ln_pre=False, ln_post=True,
        ),
        decoder=DecoderConfig(
            vocab_size=V, embed_dim=D_DEC, num_heads=HEADS, num_layers=LAYERS,
            ff_dim=FF, max_seq_len=MAXLEN, dropout=0.0, pad_idx=PAD,
        ),
        memory_mode="cls",
    )
    sd = tm.state_dict()
    params = params_from_reference_state_dict(sd, mcfg)
    return tm, mcfg, params


def test_e2e_teacher_forced_logits(pair):
    tm, mcfg, params = pair
    g = torch.Generator().manual_seed(0)
    pixels = torch.randn(3, 3, IMG, IMG, generator=g)
    toks = torch.randint(4, V, (3, 9), generator=g)
    toks[:, 0] = START
    toks[1, 6:] = PAD
    with torch.no_grad():
        ref = tm(pixels, toks).numpy()
    ours = np.asarray(
        model_forward(
            params, mcfg, jnp.asarray(pixels.numpy()), jnp.asarray(toks.numpy())
        )
    )
    np.testing.assert_allclose(ours, ref, rtol=3e-4, atol=3e-4)


def test_e2e_greedy_decode_identical(pair):
    tm, mcfg, params = pair
    for seed in range(3):
        g = torch.Generator().manual_seed(seed)
        pixels = torch.randn(1, 3, IMG, IMG, generator=g)
        ref_ids = tm.generate_greedy(pixels, MAXLEN)
        feats = encode_images(params, mcfg, jnp.asarray(pixels.numpy()))
        memory = project_features(params, mcfg, feats)
        tokens, lengths = greedy_generate(
            params["decoder"], mcfg.decoder, memory, START, END, PAD, MAXLEN
        )
        ours = np.asarray(tokens)[0, : int(lengths[0])].tolist()
        assert ours == ref_ids, f"seed {seed}"


def test_e2e_export_reimport_roundtrip(pair, tmp_path):
    """Our export → reference naming → reload is lossless, and torch can
    consume the exported dict (load_state_dict strict)."""
    tm, mcfg, params = pair
    sd = reference_state_dict_from_params(params, mcfg)
    missing, unexpected = tm.load_state_dict(
        {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in sd.items()},
        strict=False,
    )
    # buffers (positional table) are the only acceptable leftovers
    assert not unexpected
    assert all("pe" in m or "position_ids" in m for m in missing), missing
    params2 = params_from_reference_state_dict(sd, mcfg)
    for (p1, a), (p2, b) in zip(
        jax.tree_util.tree_leaves_with_path(params),
        jax.tree_util.tree_leaves_with_path(params2),
    ):
        assert jax.tree_util.keystr(p1) == jax.tree_util.keystr(p2)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
