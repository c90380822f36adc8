"""Training-trajectory parity vs PyTorch.

The loss-curve anchor in BASELINE.md (≈3.0→2.54 over 10 Flickr30k epochs)
can't run here (no dataset download), so this is the equivalent controlled
experiment: our decoder and the torch reference decoder start from IDENTICAL
weights, consume IDENTICAL batches, and train with AdamW + grad clip for
several steps — per-step losses and final weights must track within fp
drift. This exercises forward, backward, clipping and the optimizer update
against torch end-to-end.
"""

import math

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # heavy end-to-end module (see pyproject)
import torch
import torch.nn as nn

import jax
import jax.numpy as jnp

from mit_tpu.config import Config
from mit_tpu.models.decoder import (
    DecoderConfig,
    decoder_forward,
    params_from_torch_state_dict,
)
from mit_tpu.train.steps import (
    init_train_state,
    make_optimizer,
    masked_cross_entropy,
)

V, D, H, L, F, T, B, MAXLEN = 60, 32, 4, 2, 48, 10, 8, 16
PAD = 0
LR, WD, CLIP = 3e-3, 1e-5, 1.0
STEPS = 8


class TorchDec(nn.Module):
    def __init__(self):
        super().__init__()
        self.token_embedding = nn.Embedding(V, D, padding_idx=PAD)
        layer = nn.TransformerDecoderLayer(
            d_model=D, nhead=H, dim_feedforward=F, dropout=0.0,
            batch_first=True,
        )
        self.transformer_decoder = nn.TransformerDecoder(layer, L)
        self.fc_out = nn.Linear(D, V)
        position = torch.arange(MAXLEN).unsqueeze(1)
        div = torch.exp(torch.arange(0, D, 2) * (-math.log(10000.0) / D))
        pe = torch.zeros(MAXLEN, D)
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
        x = self.token_embedding(tgt) * math.sqrt(D)
        x = x + self.pe[:, :t, :]
        out = self.transformer_decoder(
            tgt=x, memory=memory, tgt_mask=causal,
            tgt_key_padding_mask=tgt == PAD,
        )
        return self.fc_out(out)


def test_training_trajectory_matches_torch():
    torch.manual_seed(0)
    tm = TorchDec().train()
    cfg = DecoderConfig(vocab_size=V, embed_dim=D, num_heads=H, num_layers=L,
                        ff_dim=F, max_seq_len=MAXLEN, dropout=0.0, pad_idx=PAD)
    params = params_from_torch_state_dict(tm.state_dict(), cfg)

    ccfg = Config(LEARNING_RATE=LR, WEIGHT_DECAY=WD, GRAD_CLIP_VALUE=CLIP,
                  ADAM_BETA1=0.9, ADAM_BETA2=0.98, ADAM_EPS=1e-9)
    optimizer, _ = make_optimizer(ccfg)
    opt_state = optimizer.init(params)

    topt = torch.optim.AdamW(tm.parameters(), lr=LR, betas=(0.9, 0.98),
                             eps=1e-9, weight_decay=WD)
    tcrit = nn.CrossEntropyLoss(ignore_index=PAD)

    rng = np.random.default_rng(1)
    batches = []
    for _ in range(STEPS):
        toks = rng.integers(3, V, (B, T + 1)).astype(np.int64)
        toks[:, 0] = 2
        toks[0, 6:] = PAD
        mem = rng.normal(size=(B, 1, D)).astype(np.float32)
        batches.append((toks, mem))

    @jax.jit
    def step(params, opt_state, inp, tgt, mem):
        def loss_fn(p):
            logits = decoder_forward(p, cfg, inp, mem)
            return masked_cross_entropy(logits, tgt, PAD)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        # reproduce padding_idx: pad row never updates
        grads["token_embedding"] = grads["token_embedding"].at[PAD].set(0.0)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        import optax

        return optax.apply_updates(params, updates), opt_state, loss

    our_losses, ref_losses = [], []
    for toks, mem in batches:
        inp = jnp.asarray(toks[:, :-1].astype(np.int32))
        tgt = jnp.asarray(toks[:, 1:].astype(np.int32))
        params, opt_state, loss = step(params, opt_state, inp, tgt,
                                       jnp.asarray(mem))
        our_losses.append(float(loss))

        topt.zero_grad()
        logits = tm(torch.from_numpy(toks[:, :-1]), torch.from_numpy(mem))
        tl = tcrit(logits.reshape(-1, V), torch.from_numpy(toks[:, 1:]).reshape(-1))
        tl.backward()
        torch.nn.utils.clip_grad_norm_(tm.parameters(), CLIP)
        topt.step()
        ref_losses.append(float(tl))

    # per-step losses track torch through fwd+bwd+clip+AdamW for all steps
    # (loss *descent* is asserted elsewhere on a repeated batch —
    # tests/test_train.py::test_train_step_reduces_loss; batches here are
    # fresh random data each step, so the raw values needn't decrease)
    np.testing.assert_allclose(our_losses, ref_losses, rtol=2e-3, atol=2e-3)

    # final weights still aligned after 8 optimizer steps
    final_ref = tm.state_dict()["fc_out.weight"].detach().numpy().T
    np.testing.assert_allclose(
        np.asarray(params["fc_out_w"]), final_ref, rtol=5e-3, atol=5e-3
    )
