"""Beam-search optimality vs brute force.

With beam width ≥ the whole candidate frontier, beam search IS exhaustive —
its result must equal the global argmax sequence found by enumerating every
possible token sequence and scoring it with the full decoder forward.
"""

import itertools

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # heavy end-to-end module (see pyproject)

import jax
import jax.numpy as jnp

from mit_tpu.decode.beam import beam_generate
from mit_tpu.models.decoder import (
    DecoderConfig,
    decoder_forward,
    init_decoder_params,
)

V, D, H, L, MAXLEN = 6, 16, 2, 1, 4
PAD, START, END = 0, 1, 2
CFG = DecoderConfig(vocab_size=V, embed_dim=D, num_heads=H, num_layers=L,
                    ff_dim=24, max_seq_len=MAXLEN, dropout=0.0, pad_idx=PAD)


def _brute_force_best(params, memory):
    """Enumerate every sequence beam search could return:
    END-terminated sequences of any length, plus unfinished sequences of
    exactly max_len-1 tokens. END never appears mid-sequence (decoding
    freezes there); any other token — PAD included — may.

    All candidates of one length are scored in a single batched
    teacher-forced forward (causal masking keeps per-row independence).
    """
    best, best_score = None, -np.inf
    for length in range(1, MAXLEN):
        cands = []
        for cand in itertools.product(range(V), repeat=length):
            if any(c == END for c in cand[:-1]):
                continue
            if cand[-1] != END and length < MAXLEN - 1:
                continue  # a short unfinished sequence keeps decoding
            cands.append(cand)
        if not cands:
            continue
        toks = np.full((len(cands), length + 1), PAD, np.int32)
        toks[:, 0] = START
        toks[:, 1:] = np.asarray(cands, np.int32)
        mem = jnp.broadcast_to(jnp.asarray(memory), (len(cands), 1, D))
        logits = decoder_forward(params, CFG, jnp.asarray(toks), mem)
        logp = np.asarray(jax.nn.log_softmax(logits, axis=-1))
        rows = np.arange(len(cands))[:, None]
        cols = np.arange(length)[None, :]
        scores = logp[rows, cols, np.asarray(cands)].sum(axis=1)
        i = int(np.argmax(scores))
        if scores[i] > best_score:
            best_score, best = float(scores[i]), cands[i]
    return best, best_score


def _beam_sequence(tokens_row):
    """Beam output row → the generated sequence (after START, cut at END)."""
    seq = [int(t) for t in tokens_row[1:]]
    if END in seq:
        seq = seq[: seq.index(END) + 1]
    return tuple(seq)


@pytest.mark.parametrize("seed", [0, 3])
def test_wide_beam_finds_global_optimum(seed):
    params = init_decoder_params(jax.random.PRNGKey(seed), CFG)
    memory = jnp.asarray(
        np.random.default_rng(seed).normal(size=(1, 1, D)), jnp.float32
    )
    # the alive frontier never exceeds V^2 = 36 partial sequences for
    # MAXLEN=4, so beam 40 is exhaustive search
    tokens, score = beam_generate(
        params, CFG, memory, START, END, PAD, MAXLEN, beam_size=40
    )
    beam_seq = _beam_sequence(np.asarray(tokens)[0])
    best, best_score = _brute_force_best(params, memory)
    assert abs(float(score[0]) - best_score) < 1e-3, (
        f"beam score {float(score[0])} vs brute-force {best_score} "
        f"(beam {beam_seq}, best {best})"
    )
    assert beam_seq == best
