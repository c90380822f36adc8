"""Decode path tests: KV-cache equivalence, greedy/beam semantics, API.

The north-star requirement is "greedy-decode equivalence of cached vs
uncached paths" (SURVEY.md §4): the KV-cached jitted loop must produce
token-for-token the same output as the reference's full-reforward algorithm.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mit_tpu.config import Config
from mit_tpu.decode.beam import beam_generate
from mit_tpu.decode.greedy import greedy_generate, greedy_generate_uncached
from mit_tpu.decode.step import decoder_step, init_cache
from mit_tpu.models.decoder import (
    DecoderConfig,
    decoder_forward,
    init_decoder_params,
)

V, D, H, L, F, MAXLEN = 80, 32, 4, 2, 64, 16
PAD, START, END = 0, 2, 3
CFG = DecoderConfig(
    vocab_size=V, embed_dim=D, num_heads=H, num_layers=L,
    ff_dim=F, max_seq_len=MAXLEN, dropout=0.0, pad_idx=PAD,
)


@pytest.fixture(scope="module")
def params():
    return init_decoder_params(jax.random.PRNGKey(1), CFG)


@pytest.fixture(scope="module")
def memory():
    return jnp.asarray(
        np.random.default_rng(7).normal(size=(3, 1, D)), jnp.float32
    )


def test_step_matches_full_forward(params, memory):
    """Stepwise logits at position t == full-forward logits at position t."""
    toks = np.array([[START, 10, 25, 7], [START, 4, 4, 60], [START, 71, 8, 9]],
                    np.int32)
    full = np.asarray(decoder_forward(params, CFG, jnp.asarray(toks), memory))
    cache = init_cache(params, CFG, memory, max_len=MAXLEN)
    for t in range(toks.shape[1]):
        logits, cache = decoder_step(
            params, CFG, jnp.asarray(toks[:, t]), jnp.asarray(t, jnp.int32), cache
        )
        np.testing.assert_allclose(
            np.asarray(logits), full[:, t], rtol=2e-4, atol=2e-4,
            err_msg=f"position {t}",
        )


def test_step_matches_full_forward_full_memory(params):
    """Same equivalence with multi-token memory + padding mask."""
    mem = jnp.asarray(np.random.default_rng(9).normal(size=(2, 5, D)), jnp.float32)
    mask = jnp.asarray([[False, False, False, True, True],
                        [False, True, True, True, True]])
    toks = np.array([[START, 11, 22], [START, 33, 44]], np.int32)
    full = np.asarray(
        decoder_forward(params, CFG, jnp.asarray(toks), mem,
                        memory_padding_mask=mask)
    )
    cache = init_cache(params, CFG, mem, mask, max_len=MAXLEN)
    for t in range(toks.shape[1]):
        logits, cache = decoder_step(
            params, CFG, jnp.asarray(toks[:, t]), jnp.asarray(t, jnp.int32), cache
        )
        np.testing.assert_allclose(np.asarray(logits), full[:, t],
                                   rtol=2e-4, atol=2e-4)


@pytest.mark.slow
def test_cached_greedy_equals_uncached(params, memory):
    """The flagship equivalence: cached == reference O(T²) algorithm."""
    cached, lengths = greedy_generate(
        params, CFG, memory, START, END, PAD, MAXLEN
    )
    uncached = greedy_generate_uncached(
        params, CFG, memory, START, END, PAD, MAXLEN
    )
    np.testing.assert_array_equal(np.asarray(cached), np.asarray(uncached))
    # lengths consistent with PAD fill
    for i in range(3):
        row = np.asarray(cached[i])
        assert (row[: lengths[i]] != PAD).all()
        assert (row[lengths[i]:] == PAD).all()


@pytest.mark.slow
def test_bucket_ladder_matches_single_bucket(params, memory):
    """The geometric KV-cache ladder (16→32→...) must be token-identical to
    one max_len-sized cache: masked cache positions are exact softmax zeros
    either way, so only HBM traffic changes."""
    single, len_s = greedy_generate(
        params, CFG, memory, START, END, PAD, MAXLEN,
        bucket_sizes=(MAXLEN,),
    )
    ladder, len_l = greedy_generate(
        params, CFG, memory, START, END, PAD, MAXLEN,
        bucket_sizes=(4, 8, MAXLEN),
    )
    np.testing.assert_array_equal(np.asarray(single), np.asarray(ladder))
    np.testing.assert_array_equal(np.asarray(len_s), np.asarray(len_l))


def test_greedy_starts_with_start_token(params, memory):
    tokens, _ = greedy_generate(params, CFG, memory, START, END, PAD, MAXLEN)
    assert (np.asarray(tokens)[:, 0] == START).all()


def test_greedy_early_exit_on_end(params):
    """A decoder rigged to always emit END stops after one step."""
    rigged = jax.tree.map(lambda x: x, params)
    bias = np.zeros((V,), np.float32)
    bias[END] = 100.0
    rigged["fc_out_b"] = jnp.asarray(bias)
    rigged["fc_out_w"] = jnp.zeros_like(rigged["fc_out_w"])
    mem = jnp.asarray(np.random.default_rng(0).normal(size=(2, 1, D)), jnp.float32)
    tokens, lengths = greedy_generate(rigged, CFG, mem, START, END, PAD, MAXLEN)
    assert lengths.tolist() == [2, 2]
    assert np.asarray(tokens)[:, 1].tolist() == [END, END]
    assert (np.asarray(tokens)[:, 2:] == PAD).all()


def test_beam_size_one_equals_greedy(params, memory):
    g, _ = greedy_generate(params, CFG, memory, START, END, PAD, MAXLEN)
    b, _ = beam_generate(params, CFG, memory, START, END, PAD, MAXLEN, beam_size=1)
    np.testing.assert_array_equal(np.asarray(g), np.asarray(b))


@pytest.mark.slow
def test_beam_bucket_ladder_matches_single_bucket(params, memory):
    """Beam search through the KV-cache ladder must be token- and
    score-identical to one max_len-sized cache."""
    t_s, s_s = beam_generate(params, CFG, memory, START, END, PAD, MAXLEN,
                             beam_size=3, bucket_sizes=(MAXLEN,))
    t_l, s_l = beam_generate(params, CFG, memory, START, END, PAD, MAXLEN,
                             beam_size=3, bucket_sizes=(4, 8, MAXLEN))
    np.testing.assert_array_equal(np.asarray(t_s), np.asarray(t_l))
    np.testing.assert_allclose(np.asarray(s_s), np.asarray(s_l), rtol=1e-6)


@pytest.mark.slow
def test_beam_score_at_least_greedy(params, memory):
    """Beam-3's sequence log-prob must be ≥ greedy's (same scoring)."""
    g, _ = greedy_generate(params, CFG, memory, START, END, PAD, MAXLEN)
    _, s1 = beam_generate(params, CFG, memory, START, END, PAD, MAXLEN, 1)
    _, s3 = beam_generate(params, CFG, memory, START, END, PAD, MAXLEN, 3)
    assert (np.asarray(s3) >= np.asarray(s1) - 1e-4).all()


def test_batch_matches_single(params):
    """Batched decode == per-item decode (no cross-batch leakage)."""
    mem = jnp.asarray(np.random.default_rng(3).normal(size=(4, 1, D)), jnp.float32)
    batch, _ = greedy_generate(params, CFG, mem, START, END, PAD, MAXLEN)
    for i in range(4):
        single, _ = greedy_generate(
            params, CFG, mem[i : i + 1], START, END, PAD, MAXLEN
        )
        np.testing.assert_array_equal(np.asarray(batch[i]), np.asarray(single[0]))


# ----------------------------------------------------------------------
@pytest.mark.slow
def test_captioner_end_to_end(tmp_path):
    """PIL image → caption string through the public Captioner API."""
    from PIL import Image

    from mit_tpu.decode.api import Captioner
    from mit_tpu.models.model import ModelConfig, init_model_params
    from mit_tpu.models.vision import VisionConfig
    from mit_tpu.text.bpe import ByteLevelBPE
    from mit_tpu.text.tokenizer import Tokenizer, train_tokenizer

    cfg = Config(DATA_DIR=str(tmp_path) + "/", MAX_SEQ_LEN=MAXLEN)
    tok = train_tokenizer(
        iter(["a dog runs", "a cat sits", "dogs and cats play"]),
        300, cfg.VOCAB_PATH, cfg.MERGES_PATH, cfg,
    )
    vis = VisionConfig(
        family="vit", image_size=32, patch_size=16, hidden_size=40,
        num_layers=1, num_heads=2, intermediate_size=64,
        hidden_act="gelu", layer_norm_eps=1e-12,
        patch_bias=True, ln_pre=False, ln_post=True,
    )
    dec = DecoderConfig(
        vocab_size=tok.get_vocab_size(), embed_dim=D, num_heads=H,
        num_layers=L, ff_dim=F, max_seq_len=MAXLEN, dropout=0.0,
        pad_idx=tok.pad_id,
    )
    mcfg = ModelConfig("tiny-vit", vis, dec, "cls")
    params = init_model_params(jax.random.PRNGKey(0), mcfg)
    cap = Captioner(params, mcfg, tok, cfg)

    img = Image.new("RGB", (64, 48), (200, 30, 40))
    ids = cap.generate(img, max_len=MAXLEN)
    assert ids[0] == tok.start_id
    text_g = cap.caption(img, method="greedy")
    text_b = cap.caption(img, method="beam", beam_size=3)
    assert isinstance(text_g, str) and isinstance(text_b, str)
    assert "<START>" not in text_g and "<END>" not in text_g
    assert "<PAD>" not in text_g

    with pytest.raises(ValueError):
        cap.caption(img, method="nucleus")

    # postprocess handles: END cut, START strip, UNK removal, whitespace
    probe = [tok.start_id, tok.unk_id, tok.end_id, 55, 56]
    assert cap.postprocess(probe) == ""


def test_postprocess_without_end_token(tmp_path):
    from mit_tpu.decode.api import Captioner
    from mit_tpu.models.model import ModelConfig, init_model_params
    from mit_tpu.models.vision import VisionConfig
    from mit_tpu.text.tokenizer import train_tokenizer

    cfg = Config(DATA_DIR=str(tmp_path) + "/", MAX_SEQ_LEN=MAXLEN)
    tok = train_tokenizer(iter(["hello world"]), 300, cfg.VOCAB_PATH,
                          cfg.MERGES_PATH, cfg)
    vis = VisionConfig(family="vit", image_size=32, patch_size=16,
                       hidden_size=40, num_layers=1, num_heads=2,
                       intermediate_size=64, hidden_act="gelu",
                       layer_norm_eps=1e-12, patch_bias=True,
                       ln_pre=False, ln_post=True)
    dec = DecoderConfig(vocab_size=tok.get_vocab_size(), embed_dim=D,
                        num_heads=H, num_layers=L, ff_dim=F,
                        max_seq_len=MAXLEN, dropout=0.0, pad_idx=tok.pad_id)
    mcfg = ModelConfig("t", vis, dec, "cls")
    cap = Captioner(init_model_params(jax.random.PRNGKey(0), mcfg), mcfg, tok, cfg)
    ids = tok.encode("hello world", pad=False)[:-1]  # drop END
    # no END → whole sequence used (reference inference.py:103-108)
    assert cap.postprocess(ids) == "hello world"


def test_captioner_int8_defect_canary(tmp_path):
    """encoder_quant='int8_defect' (the quality gate's negative control)
    must corrupt the encoder output vs plain int8 — and only fc2 scales."""
    from mit_tpu.decode.api import Captioner
    from mit_tpu.models.model import ModelConfig, init_model_params
    from mit_tpu.models.vision import VisionConfig
    from mit_tpu.text.tokenizer import train_tokenizer

    cfg = Config(DATA_DIR=str(tmp_path) + "/", MAX_SEQ_LEN=MAXLEN)
    tok = train_tokenizer(iter(["tiny corpus here"]), 300, cfg.VOCAB_PATH,
                          cfg.MERGES_PATH, cfg)
    vis = VisionConfig(family="vit", image_size=32, patch_size=16,
                       hidden_size=40, num_layers=1, num_heads=2,
                       intermediate_size=64, hidden_act="gelu",
                       layer_norm_eps=1e-12, patch_bias=True,
                       ln_pre=False, ln_post=True)
    dec = DecoderConfig(vocab_size=tok.get_vocab_size(), embed_dim=D,
                        num_heads=H, num_layers=L, ff_dim=F,
                        max_seq_len=MAXLEN, dropout=0.0, pad_idx=tok.pad_id)
    mcfg = ModelConfig("t", vis, dec, "cls")
    params = init_model_params(jax.random.PRNGKey(0), mcfg)
    cap_q = Captioner(params, mcfg, tok, cfg, encoder_quant="int8")
    cap_d = Captioner(params, mcfg, tok, cfg, encoder_quant="int8_defect")

    q8, d8 = cap_q.params["encoder"], cap_d.params["encoder"]
    np.testing.assert_array_equal(np.asarray(q8["layers"]["fc2"].scale) * 2,
                                  np.asarray(d8["layers"]["fc2"].scale))
    np.testing.assert_array_equal(np.asarray(q8["layers"]["fc1"].scale),
                                  np.asarray(d8["layers"]["fc1"].scale))

    px = jnp.asarray(
        np.random.default_rng(0).normal(size=(2, 3, 32, 32)), jnp.float32
    )
    m_q = np.asarray(cap_q.memory_from_pixels(px))
    m_d = np.asarray(cap_d.memory_from_pixels(px))
    # the 2x fc2-scale corruption must visibly move the features
    rel = np.abs(m_d - m_q).max() / (np.abs(m_q).max() + 1e-9)
    assert rel > 0.05, f"defect moved features by only {rel:.2%}"

    with pytest.raises(ValueError, match="encoder_quant"):
        Captioner(params, mcfg, tok, cfg, encoder_quant="int4")


def test_max_len_exceeding_table_raises(params, memory):
    with pytest.raises(ValueError, match="max_len"):
        greedy_generate(params, CFG, memory, START, END, PAD, MAXLEN + 5)


def test_captioner_clamps_max_len(tmp_path):
    """generate(max_len=100) default (reference surface) must not blow past
    a smaller decoder table — it clamps instead."""
    from PIL import Image

    from mit_tpu.decode.api import Captioner
    from mit_tpu.models.model import ModelConfig, init_model_params
    from mit_tpu.models.vision import VisionConfig
    from mit_tpu.text.tokenizer import train_tokenizer

    cfg = Config(DATA_DIR=str(tmp_path) + "/", MAX_SEQ_LEN=MAXLEN)
    tok = train_tokenizer(iter(["tiny corpus here"]), 300,
                          cfg.VOCAB_PATH, cfg.MERGES_PATH, cfg)
    vis = VisionConfig(family="vit", image_size=32, patch_size=16,
                       hidden_size=40, num_layers=1, num_heads=2,
                       intermediate_size=48, hidden_act="gelu",
                       layer_norm_eps=1e-12, patch_bias=True,
                       ln_pre=False, ln_post=True)
    dec = DecoderConfig(vocab_size=tok.get_vocab_size(), embed_dim=D,
                        num_heads=H, num_layers=1, ff_dim=F,
                        max_seq_len=MAXLEN, dropout=0.0, pad_idx=tok.pad_id)
    mcfg = ModelConfig("t", vis, dec, "cls")
    cap = Captioner(init_model_params(jax.random.PRNGKey(0), mcfg), mcfg, tok, cfg)
    ids = cap.generate(Image.new("RGB", (32, 32)), max_len=100)  # ref default
    assert len(ids) <= MAXLEN
