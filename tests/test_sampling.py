"""Sampling decode tests: filtering math, determinism, degenerate cases."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mit_tpu.decode.greedy import greedy_generate
from mit_tpu.decode.sampling import filter_logits, sample_generate
from mit_tpu.models.decoder import DecoderConfig, init_decoder_params

V, D, H, L, F, MAXLEN = 80, 32, 4, 2, 64, 16
PAD, START, END = 0, 2, 3
CFG = DecoderConfig(vocab_size=V, embed_dim=D, num_heads=H, num_layers=L,
                    ff_dim=F, max_seq_len=MAXLEN, dropout=0.0, pad_idx=PAD)


@pytest.fixture(scope="module")
def params():
    return init_decoder_params(jax.random.PRNGKey(1), CFG)


@pytest.fixture(scope="module")
def memory():
    return jnp.asarray(
        np.random.default_rng(7).normal(size=(3, 1, D)), jnp.float32
    )


def test_filter_top_k():
    logits = jnp.asarray([[1.0, 5.0, 3.0, 2.0, 4.0]])
    out = np.asarray(filter_logits(logits, top_k=2))
    kept = out > -1e20
    assert kept.tolist() == [[False, True, False, False, True]]


def test_filter_top_p():
    # probs ~ [0.643, 0.236, 0.087, 0.032] for logits [3,2,1,0]
    logits = jnp.asarray([[3.0, 2.0, 1.0, 0.0]])
    out = np.asarray(filter_logits(logits, top_p=0.8))
    kept = out > -1e20
    # cumulative-before: [0, .643, .879, .966] → keep first two
    assert kept.tolist() == [[True, True, False, False]]
    # p=1 keeps everything
    assert (np.asarray(filter_logits(logits, top_p=1.0)) > -1e20).all()
    # tiny p keeps at least the argmax
    kept1 = np.asarray(filter_logits(logits, top_p=1e-6)) > -1e20
    assert kept1.sum() == 1 and kept1[0, 0]


def test_temperature_zero_equals_greedy(params, memory):
    g, _ = greedy_generate(params, CFG, memory, START, END, PAD, MAXLEN)
    s, _ = sample_generate(params, CFG, memory, jax.random.PRNGKey(0),
                           START, END, PAD, MAXLEN, temperature=0.0)
    np.testing.assert_array_equal(np.asarray(g), np.asarray(s))


@pytest.mark.slow
def test_sampling_deterministic_per_key_and_varies_across_keys(params, memory):
    a1, _ = sample_generate(params, CFG, memory, jax.random.PRNGKey(5),
                            START, END, PAD, MAXLEN, temperature=1.0)
    a2, _ = sample_generate(params, CFG, memory, jax.random.PRNGKey(5),
                            START, END, PAD, MAXLEN, temperature=1.0)
    b, _ = sample_generate(params, CFG, memory, jax.random.PRNGKey(6),
                           START, END, PAD, MAXLEN, temperature=1.0)
    np.testing.assert_array_equal(np.asarray(a1), np.asarray(a2))
    assert not np.array_equal(np.asarray(a1), np.asarray(b))


@pytest.mark.slow
def test_sampling_bucket_ladder_matches_single_bucket(params, memory):
    """The KV-cache ladder must be token-identical for the same rng key:
    each executed step consumes exactly one rng split either way."""
    single, _ = sample_generate(params, CFG, memory, jax.random.PRNGKey(11),
                                START, END, PAD, MAXLEN, temperature=1.0,
                                bucket_sizes=(MAXLEN,))
    ladder, _ = sample_generate(params, CFG, memory, jax.random.PRNGKey(11),
                                START, END, PAD, MAXLEN, temperature=1.0,
                                bucket_sizes=(4, 8, MAXLEN))
    np.testing.assert_array_equal(np.asarray(single), np.asarray(ladder))


def test_sampling_respects_top_k_one(params, memory):
    """top_k=1 forces argmax regardless of temperature."""
    g, _ = greedy_generate(params, CFG, memory, START, END, PAD, MAXLEN)
    s, _ = sample_generate(params, CFG, memory, jax.random.PRNGKey(9),
                           START, END, PAD, MAXLEN, temperature=2.0, top_k=1)
    np.testing.assert_array_equal(np.asarray(g), np.asarray(s))


def test_captioner_sample_method(tmp_path):
    from mit_tpu.config import Config
    from mit_tpu.decode.api import Captioner
    from mit_tpu.models.model import ModelConfig, init_model_params
    from mit_tpu.models.vision import VisionConfig
    from mit_tpu.text.tokenizer import train_tokenizer
    from PIL import Image

    cfg = Config(DATA_DIR=str(tmp_path) + "/", MAX_SEQ_LEN=MAXLEN)
    tok = train_tokenizer(iter(["a dog", "a cat", "dogs and cats"]), 300,
                          cfg.VOCAB_PATH, cfg.MERGES_PATH, cfg)
    vis = VisionConfig(family="vit", image_size=32, patch_size=16,
                       hidden_size=40, num_layers=1, num_heads=2,
                       intermediate_size=48, hidden_act="gelu",
                       layer_norm_eps=1e-12, patch_bias=True,
                       ln_pre=False, ln_post=True)
    dec = DecoderConfig(vocab_size=tok.get_vocab_size(), embed_dim=D,
                        num_heads=H, num_layers=L, ff_dim=F,
                        max_seq_len=MAXLEN, dropout=0.0, pad_idx=tok.pad_id)
    mcfg = ModelConfig("t", vis, dec, "cls")
    cap = Captioner(init_model_params(jax.random.PRNGKey(0), mcfg), mcfg, tok, cfg)
    img = Image.new("RGB", (48, 48), (120, 40, 80))
    ids = cap.generate(img, max_len=MAXLEN, method="sample",
                       temperature=0.8, top_k=10, rng=jax.random.PRNGKey(3))
    assert ids[0] == tok.start_id


def test_loader_sharding(tmp_path):
    """Multi-host sharding: disjoint cover of the index set."""
    from mit_tpu.data.dataset import Loader

    class FakeDS:
        class tokenizer:
            pad_id = 0

        def __getitem__(self, i):
            raise NotImplementedError

    idx = np.arange(20)
    shards = [
        Loader(FakeDS(), idx, 4, shuffle=False, shard_index=i, shard_count=4)
        for i in range(4)
    ]
    seen = np.concatenate([s.indices for s in shards])
    assert sorted(seen.tolist()) == idx.tolist()
    assert all(len(s.indices) == 5 for s in shards)
