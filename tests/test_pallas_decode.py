"""Equivalence of the fused Pallas decode-layer kernel vs the XLA step.

Interpret mode (CPU): the kernel must reproduce decoder_step's logits and
cache updates (f32, tolerance for reduction-order differences) and the
full greedy loop's tokens exactly, including generated-PAD key masking
and the cache bucket ladder.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from mit_tpu.models.decoder import DecoderConfig
from mit_tpu.models.model import ModelConfig, init_model_params
from mit_tpu.models.vision import VisionConfig
from mit_tpu.decode.step import decoder_step, init_cache, prepare_decode_params
from mit_tpu.decode.greedy import greedy_generate, greedy_generate_uncached

CFG = DecoderConfig(
    vocab_size=120, embed_dim=64, num_heads=4, num_layers=3,
    ff_dim=96, max_seq_len=24, dropout=0.0, pad_idx=0,
)


def _mcfg():
    return ModelConfig(
        "tiny/vit",
        VisionConfig(
            family="vit", image_size=32, patch_size=16, hidden_size=48,
            num_layers=1, num_heads=4, intermediate_size=64,
            hidden_act="gelu", layer_norm_eps=1e-12,
            patch_bias=True, ln_pre=False, ln_post=True,
        ),
        CFG, "cls",
    )


@pytest.fixture(scope="module")
def setup():
    params = init_model_params(jax.random.PRNGKey(3), _mcfg())["decoder"]
    rng = np.random.default_rng(3)
    memory = jnp.asarray(rng.normal(size=(4, 1, CFG.embed_dim)) * 0.5,
                         jnp.float32)
    return params, memory


def _step_both(params, memory, key_pad=None, pos_val=2):
    """Run one decoder_step with the fused kernel off and on."""
    cache = init_cache(params, CFG, memory, max_len=8,
                       compute_dtype=jnp.float32)
    prepared = prepare_decode_params(params, jnp.float32)
    b = memory.shape[0]
    tokens = jnp.asarray(np.arange(b) % 7 + 4, jnp.int32)
    pos = jnp.asarray(pos_val, jnp.int32)
    # pre-fill a couple of cache positions so attention reads real rows
    for p in range(pos_val):
        seed = jnp.asarray(np.arange(b) % 5 + 4, jnp.int32)
        _, cache = decoder_step(prepared, CFG, seed, jnp.asarray(p, jnp.int32),
                                cache, jnp.float32, key_pad=key_pad)
    ref_logits, ref_cache = decoder_step(
        prepared, CFG, tokens, pos, cache, jnp.float32, key_pad=key_pad
    )
    import os
    os.environ["MIT_FUSED_DECODE"] = "1"
    try:
        got_logits, got_cache = decoder_step(
            prepared, CFG, tokens, pos, cache, jnp.float32, key_pad=key_pad
        )
    finally:
        os.environ.pop("MIT_FUSED_DECODE", None)
    return (ref_logits, ref_cache), (got_logits, got_cache)


def test_step_logits_and_cache_match(setup):
    params, memory = setup
    (rl, rc), (gl, gc) = _step_both(params, memory)
    np.testing.assert_allclose(np.asarray(gl), np.asarray(rl),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gc.k), np.asarray(rc.k),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(gc.v), np.asarray(rc.v),
                               rtol=1e-5, atol=1e-6)
    assert np.array_equal(np.argmax(np.asarray(gl), -1),
                          np.argmax(np.asarray(rl), -1))


def test_step_respects_key_pad(setup):
    """A generated-PAD key must stay masked — reference rebuilds the pad
    mask from the prefix every step (reference decoder.py:162)."""
    params, memory = setup
    b = memory.shape[0]
    key_pad = np.zeros((b, 8), bool)
    key_pad[0, 1] = True          # row 0's position-1 token was PAD
    key_pad[2, 0] = True
    key_pad = jnp.asarray(key_pad)
    (rl, _), (gl, _) = _step_both(params, memory, key_pad=key_pad)
    np.testing.assert_allclose(np.asarray(gl), np.asarray(rl),
                               rtol=1e-5, atol=1e-5)


def test_greedy_tokens_identical(setup):
    """Full generation (bucket ladder included) token-matches the XLA path
    and the uncached O(T^2) oracle."""
    params, memory = setup
    ref, _ = greedy_generate(params, CFG, memory, 2, 3, 0, CFG.max_seq_len,
                             compute_dtype=jnp.float32)
    oracle = greedy_generate_uncached(params, CFG, memory, 2, 3, 0,
                                      CFG.max_seq_len)
    import os
    os.environ["MIT_FUSED_DECODE"] = "1"
    jax.clear_caches()            # greedy_generate is jitted; force retrace
    try:
        got, _ = greedy_generate(params, CFG, memory, 2, 3, 0,
                                 CFG.max_seq_len, compute_dtype=jnp.float32)
    finally:
        os.environ.pop("MIT_FUSED_DECODE", None)
        jax.clear_caches()
    assert np.array_equal(np.asarray(got), np.asarray(ref))
    assert np.array_equal(np.asarray(got), np.asarray(oracle))


def test_beam_tokens_identical(setup):
    """Beam search (k=3, cache reindex every step) under the fused kernel."""
    import os
    from mit_tpu.decode.beam import beam_generate

    params, memory = setup
    ref, rs = beam_generate(params, CFG, memory, 2, 3, 0, CFG.max_seq_len,
                            beam_size=3, compute_dtype=jnp.float32)
    os.environ["MIT_FUSED_DECODE"] = "1"
    jax.clear_caches()
    try:
        got, gs = beam_generate(params, CFG, memory, 2, 3, 0,
                                CFG.max_seq_len, beam_size=3,
                                compute_dtype=jnp.float32)
    finally:
        os.environ.pop("MIT_FUSED_DECODE", None)
        jax.clear_caches()
    assert np.array_equal(np.asarray(got), np.asarray(ref))
    np.testing.assert_allclose(np.asarray(gs), np.asarray(rs),
                               rtol=1e-5, atol=1e-5)


def test_service_tokens_identical(setup):
    """The continuous-batching service (per-slot ragged positions) produces
    the same captions with the fused kernel on."""
    import os
    from mit_tpu.config import Config
    from mit_tpu.decode.api import Captioner
    from mit_tpu.decode.service import CaptionService

    params_dec, memory = setup
    full = {"decoder": params_dec}

    class TinyTok:
        pad_id, start_id, end_id, unk_id = 0, 2, 3, 1

        def decode(self, ids, skip_special_tokens=False):
            return " ".join(map(str, ids))

    cap = Captioner.__new__(Captioner)
    cap.params = full
    cap.mcfg = _mcfg()
    cap.cfg = Config()
    cap.tokenizer = TinyTok()
    mems = np.asarray(memory)

    def run():
        svc = CaptionService(cap, num_slots=2, compute_dtype=jnp.float32)
        rids = [svc.submit_memory(mems[i]) for i in range(4)]
        done = {}
        for _ in range(300):
            svc.step()
            for rid in rids:
                r = svc.result(rid)
                if r is not None and rid not in done:
                    done[rid] = list(np.asarray(r).ravel())
            if len(done) == len(rids):
                break
        return [done[r] for r in rids]

    ref = run()
    os.environ["MIT_FUSED_DECODE"] = "1"
    jax.clear_caches()
    try:
        got = run()
    finally:
        os.environ.pop("MIT_FUSED_DECODE", None)
        jax.clear_caches()
    assert got == ref


def test_service_sharded_fused(setup):
    """Fused kernel under GSPMD: the mesh-sharded service (slots split over
    the data axis via custom_partitioning) matches the unsharded service."""
    import os
    from mit_tpu.config import Config
    from mit_tpu.decode.api import Captioner
    from mit_tpu.decode.service import CaptionService
    from mit_tpu.parallel.mesh import create_mesh

    params_dec, memory = setup
    full = {"decoder": params_dec}

    class TinyTok:
        pad_id, start_id, end_id, unk_id = 0, 2, 3, 1

        def decode(self, ids, skip_special_tokens=False):
            return " ".join(map(str, ids))

    cap = Captioner.__new__(Captioner)
    cap.params = full
    cap.mcfg = _mcfg()
    cap.cfg = Config()
    cap.tokenizer = TinyTok()
    mems = np.asarray(memory)

    def run(mesh):
        svc = CaptionService(cap, num_slots=8, compute_dtype=jnp.float32,
                             mesh=mesh)
        rids = [svc.submit_memory(mems[i % mems.shape[0]]) for i in range(10)]
        done = {}
        for _ in range(400):
            svc.step()
            for rid in rids:
                r = svc.result(rid)
                if r is not None and rid not in done:
                    done[rid] = list(np.asarray(r).ravel())
            if len(done) == len(rids):
                break
        return [done[r] for r in rids]

    os.environ["MIT_FUSED_DECODE"] = "1"
    jax.clear_caches()
    try:
        ref = run(None)
        got = run(create_mesh((8, 1)))
    finally:
        os.environ.pop("MIT_FUSED_DECODE", None)
        jax.clear_caches()
    assert got == ref


def test_bf16_logits_close(setup):
    """bf16 compute: the kernel keeps the residual stream in f32 where the
    XLA path rounds to bf16 per sublayer — logits agree to bf16-scale
    tolerance."""
    params, memory = setup
    cache = init_cache(params, CFG, memory.astype(jnp.bfloat16), max_len=8,
                       compute_dtype=jnp.bfloat16)
    prepared = prepare_decode_params(params, jnp.bfloat16)
    b = memory.shape[0]
    tokens = jnp.asarray(np.arange(b) % 7 + 4, jnp.int32)
    pos = jnp.asarray(0, jnp.int32)
    rl, _ = decoder_step(prepared, CFG, tokens, pos, cache, jnp.bfloat16)
    import os
    os.environ["MIT_FUSED_DECODE"] = "1"
    try:
        gl, _ = decoder_step(prepared, CFG, tokens, pos, cache, jnp.bfloat16)
    finally:
        os.environ.pop("MIT_FUSED_DECODE", None)
    np.testing.assert_allclose(np.asarray(gl), np.asarray(rl),
                               rtol=0.05, atol=0.05)
