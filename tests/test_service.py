"""Continuous-batching service tests.

Key property: the service (continuous batching, fewer slots than requests,
per-slot positions) produces EXACTLY the tokens the plain batched greedy
decoder produces for every request.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mit_tpu.config import Config
from mit_tpu.decode.api import Captioner
from mit_tpu.decode.greedy import greedy_generate
from mit_tpu.decode.service import CaptionService
from mit_tpu.models.decoder import DecoderConfig
from mit_tpu.models.model import ModelConfig, init_model_params
from mit_tpu.models.vision import VisionConfig
from mit_tpu.text.tokenizer import train_tokenizer

pytestmark = pytest.mark.slow  # heavy end-to-end module (see pyproject)

MAXLEN = 14


@pytest.fixture(scope="module")
def captioner(tmp_path_factory):
    d = tmp_path_factory.mktemp("svc")
    cfg = Config(DATA_DIR=str(d) + "/", MAX_SEQ_LEN=MAXLEN)
    tok = train_tokenizer(
        iter(["a dog runs fast", "cats sleep all day", "birds fly south"]),
        300, cfg.VOCAB_PATH, cfg.MERGES_PATH, cfg,
    )
    vis = VisionConfig(
        family="vit", image_size=32, patch_size=16, hidden_size=40,
        num_layers=1, num_heads=2, intermediate_size=48,
        hidden_act="gelu", layer_norm_eps=1e-12,
        patch_bias=True, ln_pre=False, ln_post=True,
    )
    dec = DecoderConfig(
        vocab_size=tok.get_vocab_size(), embed_dim=32, num_heads=4,
        num_layers=2, ff_dim=48, max_seq_len=MAXLEN, dropout=0.0,
        pad_idx=tok.pad_id,
    )
    mcfg = ModelConfig("tiny-vit", vis, dec, "cls")
    params = init_model_params(jax.random.PRNGKey(0), mcfg)
    return Captioner(params, mcfg, tok, cfg)


def _memories(captioner, n, seed=0):
    d = captioner.mcfg.decoder.embed_dim
    return np.random.default_rng(seed).normal(size=(n, 1, d)).astype(np.float32)


def test_service_matches_batch_greedy(captioner):
    tok = captioner.tokenizer
    mems = _memories(captioner, 10)
    ref_tokens, ref_lengths = greedy_generate(
        captioner.params["decoder"], captioner.mcfg.decoder,
        jnp.asarray(mems), tok.start_id, tok.end_id, tok.pad_id, MAXLEN,
    )
    ref_tokens = np.asarray(ref_tokens)
    ref_lengths = np.asarray(ref_lengths)

    svc = CaptionService(captioner, num_slots=3)  # fewer slots than requests
    rids = [svc.submit_memory(mems[i]) for i in range(10)]
    results = svc.run_to_completion()
    assert set(results) == set(rids)
    for i, rid in enumerate(rids):
        expect = ref_tokens[i, : ref_lengths[i]].tolist()
        assert results[rid] == expect, f"request {i}"


def test_service_interleaved_submission(captioner):
    """Admitting requests mid-flight must not disturb running slots."""
    tok = captioner.tokenizer
    mems = _memories(captioner, 6, seed=3)
    ref_tokens, ref_lengths = greedy_generate(
        captioner.params["decoder"], captioner.mcfg.decoder,
        jnp.asarray(mems), tok.start_id, tok.end_id, tok.pad_id, MAXLEN,
    )
    ref_tokens = np.asarray(ref_tokens)
    ref_lengths = np.asarray(ref_lengths)

    svc = CaptionService(captioner, num_slots=2)
    rids = [svc.submit_memory(mems[i]) for i in range(2)]
    for _ in range(3):
        svc.step()
    rids += [svc.submit_memory(mems[i]) for i in range(2, 6)]
    results = svc.run_to_completion()
    for i, rid in enumerate(rids):
        expect = ref_tokens[i, : ref_lengths[i]].tolist()
        assert results[rid] == expect, f"request {i}"


def test_service_slot_reuse_and_occupancy(captioner):
    svc = CaptionService(captioner, num_slots=2)
    mems = _memories(captioner, 5, seed=7)
    for i in range(5):
        svc.submit_memory(mems[i])
    results = svc.run_to_completion()
    assert len(results) == 5
    # continuous batching: total steps strictly below serial sum of lengths
    serial_steps = sum(len(v) - 1 for v in results.values())
    assert svc.steps_run < serial_steps


def test_service_end_to_end_with_images(captioner):
    from PIL import Image

    svc = CaptionService(captioner, num_slots=2)
    imgs = [Image.new("RGB", (40, 40), (40 * i, 20, 90)) for i in range(3)]
    caps = svc.caption_stream(imgs)
    assert len(caps) == 3
    direct = captioner.caption_batch(imgs, max_len=MAXLEN)
    assert caps == direct


def test_service_sharded_mesh_matches_unsharded(captioner):
    """Slot-sharded service on the 8-device mesh == single-device service
    (config 5: continuous-batched serving on a slice)."""
    from mit_tpu.parallel.mesh import create_mesh

    mems = _memories(captioner, 12, seed=3)
    ref = CaptionService(captioner, num_slots=8)
    rids_ref = [ref.submit_memory(mems[i]) for i in range(12)]
    expect = ref.run_to_completion()

    mesh = create_mesh((8, 1))
    svc = CaptionService(captioner, num_slots=8, mesh=mesh)
    rids = [svc.submit_memory(mems[i]) for i in range(12)]
    got = svc.run_to_completion()
    for a, b in zip(rids_ref, rids):
        assert expect[a] == got[b]
    # caches really live sharded across the mesh
    assert not svc.k_cache[0].sharding.is_fully_replicated


def test_service_mesh_slot_divisibility_enforced(captioner):
    from mit_tpu.parallel.mesh import create_mesh

    mesh = create_mesh((8, 1))
    with pytest.raises(ValueError, match="divisible"):
        CaptionService(captioner, num_slots=6, mesh=mesh)


@pytest.mark.parametrize("window", [2, 4, 7])
def test_service_multi_step_window_token_identical(captioner, window):
    """steps_per_sync>1 (device-side micro-step windows) == step-by-step."""
    mems = _memories(captioner, 9, seed=5)
    ref = CaptionService(captioner, num_slots=4)
    rids_ref = [ref.submit_memory(mems[i]) for i in range(9)]
    expect = ref.run_to_completion()

    svc = CaptionService(captioner, num_slots=4, steps_per_sync=window)
    rids = [svc.submit_memory(mems[i]) for i in range(9)]
    got = svc.run_to_completion()
    for a, b in zip(rids_ref, rids):
        assert expect[a] == got[b]


# ---------------------------------------------------------------- beam


def _batch_beam(captioner, mems, beam_size):
    from mit_tpu.decode.beam import beam_generate

    tok = captioner.tokenizer
    tokens, _ = beam_generate(
        captioner.params["decoder"], captioner.mcfg.decoder,
        jnp.asarray(mems), tok.start_id, tok.end_id, tok.pad_id, MAXLEN,
        beam_size=beam_size,
    )
    tokens = np.asarray(tokens)
    lengths = (tokens != tok.pad_id).sum(axis=1)
    return [tokens[i, : lengths[i]].tolist() for i in range(tokens.shape[0])]


def test_service_beam_matches_batch_beam(captioner):
    """VERDICT item 4 'Done' gate: continuous-batching beam (fewer slots
    than requests, slot reuse) == batch beam_generate, token for token."""
    mems = _memories(captioner, 10, seed=11)
    expect = _batch_beam(captioner, mems, beam_size=3)

    svc = CaptionService(captioner, num_slots=3, method="beam", beam_size=3)
    rids = [svc.submit_memory(mems[i]) for i in range(10)]
    results = svc.run_to_completion()
    for i, rid in enumerate(rids):
        assert results[rid] == expect[i], f"request {i}"


def test_service_beam_interleaved_submission(captioner):
    """Beam slots admitted mid-flight must not disturb running slots."""
    mems = _memories(captioner, 6, seed=13)
    expect = _batch_beam(captioner, mems, beam_size=2)

    svc = CaptionService(captioner, num_slots=2, method="beam", beam_size=2)
    rids = [svc.submit_memory(mems[i]) for i in range(2)]
    for _ in range(3):
        svc.step()
    rids += [svc.submit_memory(mems[i]) for i in range(2, 6)]
    results = svc.run_to_completion()
    for i, rid in enumerate(rids):
        assert results[rid] == expect[i], f"request {i}"


@pytest.mark.parametrize("window", [3])
def test_service_beam_multi_step_window(captioner, window):
    """Beam windows (steps_per_sync>1) are token-identical to step-by-step."""
    mems = _memories(captioner, 7, seed=17)
    ref = CaptionService(captioner, num_slots=3, method="beam", beam_size=3)
    rids_ref = [ref.submit_memory(mems[i]) for i in range(7)]
    expect = ref.run_to_completion()

    svc = CaptionService(captioner, num_slots=3, method="beam", beam_size=3,
                         steps_per_sync=window)
    rids = [svc.submit_memory(mems[i]) for i in range(7)]
    got = svc.run_to_completion()
    for a, b in zip(rids_ref, rids):
        assert expect[a] == got[b]


def test_service_beam_gather_skip_token_identical(captioner):
    """The pay-per-use cache reorder (gather_skip, the production default)
    must be a pure optimization: captions identical to the unconditional
    gather, with both variants traceable in one process (jit-static knob)."""
    mems = _memories(captioner, 8, seed=23)
    base = CaptionService(captioner, num_slots=3, method="beam", beam_size=3,
                          beam_gather_skip=False)
    rids_b = [base.submit_memory(mems[i]) for i in range(8)]
    expect = base.run_to_completion()

    svc = CaptionService(captioner, num_slots=3, method="beam", beam_size=3,
                         beam_gather_skip=True)
    rids = [svc.submit_memory(mems[i]) for i in range(8)]
    got = svc.run_to_completion()
    for a, b in zip(rids_b, rids):
        assert expect[a] == got[b]


def test_service_beam_size_one_reduces_to_greedy(captioner):
    mems = _memories(captioner, 5, seed=19)
    greedy = CaptionService(captioner, num_slots=2)
    rids_g = [greedy.submit_memory(mems[i]) for i in range(5)]
    expect = greedy.run_to_completion()

    svc = CaptionService(captioner, num_slots=2, method="beam", beam_size=1)
    rids = [svc.submit_memory(mems[i]) for i in range(5)]
    got = svc.run_to_completion()
    for a, b in zip(rids_g, rids):
        assert expect[a] == got[b]


def test_service_beam_sharded_mesh_matches_unsharded(captioner):
    """Beam rows (S·K) shard across the mesh data axis without changing
    tokens — the beam gather never crosses a slot's row block."""
    from mit_tpu.parallel.mesh import create_mesh

    mems = _memories(captioner, 10, seed=23)
    ref = CaptionService(captioner, num_slots=8, method="beam", beam_size=2)
    rids_ref = [ref.submit_memory(mems[i]) for i in range(10)]
    expect = ref.run_to_completion()

    mesh = create_mesh((8, 1))
    svc = CaptionService(captioner, num_slots=8, method="beam", beam_size=2,
                         mesh=mesh)
    rids = [svc.submit_memory(mems[i]) for i in range(10)]
    got = svc.run_to_completion()
    for a, b in zip(rids_ref, rids):
        assert expect[a] == got[b]
    assert not svc.k_cache[0].sharding.is_fully_replicated


# ---------------------------------------------------------------- sampling


def test_service_sample_temperature_zero_is_greedy(captioner):
    mems = _memories(captioner, 6, seed=29)
    greedy = CaptionService(captioner, num_slots=3)
    rids_g = [greedy.submit_memory(mems[i]) for i in range(6)]
    expect = greedy.run_to_completion()

    svc = CaptionService(captioner, num_slots=3, method="sample",
                         temperature=0.0)
    rids = [svc.submit_memory(mems[i]) for i in range(6)]
    got = svc.run_to_completion()
    for a, b in zip(rids_g, rids):
        assert expect[a] == got[b]


def test_service_sample_deterministic_per_rng(captioner):
    import jax as _jax

    mems = _memories(captioner, 6, seed=31)

    def run(seed):
        svc = CaptionService(captioner, num_slots=3, method="sample",
                             temperature=1.0, top_k=5,
                             rng=_jax.random.PRNGKey(seed))
        rids = [svc.submit_memory(mems[i]) for i in range(6)]
        res = svc.run_to_completion()
        return [res[r] for r in rids]

    a, b, c = run(0), run(0), run(1)
    assert a == b                       # same rng + submission order
    assert a != c                       # different rng draws differ
    tok = captioner.tokenizer
    for seq in a:
        assert seq[0] == tok.start_id
        assert len(seq) <= MAXLEN
        # every sampled id is a real vocab id
        assert all(0 <= t < tok.get_vocab_size() for t in seq)


# ------------------------------------------------------------ submit_batch

def test_submit_batch_matches_chunked_encode_plus_batch_greedy(captioner):
    """``submit_batch`` bookkeeping gate: chunking at ``encode_batch_size``,
    power-of-two padding of the partial chunk by repetition, discard of the
    pad rows, request-id <-> image-order correspondence, and the pipelined
    dispatch-then-materialize loop must all be invisible — tokens equal the
    plain batch greedy decoder run on the SAME chunked encodes (same float
    batches, so the comparison is exact rather than argmax-fragile)."""
    from PIL import Image

    tok = captioner.tokenizer
    rng = np.random.default_rng(7)
    images = [
        Image.fromarray(rng.integers(0, 255, (32, 32, 3), dtype=np.uint8))
        for _ in range(7)
    ]

    # Reference memories with submit_batch's own chunking: one full chunk of
    # 4, then a partial chunk of 3 padded (by repeating the last image) to
    # the next power of two, pad row dropped.
    m_full = np.asarray(captioner.memory_from_images(images[:4]))
    m_part = np.asarray(
        captioner.memory_from_images(images[4:] + [images[6]])
    )[:3]
    mems = np.concatenate([m_full, m_part], axis=0)
    ref_tokens, ref_lengths = greedy_generate(
        captioner.params["decoder"], captioner.mcfg.decoder,
        jnp.asarray(mems), tok.start_id, tok.end_id, tok.pad_id, MAXLEN,
    )
    ref_tokens = np.asarray(ref_tokens)
    ref_lengths = np.asarray(ref_lengths)

    svc = CaptionService(captioner, num_slots=3)
    rids = svc.submit_batch(images, encode_batch_size=4)
    assert len(rids) == 7                        # pad rows never enqueue
    results = svc.run_to_completion()
    assert set(results) == set(rids)
    for i, rid in enumerate(rids):               # rids follow image order
        assert results[rid] == ref_tokens[i, : ref_lengths[i]].tolist()


# ------------------------------------------------------- KV-cache bucketing

def test_service_bucketed_cache_matches_batch_greedy(captioner):
    """cache_len < max_len allocates small KV buckets; captions that END
    in-bucket decode there, the rest migrate to the full-length batch path.
    Either way tokens must equal the plain full-length batch decode."""
    tok = captioner.tokenizer
    mems = _memories(captioner, 12, seed=41)
    ref_tokens, ref_lengths = greedy_generate(
        captioner.params["decoder"], captioner.mcfg.decoder,
        jnp.asarray(mems), tok.start_id, tok.end_id, tok.pad_id, MAXLEN,
    )
    ref_tokens = np.asarray(ref_tokens)
    ref_lengths = np.asarray(ref_lengths)

    svc = CaptionService(captioner, num_slots=4, cache_len=8)
    assert svc.k_cache[0].shape[1] == 8          # bucket actually small
    rids = [svc.submit_memory(mems[i]) for i in range(12)]
    results = svc.run_to_completion()
    assert set(results) == set(rids)
    for i, rid in enumerate(rids):
        expect = ref_tokens[i, : ref_lengths[i]].tolist()
        assert results[rid] == expect, f"request {i}"
    # the random-init decoder rarely ENDs before 8 tokens, so the overflow
    # migration path must actually have run in this test
    assert svc.overflowed > 0


def test_service_bucketed_beam_matches_batch_beam(captioner):
    """Bucketed beam: a capped slot with live beams re-runs full-length
    batch beam search (a longer hypothesis could still win)."""
    mems = _memories(captioner, 8, seed=43)
    expect = _batch_beam(captioner, mems, beam_size=2)

    svc = CaptionService(captioner, num_slots=3, method="beam", beam_size=2,
                         cache_len=8)
    rids = [svc.submit_memory(mems[i]) for i in range(8)]
    results = svc.run_to_completion()
    for i, rid in enumerate(rids):
        assert results[rid] == expect[i], f"request {i}"
    assert svc.overflowed > 0


def test_service_bucketed_sample_yields_valid_captions(captioner):
    """Sampling with a bucket: overflow re-draws from a fresh rng stream
    (documented), so only structural validity is pinned."""
    tok = captioner.tokenizer
    mems = _memories(captioner, 6, seed=47)
    svc = CaptionService(captioner, num_slots=3, method="sample",
                         temperature=1.0, top_k=5, cache_len=8,
                         rng=jax.random.PRNGKey(0))
    rids = [svc.submit_memory(mems[i]) for i in range(6)]
    results = svc.run_to_completion()
    for rid in rids:
        seq = results[rid]
        assert seq[0] == tok.start_id
        assert len(seq) <= MAXLEN
        assert all(0 <= t < tok.get_vocab_size() for t in seq)


def test_service_cache_len_validation(captioner):
    with pytest.raises(ValueError, match="cache_len"):
        CaptionService(captioner, num_slots=2, cache_len=2)


def test_service_bucketed_sharded_mesh_matches_unsharded(captioner):
    """Bucketing composes with slot sharding across the mesh."""
    from mit_tpu.parallel.mesh import create_mesh

    mems = _memories(captioner, 10, seed=53)
    ref = CaptionService(captioner, num_slots=8, cache_len=8)
    rids_ref = [ref.submit_memory(mems[i]) for i in range(10)]
    expect = ref.run_to_completion()

    mesh = create_mesh((8, 1))
    svc = CaptionService(captioner, num_slots=8, cache_len=8, mesh=mesh)
    rids = [svc.submit_memory(mems[i]) for i in range(10)]
    got = svc.run_to_completion()
    for a, b in zip(rids_ref, rids):
        assert expect[a] == got[b]


# ------------------------------------------------------------- run_stream

def test_caption_stream_matches_batch(captioner):
    """caption_stream (lazy chunk encode interleaved with decode windows)
    must return the same captions as chunk-encode + batch greedy."""
    from PIL import Image

    tok = captioner.tokenizer
    rng = np.random.default_rng(9)
    images = [
        Image.fromarray(rng.integers(0, 255, (32, 32, 3), dtype=np.uint8))
        for _ in range(7)
    ]
    # reference memories with the stream's own chunking (chunk 4, partial
    # chunk padded by repetition to the next power of two, pad row dropped)
    m_full = np.asarray(captioner.memory_from_images(images[:4]))
    m_part = np.asarray(
        captioner.memory_from_images(images[4:] + [images[6]])
    )[:3]
    mems = np.concatenate([m_full, m_part], axis=0)
    ref_tokens, ref_lengths = greedy_generate(
        captioner.params["decoder"], captioner.mcfg.decoder,
        jnp.asarray(mems), tok.start_id, tok.end_id, tok.pad_id, MAXLEN,
    )
    ref_tokens = np.asarray(ref_tokens)
    expect = [
        captioner.postprocess(ref_tokens[i, : int(l)].tolist())
        for i, l in enumerate(np.asarray(ref_lengths))
    ]

    svc = CaptionService(captioner, num_slots=3, cache_len=8)
    got = svc.caption_stream(images, encode_batch_size=4)
    assert got == expect


# --------------------------------------------------- full-sequence memory

@pytest.fixture(scope="module")
def full_captioner(captioner):
    """The same params served in full-sequence memory mode (reference
    encoder.py:107's documented alternative to CLS features)."""
    return Captioner(
        captioner.params,
        captioner.mcfg._replace(memory_mode="full"),
        captioner.tokenizer, captioner.cfg,
    )


def _full_memories(captioner, n, seed=0):
    s = captioner.mcfg.vision.seq_len
    d = captioner.mcfg.decoder.embed_dim
    return np.random.default_rng(seed).normal(
        size=(n, s, d)
    ).astype(np.float32)


def test_service_full_memory_matches_batch_greedy(full_captioner):
    """Full-memory service captions == batch greedy full-memory captions
    (VERDICT r3 missing #3's strong variant: the service carries per-slot
    cross K/V instead of refusing non-CLS memory)."""
    tok = full_captioner.tokenizer
    mems = _full_memories(full_captioner, 7, seed=11)
    ref_tokens, ref_lengths = greedy_generate(
        full_captioner.params["decoder"], full_captioner.mcfg.decoder,
        jnp.asarray(mems), tok.start_id, tok.end_id, tok.pad_id, MAXLEN,
    )
    ref_tokens = np.asarray(ref_tokens)
    ref_lengths = np.asarray(ref_lengths)

    svc = CaptionService(full_captioner, num_slots=3)
    assert svc.full_mem and "k" in svc.cross and "const" not in svc.cross
    rids = [svc.submit_memory(mems[i]) for i in range(7)]
    results = svc.run_to_completion()
    for i, rid in enumerate(rids):
        assert results[rid] == ref_tokens[i, : ref_lengths[i]].tolist(), i


def test_service_full_memory_zero_copy_and_bucketed(full_captioner):
    """Device-resident chunk admission + KV bucketing (overflow re-decode)
    both work under full memory; captions stay batch-identical."""
    tok = full_captioner.tokenizer
    mems = _full_memories(full_captioner, 6, seed=12)
    ref_tokens, ref_lengths = greedy_generate(
        full_captioner.params["decoder"], full_captioner.mcfg.decoder,
        jnp.asarray(mems), tok.start_id, tok.end_id, tok.pad_id, MAXLEN,
    )
    ref_tokens = np.asarray(ref_tokens)
    ref_lengths = np.asarray(ref_lengths)

    svc = CaptionService(full_captioner, num_slots=2, cache_len=6)
    rids = svc.submit_memory_batch(jnp.asarray(mems))
    results = svc.run_to_completion()
    assert not svc._chunks, "device chunks must GC once rows finish"
    for i, rid in enumerate(rids):
        assert results[rid] == ref_tokens[i, : ref_lengths[i]].tolist(), i


def test_service_full_memory_beam_matches_batch(full_captioner):
    """Beam service under full memory == batch beam_generate."""
    from mit_tpu.decode.beam import beam_generate

    tok = full_captioner.tokenizer
    mems = _full_memories(full_captioner, 5, seed=13)
    ref_tokens, _ = beam_generate(
        full_captioner.params["decoder"], full_captioner.mcfg.decoder,
        jnp.asarray(mems), tok.start_id, tok.end_id, tok.pad_id, MAXLEN, 3,
    )
    ref_tokens = np.asarray(ref_tokens)

    svc = CaptionService(full_captioner, num_slots=2, method="beam",
                         beam_size=3)
    rids = [svc.submit_memory(mems[i]) for i in range(5)]
    results = svc.run_to_completion()
    pad = tok.pad_id
    for i, rid in enumerate(rids):
        n = int((ref_tokens[i] != pad).sum())
        assert results[rid] == ref_tokens[i, :n].tolist(), i


# ------------------------------------------------- zero-copy admission

def test_submit_memory_batch_zero_copy_matches_host_path(captioner):
    """Device-resident chunk submission (zero-copy admission: cross
    constants precomputed at chunk-land time, gathered+scattered on
    device) must caption identically to per-row host submission, and the
    chunk registry must drain once rows finish."""
    tok = captioner.tokenizer
    mems = _memories(captioner, 10)

    svc_host = CaptionService(captioner, num_slots=3, cache_len=8)
    rids_h = [svc_host.submit_memory(mems[i]) for i in range(10)]
    expect = svc_host.run_to_completion()

    svc_dev = CaptionService(captioner, num_slots=3, cache_len=8)
    rids_d = []
    rids_d += svc_dev.submit_memory_batch(jnp.asarray(mems[:4, :, :]))
    rids_d += svc_dev.submit_memory_batch(
        jnp.asarray(np.concatenate([mems[4:], mems[:2]])), real=6
    )  # padded chunk: only the 6 real rows queue
    got = svc_dev.run_to_completion()
    assert len(rids_d) == 10
    for a, b in zip(rids_h, rids_d):
        assert expect[a] == got[b]
    assert not svc_dev._chunks, "device chunks must GC once rows finish"
