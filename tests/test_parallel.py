"""Multi-device sharding tests on the virtual 8-CPU mesh.

The capability the reference entirely lacks (SURVEY.md §2: no DP/TP/PP
anywhere): data-parallel training, tensor-parallel decoder matmuls, and
sharded batched decode, validated numerically against single-device runs.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from mit_tpu.config import Config
from mit_tpu.models.decoder import DecoderConfig, decoder_forward, init_decoder_params
from mit_tpu.models.model import ModelConfig, init_model_params, split_trainable
from mit_tpu.models.vision import VisionConfig
from mit_tpu.parallel.mesh import (
    create_mesh,
    decoder_param_specs,
    model_param_specs,
    shard_batch,
    shard_train_state,
    shard_tree,
    replicate,
)
from mit_tpu.train.steps import init_train_state, make_optimizer, make_train_step

pytestmark = pytest.mark.slow  # heavy end-to-end module (see pyproject)

TINY_VISION = VisionConfig(
    family="vit", image_size=32, patch_size=16, hidden_size=48,
    num_layers=1, num_heads=8, intermediate_size=64,
    hidden_act="gelu", layer_norm_eps=1e-12,
    patch_bias=True, ln_pre=False, ln_post=True,
)
TINY_DECODER = DecoderConfig(
    vocab_size=64, embed_dim=32, num_heads=8, num_layers=2,
    ff_dim=64, max_seq_len=12, dropout=0.0, pad_idx=0,
)
MCFG = ModelConfig("tiny", TINY_VISION, TINY_DECODER, "cls")


def _batch(b=8, t=11, seed=0):
    r = np.random.default_rng(seed)
    toks = r.integers(4, 64, (b, t + 1), dtype=np.int32)
    toks[:, 0] = 2
    return {
        "images": r.normal(size=(b, 3, 32, 32)).astype(np.float32),
        "decoder_input_tokens": toks[:, :-1].astype(np.int32),
        "target_tokens": toks[:, 1:].astype(np.int32),
    }


def test_mesh_creation_shapes():
    m = create_mesh((-1, 1))
    assert m.devices.shape == (8, 1)
    m = create_mesh((4, 2))
    assert m.devices.shape == (4, 2)
    m = create_mesh((2, -1))
    assert m.devices.shape == (2, 4)
    with pytest.raises(ValueError):
        create_mesh((3, 2))


def test_spec_tree_matches_param_tree():
    params = init_decoder_params(jax.random.PRNGKey(0), TINY_DECODER)
    specs = decoder_param_specs(tp=True)
    # structures must match exactly for tree.map
    jax.tree.map(lambda a, b: None, params, specs,
                 is_leaf=lambda x: isinstance(x, P))


def test_dp_train_step_matches_single_device():
    """8-way DP step == single-device step (same grads via psum)."""
    cfg = Config(GRAD_CLIP_VALUE=1.0, LEARNING_RATE=1e-2)
    params = init_model_params(jax.random.PRNGKey(0), MCFG)
    trainable, frozen = split_trainable(params)
    optimizer, _ = make_optimizer(cfg)
    batch = _batch()
    rng = jax.random.PRNGKey(0)

    # single device
    step = make_train_step(MCFG, optimizer, 0, jnp.float32, donate=False)
    s0 = init_train_state(trainable, optimizer)
    s1, loss1 = step(s0, frozen, {k: jnp.asarray(v) for k, v in batch.items()}, rng)

    # 8-way data parallel
    mesh = create_mesh((8, 1))
    sd = init_train_state(trainable, optimizer)
    sd = shard_train_state(sd, mesh, MCFG, tp=False)
    frozen_sh = replicate(frozen, mesh)
    batch_sh = shard_batch(batch, mesh)
    s2, loss2 = step(sd, frozen_sh, batch_sh, rng)

    assert abs(float(loss1) - float(loss2)) < 1e-5
    a = np.asarray(s1.params["decoder"]["fc_out_w"])
    b = np.asarray(s2.params["decoder"]["fc_out_w"])
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)
    # params stayed replicated, batch stayed sharded
    assert s2.params["decoder"]["fc_out_w"].sharding.is_fully_replicated


def test_tp_forward_matches_replicated():
    """Tensor-parallel decoder forward == unsharded forward."""
    params = init_decoder_params(jax.random.PRNGKey(3), TINY_DECODER)
    toks = jnp.asarray(
        np.random.default_rng(0).integers(1, 64, (4, 10)), jnp.int32
    )
    memory = jnp.asarray(
        np.random.default_rng(1).normal(size=(4, 1, 32)), jnp.float32
    )
    ref = decoder_forward(params, TINY_DECODER, toks, memory)

    mesh = create_mesh((1, 8))
    specs = decoder_param_specs(tp=True)
    params_tp = shard_tree(params, specs, mesh)
    fwd = jax.jit(lambda p, t, m: decoder_forward(p, TINY_DECODER, t, m))
    out = fwd(params_tp, toks, memory)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_dp_tp_combined_train_step():
    """(4 data, 2 model) mesh: step runs and loss is finite + consistent."""
    cfg = Config(GRAD_CLIP_VALUE=0.0, LEARNING_RATE=1e-2)
    params = init_model_params(jax.random.PRNGKey(0), MCFG)
    trainable, frozen = split_trainable(params)
    optimizer, _ = make_optimizer(cfg)
    batch = _batch()
    rng = jax.random.PRNGKey(0)

    step = make_train_step(MCFG, optimizer, 0, jnp.float32, donate=False)
    s0 = init_train_state(trainable, optimizer)
    _, loss_ref = step(s0, frozen, {k: jnp.asarray(v) for k, v in batch.items()}, rng)

    mesh = create_mesh((4, 2))
    sd = shard_train_state(init_train_state(trainable, optimizer), mesh, MCFG, tp=True)
    frozen_sh = shard_tree(
        frozen, {"encoder": model_param_specs(params, tp=True)["encoder"]}, mesh
    )
    batch_sh = shard_batch(batch, mesh)
    s2, loss2 = step(sd, frozen_sh, batch_sh, rng)
    assert abs(float(loss_ref) - float(loss2)) < 1e-4
    assert np.isfinite(float(loss2))


def test_dp_tp_train_step_with_pallas_kernels():
    """Fused Pallas attention stays active under DP+TP GSPMD sharding
    (custom_partitioning) — matches the XLA-attention path numerically.

    Round-1 limitation removed: kernels previously had to be disabled for
    sharded execution (old docs/PARITY.md escape hatch)."""
    from mit_tpu.ops.pallas_attention import set_pallas_enabled

    cfg = Config(GRAD_CLIP_VALUE=0.0, LEARNING_RATE=1e-2)
    params = init_model_params(jax.random.PRNGKey(0), MCFG)
    trainable, frozen = split_trainable(params)
    optimizer, _ = make_optimizer(cfg)
    batch = _batch()
    rng = jax.random.PRNGKey(0)

    step = make_train_step(MCFG, optimizer, 0, jnp.float32, donate=False)
    s0 = init_train_state(trainable, optimizer)
    _, loss_ref = step(
        s0, frozen, {k: jnp.asarray(v) for k, v in batch.items()}, rng
    )

    mesh = create_mesh((4, 2))
    sd = shard_train_state(
        init_train_state(trainable, optimizer), mesh, MCFG, tp=True
    )
    frozen_sh = shard_tree(
        frozen, {"encoder": model_param_specs(params, tp=True)["encoder"]}, mesh
    )
    batch_sh = shard_batch(batch, mesh)
    set_pallas_enabled(True)        # interpret-mode kernels on the CPU mesh
    try:
        s2, loss2 = step(sd, frozen_sh, batch_sh, rng)
        assert abs(float(loss_ref) - float(loss2)) < 1e-4
        w = np.asarray(s2.params["decoder"]["fc_out_w"])
    finally:
        set_pallas_enabled(None)
    assert np.isfinite(w).all()


def test_sharded_vision_forward_with_pallas_kernels():
    """Encoder (bidirectional) fused attention under pure-DP sharding."""
    from mit_tpu.models.vision import init_vision_params, vision_forward
    from mit_tpu.ops.pallas_attention import set_pallas_enabled

    params = init_vision_params(jax.random.PRNGKey(1), TINY_VISION)
    pixels = np.random.default_rng(2).normal(size=(8, 3, 32, 32)).astype(
        np.float32
    )
    ref = np.asarray(
        vision_forward(params, TINY_VISION, jnp.asarray(pixels),
                       use_pallas=False)
    )
    mesh = create_mesh((8, 1))
    px = jax.device_put(jnp.asarray(pixels), NamedSharding(mesh, P("data")))
    pr = replicate(params, mesh)
    set_pallas_enabled(True)
    try:
        out = jax.jit(
            lambda p, x: vision_forward(p, TINY_VISION, x, use_pallas=True)
        )(pr, px)
    finally:
        set_pallas_enabled(None)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-5, atol=2e-5)


def test_sharded_int8_encoder_with_fused_layer_kernels():
    """int8 encoder (whole-layer fused kernels) under pure-DP sharding ==
    unsharded int8 forward: batch shards, int8 weights replicate."""
    from mit_tpu.models.vision import (
        init_vision_params,
        quantize_vision_params,
        vision_forward_int8,
    )
    from mit_tpu.ops.pallas_attention import set_pallas_enabled

    params = init_vision_params(jax.random.PRNGKey(3), TINY_VISION)
    qp = quantize_vision_params(params, TINY_VISION)
    pixels = np.random.default_rng(5).normal(size=(8, 3, 32, 32)).astype(
        np.float32
    )
    set_pallas_enabled(True)
    try:
        mesh = create_mesh((8, 1))
        px = jax.device_put(jnp.asarray(pixels), NamedSharding(mesh, P("data")))
        qr = replicate(qp, mesh)
        for cls_only in (False, True):   # True = the serving (cls) config:
            # exercises the int8_linear patch embed + narrowed last layer.
            # f32 compute: bf16 einsum accumulation order differs between
            # per-shard and full-batch shapes at the last bit.
            ref = np.asarray(
                vision_forward_int8(qp, TINY_VISION, jnp.asarray(pixels),
                                    jnp.float32, use_pallas=True,
                                    cls_only=cls_only)
            )
            out = jax.jit(
                lambda p, x: vision_forward_int8(p, TINY_VISION, x,
                                                 jnp.float32,
                                                 use_pallas=True,
                                                 cls_only=cls_only)
            )(qr, px)
            np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-5,
                                       atol=2e-5)
    finally:
        set_pallas_enabled(None)


def test_sharded_greedy_decode():
    """Batch-sharded KV-cached decode == single-device decode."""
    from mit_tpu.decode.greedy import greedy_generate

    params = init_decoder_params(jax.random.PRNGKey(5), TINY_DECODER)
    memory = jnp.asarray(
        np.random.default_rng(5).normal(size=(8, 1, 32)), jnp.float32
    )
    ref, _ = greedy_generate(params, TINY_DECODER, memory, 2, 3, 0, 12)

    mesh = create_mesh((8, 1))
    params_sh = replicate(params, mesh)
    mem_sh = jax.device_put(memory, NamedSharding(mesh, P("data")))
    out, _ = greedy_generate(params_sh, TINY_DECODER, mem_sh, 2, 3, 0, 12)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(out))


def test_sharded_beam_decode():
    """Batch-sharded beam search == single-device beam search (the beam
    dimension is folded into batch, so DP sharding covers serving's beam
    path too)."""
    from mit_tpu.decode.beam import beam_generate

    params = init_decoder_params(jax.random.PRNGKey(6), TINY_DECODER)
    memory = jnp.asarray(
        np.random.default_rng(6).normal(size=(8, 1, 32)), jnp.float32
    )
    ref, ref_scores = beam_generate(params, TINY_DECODER, memory, 2, 3, 0,
                                    12, beam_size=3)

    mesh = create_mesh((8, 1))
    params_sh = replicate(params, mesh)
    mem_sh = jax.device_put(memory, NamedSharding(mesh, P("data")))
    out, scores = beam_generate(params_sh, TINY_DECODER, mem_sh, 2, 3, 0,
                                12, beam_size=3)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(out))
    np.testing.assert_allclose(np.asarray(ref_scores), np.asarray(scores),
                               rtol=1e-5, atol=1e-6)
