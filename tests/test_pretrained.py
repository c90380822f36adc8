"""Pretrained-encoder ingestion: name-or-path → (VisionConfig, params).

No network in CI, so "pretrained" weights are exercised through the exact
code path real checkpoints take: HF models saved with ``save_pretrained``
(producing the same model.safetensors + config.json layout a hub download
yields), bare safetensors files without configs, and reference-style torch
``.pt`` wrappers. Parity vs the torch forward proves the loaded weights are
the real ones, not a re-init (reference model.py:50, encoder.py:20-63).
"""

import json
import os

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from mit_tpu.config import Config
from mit_tpu.models.pretrained import (
    config_from_json_dict,
    detect_family,
    infer_config_from_state_dict,
    load_pretrained_encoder,
    load_state_dict,
)
from mit_tpu.models.vision import vision_forward

pytestmark = pytest.mark.slow  # heavy end-to-end module (see pyproject)

D, L, H, F, IMG, PATCH = 128, 2, 2, 64, 32, 16  # head_dim 64 (see num_heads inference)


def _save_vit(tmp_path):
    from transformers import ViTConfig, ViTModel

    torch.manual_seed(0)
    m = ViTModel(
        ViTConfig(
            hidden_size=D, num_hidden_layers=L, num_attention_heads=H,
            intermediate_size=F, image_size=IMG, patch_size=PATCH,
        ),
        add_pooling_layer=False,
    ).eval()
    d = tmp_path / "vit"
    m.save_pretrained(d)
    return m, str(d)


def _ref_hidden(m, pixels):
    with torch.no_grad():
        return m(pixel_values=torch.from_numpy(pixels)).last_hidden_state.numpy()


def _check_parity(m, vcfg, params, atol=2e-4):
    rng = np.random.default_rng(0)
    pixels = rng.normal(size=(2, 3, vcfg.image_size, vcfg.image_size)).astype(
        np.float32
    )
    ours = np.asarray(vision_forward(params, vcfg, jnp.asarray(pixels)))
    np.testing.assert_allclose(ours, _ref_hidden(m, pixels), rtol=atol, atol=atol)


# ----------------------------------------------------------------------
def test_load_vit_save_pretrained_dir(tmp_path):
    m, d = _save_vit(tmp_path)
    vcfg, params = load_pretrained_encoder(d)
    assert vcfg.family == "vit" and vcfg.hidden_size == D and vcfg.num_layers == L
    _check_parity(m, vcfg, params)


def test_load_bare_safetensors_no_config(tmp_path):
    """Geometry inferred from tensor shapes when config.json is absent."""
    m, d = _save_vit(tmp_path)
    os.remove(os.path.join(d, "config.json"))
    vcfg, params = load_pretrained_encoder(d)
    assert (vcfg.hidden_size, vcfg.num_layers, vcfg.patch_size,
            vcfg.image_size, vcfg.num_heads) == (D, L, PATCH, IMG, H)
    _check_parity(m, vcfg, params)


def test_load_clip_vision_dir(tmp_path):
    from transformers import CLIPVisionConfig, CLIPVisionModel

    torch.manual_seed(1)
    m = CLIPVisionModel(
        CLIPVisionConfig(
            hidden_size=D, num_hidden_layers=L, num_attention_heads=H,
            intermediate_size=F, image_size=IMG, patch_size=PATCH,
        )
    ).eval()
    d = tmp_path / "clipv"
    m.save_pretrained(d)
    vcfg, params = load_pretrained_encoder(str(d))
    assert vcfg.family == "clip" and vcfg.ln_pre and not vcfg.ln_post
    _check_parity(m, vcfg, params)


def test_load_full_clip_slices_vision_tower(tmp_path):
    """A composite CLIP checkpoint (vision + text towers): the vision tower
    is sliced out via prefix detection; geometry comes from the nested
    vision_config (the reference's fallback, model.py:59-66)."""
    from transformers import CLIPConfig, CLIPModel, CLIPTextConfig, CLIPVisionConfig

    torch.manual_seed(2)
    cfg = CLIPConfig(
        text_config=CLIPTextConfig(hidden_size=32, num_hidden_layers=1,
                                   num_attention_heads=2, intermediate_size=64,
                                   vocab_size=99).to_dict(),
        vision_config=CLIPVisionConfig(hidden_size=D, num_hidden_layers=L,
                                       num_attention_heads=H,
                                       intermediate_size=F,
                                       image_size=IMG,
                                       patch_size=PATCH).to_dict(),
        projection_dim=16,
    )
    m = CLIPModel(cfg).eval()
    d = tmp_path / "clipfull"
    m.save_pretrained(d)
    vcfg, params = load_pretrained_encoder(str(d))
    assert vcfg.family == "clip" and vcfg.hidden_size == D
    _check_parity(m.vision_model, vcfg, params)


def test_load_blip_vision_dir(tmp_path):
    from transformers import BlipVisionConfig, BlipVisionModel

    torch.manual_seed(3)
    m = BlipVisionModel(
        BlipVisionConfig(
            hidden_size=D, num_hidden_layers=L, num_attention_heads=H,
            intermediate_size=F, image_size=IMG, patch_size=PATCH,
        )
    ).eval()
    d = tmp_path / "blipv"
    m.save_pretrained(d)
    vcfg, params = load_pretrained_encoder(str(d))
    assert vcfg.family == "blip"
    _check_parity(m, vcfg, params)


def test_load_torch_pt_with_wrapper(tmp_path):
    """Reference-style .pt: weights nested under model_state_dict
    (reference train.py:421-435)."""
    m, _ = _save_vit(tmp_path)
    pt = tmp_path / "ckpt.pt"
    torch.save({"epoch": 3, "model_state_dict": m.state_dict(),
                "best_val_loss": 2.5}, pt)
    vcfg, params = load_pretrained_encoder(str(pt))
    assert vcfg.hidden_size == D
    _check_parity(m, vcfg, params)


def test_detect_family_and_state_dict_inference(tmp_path):
    m, d = _save_vit(tmp_path)
    sd = load_state_dict(os.path.join(d, "model.safetensors"))
    assert detect_family(sd) == "vit"
    vcfg = infer_config_from_state_dict(sd, "vit", "")
    assert vcfg.intermediate_size == F and vcfg.image_size == IMG


def test_config_from_json_dict_families():
    vit = config_from_json_dict(
        {"model_type": "vit", "hidden_size": 384, "num_hidden_layers": 6,
         "num_attention_heads": 6, "intermediate_size": 1536,
         "image_size": 160, "patch_size": 16}
    )
    assert vit.family == "vit" and vit.hidden_size == 384 and vit.seq_len == 101
    nested = config_from_json_dict(
        {"model_type": "clip",
         "vision_config": {"model_type": "clip_vision_model",
                           "hidden_size": 512, "num_hidden_layers": 8,
                           "num_attention_heads": 8,
                           "intermediate_size": 2048,
                           "image_size": 224, "patch_size": 32}}
    )
    assert nested.family == "clip" and nested.hidden_size == 512
    assert nested.hidden_act == "quick_gelu" and nested.ln_pre


def test_missing_source_raises():
    with pytest.raises(Exception):
        load_pretrained_encoder(
            "definitely/not-a-real-model-zzz", local_files_only=True
        )


# ----------------------------------------------------------------------
def test_train_boot_uses_pretrained_weights(tmp_path):
    """build_model_params honors PRETRAINED_ENCODER=<dir>: encoder leaves
    equal the checkpoint's, not a random re-init."""
    from mit_tpu.train.loop import build_model_params
    from mit_tpu.models.model import ModelConfig

    m, d = _save_vit(tmp_path)
    cfg = Config(PRETRAINED_ENCODER=d, DECODER_EMBED_DIM=64,
                 DECODER_LAYERS=1, DECODER_HEADS=2, DECODER_FF_DIM=128,
                 MAX_SEQ_LEN=16)
    mcfg = ModelConfig.build(cfg, vocab_size=64)
    mcfg2, params = build_model_params(cfg, mcfg, jax.random.PRNGKey(0), 64)
    assert mcfg2.vision.hidden_size == D
    want = m.state_dict()["embeddings.cls_token"].numpy().reshape(-1)
    np.testing.assert_allclose(
        np.asarray(params["encoder"]["cls"]), want, atol=1e-6
    )
    # decoder is trainable-random and matches the rebuilt geometry
    assert params["decoder"]["token_embedding"].shape == (64, 64)


def test_train_boot_auto_fallback_is_graceful():
    """PRETRAINED_ENCODER='auto' with no cache → random init, no raise."""
    from mit_tpu.train.loop import build_model_params
    from mit_tpu.models.model import ModelConfig

    cfg = Config(DECODER_EMBED_DIM=64, DECODER_LAYERS=1, DECODER_HEADS=2,
                 DECODER_FF_DIM=128, MAX_SEQ_LEN=16,
                 ENCODER_MODEL_NAME="no-such/model-anywhere")
    mcfg = ModelConfig.build(cfg, vocab_size=64)
    mcfg2, params = build_model_params(cfg, mcfg, jax.random.PRNGKey(0), 64)
    assert "encoder" in params and mcfg2 == mcfg


def test_pretrained_captioner_boot(tmp_path):
    """Captioner boots from a local pretrained dir and captions an image."""
    from PIL import Image

    from mit_tpu.decode.api import pretrained_captioner
    from mit_tpu.text.tokenizer import train_tokenizer

    _, d = _save_vit(tmp_path)
    data = tmp_path / "data"
    data.mkdir()
    cfg = Config(DATA_DIR=str(data), DECODER_EMBED_DIM=64, DECODER_LAYERS=1,
                 DECODER_HEADS=2, DECODER_FF_DIM=128, MAX_SEQ_LEN=16,
                 VOCAB_SIZE=300)
    train_tokenizer(
        iter(["a dog runs", "a cat sits", "a bird flies"] * 3),
        cfg.VOCAB_SIZE, cfg.VOCAB_PATH, cfg.MERGES_PATH, cfg,
    )
    cap = pretrained_captioner(cfg, name_or_path=d)
    assert cap.mcfg.vision.hidden_size == D
    img = Image.new("RGB", (40, 40), (200, 30, 30))
    out = cap.caption(img, max_len=8)
    assert isinstance(out, str)


def test_pretrained_encoder_shards_under_tp(tmp_path):
    """Converted pretrained params take the same TP sharding rules as
    init-time params (tree structures match), and the sharded forward
    matches the unsharded one."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from mit_tpu.models.vision import vision_forward
    from mit_tpu.parallel.mesh import create_mesh, shard_tree, vision_param_specs

    m, d = _save_vit(tmp_path)
    vcfg, params = load_pretrained_encoder(d)
    ref = vision_forward(
        params, vcfg,
        jnp.asarray(np.random.default_rng(1).normal(size=(4, 3, IMG, IMG)),
                    jnp.float32),
    )
    mesh = create_mesh((4, 2))
    specs = vision_param_specs(params, tp=True)
    sharded = shard_tree(params, specs, mesh)
    pix = jnp.asarray(
        np.random.default_rng(1).normal(size=(4, 3, IMG, IMG)), jnp.float32
    )
    pix = jax.device_put(pix, NamedSharding(mesh, P("data")))
    out = jax.jit(lambda p, x: vision_forward(p, vcfg, x))(sharded, pix)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)
