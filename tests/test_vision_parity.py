"""Vision tower parity vs HF torch implementations (random small models).

No network/HF cache in this environment, so we construct small random HF
models from configs and compare ``last_hidden_state`` against our JAX
implementation with converted weights — the same converters used for real
pretrained safetensors.
"""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from mit_tpu.models.vision import (
    VisionConfig,
    config_for_encoder,
    detect_hf_prefix,
    params_from_hf_vision,
    vision_forward,
)

D, L, H, F, IMG, PATCH = 32, 2, 2, 64, 32, 16


def _compare(hf_model, cfg, prefix=""):
    sd = {k: v for k, v in hf_model.state_dict().items()}
    if prefix == "auto":
        prefix = detect_hf_prefix(sd, cfg)
    params = params_from_hf_vision(sd, cfg, prefix)
    g = torch.Generator().manual_seed(0)
    pixels = torch.randn(2, 3, IMG, IMG, generator=g)
    with torch.no_grad():
        ref = hf_model(pixel_values=pixels).last_hidden_state.numpy()
    ours = np.asarray(vision_forward(params, cfg, jnp.asarray(pixels.numpy())))
    np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=2e-4)


def test_vit_parity():
    from transformers import ViTConfig, ViTModel

    torch.manual_seed(1)
    m = ViTModel(
        ViTConfig(
            hidden_size=D, num_hidden_layers=L, num_attention_heads=H,
            intermediate_size=F, image_size=IMG, patch_size=PATCH,
        ),
        add_pooling_layer=False,
    ).eval()
    cfg = VisionConfig(
        family="vit", image_size=IMG, patch_size=PATCH, hidden_size=D,
        num_layers=L, num_heads=H, intermediate_size=F,
        hidden_act="gelu", layer_norm_eps=1e-12,
        patch_bias=True, ln_pre=False, ln_post=True,
    )
    _compare(m, cfg, prefix="auto")


def test_clip_vision_parity():
    from transformers import CLIPVisionConfig, CLIPVisionModel

    torch.manual_seed(2)
    m = CLIPVisionModel(
        CLIPVisionConfig(
            hidden_size=D, num_hidden_layers=L, num_attention_heads=H,
            intermediate_size=F, image_size=IMG, patch_size=PATCH,
        )
    ).eval()
    cfg = VisionConfig(
        family="clip", image_size=IMG, patch_size=PATCH, hidden_size=D,
        num_layers=L, num_heads=H, intermediate_size=F,
        hidden_act="quick_gelu", layer_norm_eps=1e-5,
        patch_bias=False, ln_pre=True, ln_post=False,
    )
    _compare(m, cfg, prefix="auto")  # CLIPVisionModel nests under vision_model.


def test_blip_vision_parity():
    from transformers import BlipVisionConfig, BlipVisionModel

    torch.manual_seed(3)
    m = BlipVisionModel(
        BlipVisionConfig(
            hidden_size=D, num_hidden_layers=L, num_attention_heads=H,
            intermediate_size=F, image_size=IMG, patch_size=PATCH,
        )
    ).eval()
    cfg = VisionConfig(
        family="blip", image_size=IMG, patch_size=PATCH, hidden_size=D,
        num_layers=L, num_heads=H, intermediate_size=F,
        hidden_act="gelu", layer_norm_eps=1e-5,
        patch_bias=True, ln_pre=False, ln_post=True,
    )
    _compare(m, cfg, prefix="auto")


def test_encoder_name_dispatch():
    """Name-substring dispatch matches reference model.py:34-55 rules."""
    assert config_for_encoder("google/vit-base-patch16-224-in21k").family == "vit"
    assert config_for_encoder("openai/clip-vit-base-patch32").family == "clip"
    assert config_for_encoder("openai/clip-vit-large-patch14").hidden_size == 1024
    assert (
        config_for_encoder("Salesforce/blip-image-captioning-base").family == "blip"
    )
    # substring fallbacks for unknown names
    assert config_for_encoder("my-org/some-blip-model").family == "blip"
    assert config_for_encoder("my-org/someclipthing").family == "clip"
    assert config_for_encoder("facebook/vit-custom").family == "vit"


def test_preset_shapes():
    c = config_for_encoder("google/vit-base-patch16-224-in21k")
    assert c.seq_len == 197          # reference encoder.py:140 documents (1,197,768)
    c = config_for_encoder("openai/clip-vit-base-patch32")
    assert c.seq_len == 50           # reference encoder.py:157 documents (1,50,768)


def test_config_from_hf_discovery():
    """Hidden-dim discovery from HF config objects (reference model.py:59-66),
    incl. the composite-config vision_config fallback."""
    from transformers import CLIPConfig, CLIPVisionConfig, ViTConfig

    from mit_tpu.models.vision import config_from_hf

    v = config_from_hf(ViTConfig(hidden_size=384, num_hidden_layers=6,
                                 num_attention_heads=6, intermediate_size=1536,
                                 image_size=160, patch_size=16))
    assert v.family == "vit" and v.hidden_size == 384 and v.num_layers == 6
    assert v.seq_len == 101

    cv = config_from_hf(CLIPVisionConfig(hidden_size=512, num_hidden_layers=8,
                                         num_attention_heads=8,
                                         intermediate_size=2048,
                                         image_size=224, patch_size=32))
    assert cv.family == "clip" and cv.ln_pre and not cv.ln_post
    assert cv.hidden_act == "quick_gelu"

    # composite config → vision_config fallback
    full = CLIPConfig()
    c2 = config_from_hf(full)
    assert c2.family == "clip" and c2.hidden_size == full.vision_config.hidden_size
