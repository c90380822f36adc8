"""Preprocessing parity vs HF image processors + device-path sanity."""

import numpy as np
import pytest
from PIL import Image

from mit_tpu.data.preprocess import (
    HostPreprocessor,
    device_preprocess,
    spec_for_encoder,
)


def _rand_image(w, h, seed=0):
    rng = np.random.default_rng(seed)
    return Image.fromarray(rng.integers(0, 256, (h, w, 3), dtype=np.uint8), "RGB")


@pytest.mark.parametrize(
    "name,hf_cls",
    [
        ("google/vit-base-patch16-224-in21k", "ViTImageProcessor"),
        ("openai/clip-vit-base-patch32", "CLIPImageProcessor"),
        ("Salesforce/blip-image-captioning-base", "BlipImageProcessor"),
    ],
)
@pytest.mark.slow
def test_host_matches_hf_processor(name, hf_cls):
    import transformers

    proc = getattr(transformers, hf_cls)()
    ours = HostPreprocessor(name)
    for w, h, seed in [(320, 240, 0), (240, 320, 1), (224, 224, 2), (500, 100, 3)]:
        img = _rand_image(w, h, seed)
        ref = proc(images=img, return_tensors="np")["pixel_values"][0]
        out = ours(img)
        assert out.shape == ref.shape
        np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)


def test_host_grayscale_converted():
    img = Image.new("L", (100, 80), 128)
    out = HostPreprocessor("google/vit-base-patch16-224-in21k")(img)
    assert out.shape == (3, 224, 224)


def test_device_path_shapes_and_range():
    rng = np.random.default_rng(0)
    batch = rng.integers(0, 256, (2, 224, 224, 3), dtype=np.uint8)
    out = np.asarray(device_preprocess(batch, "google/vit-base-patch16-224-in21k"))
    assert out.shape == (2, 3, 224, 224)
    # vit normalization: (x/255 - .5)/.5 in [-1, 1]
    assert out.min() >= -1.0 - 1e-5 and out.max() <= 1.0 + 1e-5


def test_device_matches_host_on_presized_input():
    """With input already at target size, device and host paths agree."""
    img = _rand_image(224, 224, seed=5)
    host = HostPreprocessor("google/vit-base-patch16-224-in21k")(img)
    dev = np.asarray(
        device_preprocess(
            np.asarray(img, np.uint8)[None], "google/vit-base-patch16-224-in21k"
        )
    )[0]
    np.testing.assert_allclose(dev, host, rtol=1e-5, atol=1e-5)


def test_spec_dispatch():
    assert spec_for_encoder("openai/clip-vit-base-patch32").mode == "shortest_edge_crop"
    assert spec_for_encoder("Salesforce/blip-image-captioning-base").target == (384, 384)
    assert spec_for_encoder("google/vit-base-patch16-224-in21k").resample == "bilinear"
