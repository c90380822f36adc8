"""Utils tests: pure-Python safetensors IO, profiling, encoder tools."""

import numpy as np
import pytest

from mit_tpu.utils import safetensors_io as stio


def test_safetensors_roundtrip_own(tmp_path):
    tensors = {
        "a": np.arange(12, dtype=np.float32).reshape(3, 4),
        "b.nested.name": np.ones((2, 2, 2), np.int32),
        "scalarish": np.asarray([7], np.int64),
    }
    p = str(tmp_path / "x.safetensors")
    stio.save_file(tensors, p)
    back = stio.load_file(p)
    assert set(back) == set(tensors)
    for k in tensors:
        np.testing.assert_array_equal(back[k], tensors[k])


def test_safetensors_interop_with_library(tmp_path):
    """Our writer ↔ the Rust-backed library, both directions."""
    from safetensors.numpy import load_file as lib_load, save_file as lib_save

    tensors = {"w": np.random.default_rng(0).normal(size=(5, 3)).astype(np.float32),
               "b": np.zeros((3,), np.float32)}
    ours = str(tmp_path / "ours.safetensors")
    theirs = str(tmp_path / "theirs.safetensors")
    stio.save_file(tensors, ours)
    lib_save(tensors, theirs)

    via_lib = lib_load(ours)          # library reads our file
    via_ours = stio.load_file(theirs)  # we read the library's file
    for k in tensors:
        np.testing.assert_array_equal(via_lib[k], tensors[k])
        np.testing.assert_array_equal(via_ours[k], tensors[k])


def test_safetensors_bf16(tmp_path):
    import jax.numpy as jnp

    arr = np.asarray(jnp.asarray([[1.5, -2.25], [0.125, 3.0]], jnp.bfloat16))
    p = str(tmp_path / "bf.safetensors")
    stio.save_file({"x": arr}, p)
    back = stio.load_file(p)["x"]
    np.testing.assert_array_equal(
        back.view(np.uint16), arr.view(np.uint16)
    )


def test_step_timer():
    import time

    from mit_tpu.utils.profiling import StepTimer

    t = StepTimer(window=10)
    for _ in range(3):
        with t.step(n_items=4):
            time.sleep(0.01)
    assert 0 < t.mean_step_seconds < 1
    assert t.items_per_sec > 0
    s = t.summary()
    assert set(s) == {"items_per_sec", "items_per_sec_per_chip",
                      "mean_step_seconds"}


@pytest.mark.slow
def test_encoder_tools_shapes():
    from PIL import Image

    from mit_tpu.models.encoder_tools import encode_image, get_encoder_output_dim

    assert get_encoder_output_dim("google/vit-base-patch16-224-in21k") == 768
    assert get_encoder_output_dim("openai/clip-vit-large-patch14") == 1024
    # random-weight tower, but shapes must match reference encoder.py:140
    feats = encode_image(
        Image.new("RGB", (224, 224)), "google/vit-base-patch16-224-in21k"
    )
    assert feats.shape == (1, 197, 768)


def test_alias_package_imports():
    import multimodal_image_transformer_tpu as alias
    import mit_tpu

    assert alias.__version__ == mit_tpu.__version__
    from multimodal_image_transformer_tpu.config import Config

    assert Config().MAX_SEQ_LEN == 100
