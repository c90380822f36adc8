"""C++ image loader: parity with the PIL/HF path, error handling, speed."""

import io
import os
import shutil

import numpy as np
import pytest
from PIL import Image

pytestmark = pytest.mark.skipif(
    shutil.which("make") is None or shutil.which("g++") is None,
    reason="no C++ toolchain",
)


def _jpeg(w, h, seed=0, quality=92):
    rng = np.random.default_rng(seed)
    # smooth-ish image: random low-res upsampled, JPEG-friendly
    small = rng.integers(0, 256, (h // 8 + 1, w // 8 + 1, 3), np.uint8)
    img = Image.fromarray(small, "RGB").resize((w, h), Image.BILINEAR)
    buf = io.BytesIO()
    img.save(buf, "JPEG", quality=quality)
    return buf.getvalue()


@pytest.mark.parametrize(
    "encoder",
    [
        "google/vit-base-patch16-224-in21k",   # bilinear, fixed
        "openai/clip-vit-base-patch32",        # bicubic, shortest-edge+crop
    ],
)
@pytest.mark.parametrize("w,h", [(320, 240), (180, 260), (224, 224)])
def test_native_matches_pil_path(encoder, w, h, tmp_path):
    from mit_tpu.data.native_loader import NativeImageLoader, native_available

    assert native_available()
    loader = NativeImageLoader(encoder)
    data = _jpeg(w, h, seed=w + h)
    p = tmp_path / "x.jpg"
    p.write_bytes(data)

    ours = loader.load_path(str(p))
    with Image.open(p) as im:
        ref = loader._fallback(im)
    assert ours.shape == ref.shape
    # PIL resizes in uint8 fixed-point per pass; we resample in double and
    # quantize once — allow a few LSBs of divergence post-normalization.
    std_min = min(loader.spec.std)
    tol = 4.0 / 255.0 / std_min
    diff = np.abs(ours - ref)
    assert diff.max() <= tol, (diff.max(), tol)
    assert diff.mean() <= tol / 8


def test_native_corrupt_jpeg_raises():
    from mit_tpu.data.native_loader import NativeImageLoader

    loader = NativeImageLoader("google/vit-base-patch16-224-in21k")
    with pytest.raises(ValueError):
        loader.load_jpeg_bytes(b"definitely not a jpeg")


def test_native_grayscale_jpeg(tmp_path):
    from mit_tpu.data.native_loader import NativeImageLoader

    buf = io.BytesIO()
    Image.new("L", (100, 80), 100).save(buf, "JPEG")
    loader = NativeImageLoader("google/vit-base-patch16-224-in21k")
    out = loader.load_jpeg_bytes(buf.getvalue())
    assert out.shape == (3, 224, 224)
    # gray 100 → all channels equal
    np.testing.assert_allclose(out[0], out[1], atol=1e-6)


def test_native_png_falls_back_to_pil(tmp_path):
    from mit_tpu.data.native_loader import NativeImageLoader

    p = tmp_path / "x.png"
    Image.new("RGB", (64, 64), (10, 200, 30)).save(p)
    loader = NativeImageLoader("google/vit-base-patch16-224-in21k")
    out = loader.load_path(str(p))
    assert out.shape == (3, 224, 224)
