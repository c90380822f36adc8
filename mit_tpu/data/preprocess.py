"""Image preprocessing: host path (HF-parity) + device path (TPU-fused).

Replaces the reference's per-item ``AutoImageProcessor`` calls inside the
Dataset (reference dataset.py:24-27, 136) and inside ``generate``
(reference model.py:192-193).

Two paths, by design:

- **host**: PIL resize/crop with the exact per-family HF processor recipe
  (ViT: 224² bilinear, mean/std 0.5; CLIP: shortest-edge 224 bicubic +
  center-crop, OpenAI mean/std; BLIP: 384² bicubic, OpenAI mean/std) —
  numerically matching the reference's preprocessing so features/captions are
  comparable.
- **device**: a jit-compiled resize+rescale+normalize over fixed-shape uint8
  batches that XLA fuses into a single pass feeding HBM directly (the
  north-star "device-side preprocessing" path for the serving/bench loop,
  where inputs arrive at a known shape).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Tuple

import numpy as np
import jax
import jax.numpy as jnp

OPENAI_MEAN = (0.48145466, 0.4578275, 0.40821073)
OPENAI_STD = (0.26862954, 0.26130258, 0.27577711)


class PreprocessSpec(NamedTuple):
    """Per-encoder-family preprocessing recipe (HF processor defaults)."""

    target: Tuple[int, int]             # (H, W) after resize (+crop for clip)
    mode: str                           # "fixed" | "shortest_edge_crop"
    resample: str                       # "bilinear" | "bicubic"
    mean: Tuple[float, float, float]
    std: Tuple[float, float, float]


SPECS = {
    "vit": PreprocessSpec((224, 224), "fixed", "bilinear", (0.5,) * 3, (0.5,) * 3),
    "clip": PreprocessSpec(
        (224, 224), "shortest_edge_crop", "bicubic", OPENAI_MEAN, OPENAI_STD
    ),
    "blip": PreprocessSpec((384, 384), "fixed", "bicubic", OPENAI_MEAN, OPENAI_STD),
}


def spec_for_encoder(name: str) -> PreprocessSpec:
    low = name.lower()
    if "blip" in low:
        return SPECS["blip"]
    if "clip" in low:
        return SPECS["clip"]
    return SPECS["vit"]


# ----------------------------------------------------------------------
# Host path (PIL; exact HF ImageProcessor semantics)
# ----------------------------------------------------------------------
class HostPreprocessor:
    """PIL-based preprocessing matching the HF processor for the encoder.

    ``__call__(pil_image) -> np.float32 (3, H, W)`` (NCHW like HF).
    """

    def __init__(self, encoder_name: str, image_size: int = None):
        """``image_size`` overrides the recipe's target square side — pass the
        vision tower's actual input size when it differs from the family
        default (e.g. reduced test models)."""
        self.spec = spec_for_encoder(encoder_name)
        if image_size is not None and image_size != self.spec.target[0]:
            self.spec = self.spec._replace(target=(image_size, image_size))

    def __call__(self, image) -> np.ndarray:
        from PIL import Image

        if image.mode != "RGB":
            image = image.convert("RGB")
        spec = self.spec
        resample = (
            Image.Resampling.BILINEAR
            if spec.resample == "bilinear"
            else Image.Resampling.BICUBIC
        )
        th, tw = spec.target
        if spec.mode == "fixed":
            image = image.resize((tw, th), resample=resample)
            arr = np.asarray(image, dtype=np.float32)
        else:  # shortest_edge resize + center crop (CLIP)
            w, h = image.size
            short = min(w, h)
            scale = th / short
            # HF get_resize_output_image_size: scale the long side, keep ratio
            nw, nh = (th, int(h * scale)) if w <= h else (int(w * scale), th)
            image = image.resize((nw, nh), resample=resample)
            arr = np.asarray(image, dtype=np.float32)
            top = (nh - th) // 2
            left = (nw - tw) // 2
            arr = arr[top : top + th, left : left + tw]
        arr = arr / 255.0
        arr = (arr - np.asarray(spec.mean, np.float32)) / np.asarray(
            spec.std, np.float32
        )
        return arr.transpose(2, 0, 1).astype(np.float32)  # HWC -> CHW

    @property
    def output_shape(self) -> Tuple[int, int, int]:
        return (3, *self.spec.target)


# ----------------------------------------------------------------------
# Device path (jitted; fixed input shape)
# ----------------------------------------------------------------------
@partial(jax.jit, static_argnames=("target", "resample", "mean", "std"))
def _device_preprocess(
    images_u8: jnp.ndarray,             # (B, H, W, 3) uint8
    target: Tuple[int, int],
    resample: str,
    mean: Tuple[float, float, float],
    std: Tuple[float, float, float],
) -> jnp.ndarray:
    b = images_u8.shape[0]
    th, tw = target
    x = images_u8.astype(jnp.float32)
    method = "bilinear" if resample == "bilinear" else "cubic"
    x = jax.image.resize(x, (b, th, tw, 3), method=method, antialias=True)
    x = x / 255.0
    x = (x - jnp.asarray(mean)) / jnp.asarray(std)
    return x.transpose(0, 3, 1, 2)      # NHWC -> NCHW


def device_preprocess(images_u8, encoder_name: str) -> jnp.ndarray:
    """Batch uint8 NHWC → normalized fp32 NCHW, fused on-device.

    Square-resizes directly to the target (serving path with known shapes);
    use :class:`HostPreprocessor` where exact HF crop semantics matter.
    """
    spec = spec_for_encoder(encoder_name)
    return _device_preprocess(
        images_u8, spec.target, spec.resample, spec.mean, spec.std
    )
