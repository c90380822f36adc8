"""Frozen-encoder feature cache.

The reference recomputes the frozen encoder forward for every (image,
caption) pair every epoch (reference train.py:83 → model.py:133-136) — for
Flickr30k (5 captions/image, 20 epochs) that's ~100 redundant ViT forwards
per image. Since the encoder is frozen, its output is a pure function of the
image: compute once per *unique* image, keep the (U, S, H_enc) array in host
RAM, and feed training steps from the cache (BASELINE.json config 3).

CLS mode: 31k images × 768 fp32 ≈ 95 MB — trivially cacheable.
Full-sequence mode (197×768 per image, ≈ 9 GB in bf16 for Flickr30k) stores
bf16 halves when the encoder computes in bf16 (fp32 otherwise, so a cast
never discards precision the training step would have seen);
``max_bytes`` bounds the host footprint — a build
that would exceed it raises :class:`FeatureCacheTooLarge` *before* encoding
anything, and the training loop falls back to in-graph encoding.
"""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor
from typing import Dict, List, Optional

import numpy as np
import jax
import jax.numpy as jnp
import ml_dtypes

from mit_tpu.models.model import ModelConfig, encode_images


class FeatureCacheTooLarge(ValueError):
    """The projected cache size exceeds ``max_bytes``; train uncached."""


class FeatureCache:
    """Precomputed encoder features keyed by image path."""

    def __init__(
        self,
        features: np.ndarray,           # (U, S, H_enc)
        path_to_row: Dict[str, int],
        failed_paths: Optional[set] = None,
    ):
        self.features = features
        self.path_to_row = path_to_row
        # images that failed decoding at build time — forwarded to the
        # loader's text-only path so they keep the reference's dummy-item
        # (all-PAD, zero-loss) semantics (reference dataset.py:117-130)
        self.failed_paths = failed_paths or set()

    @classmethod
    def build(
        cls,
        dataset,                         # ImageTextDataset
        encoder_params: dict,
        mcfg: ModelConfig,
        batch_size: int = 32,
        num_workers: int = 2,
        dtype=None,
        max_bytes: Optional[int] = None,
        verbose: bool = True,
        compute_dtype=jnp.float32,
    ) -> "FeatureCache":
        """``compute_dtype`` is the dtype the encoder forward runs in — pass
        the training step's compute dtype so cached and in-graph training see
        identical features. ``dtype`` (storage) defaults to fp32 for CLS
        features (tiny) and, for full-sequence features, to bf16 *when the
        encoder computed in bf16* (the cast then loses nothing the training
        step ever saw) and fp32 otherwise. ``max_bytes`` is a hard host-RAM
        bound checked against U × S × H *before* any encode work; exceeding
        it raises :class:`FeatureCacheTooLarge`."""
        unique_paths: List[str] = sorted(set(dataset.image_paths))
        path_to_row = {p: i for i, p in enumerate(unique_paths)}
        pre = dataset.preprocessor

        full_seq = mcfg.memory_mode != "cls"
        if dtype is None:
            bf16_computed = jnp.dtype(compute_dtype) == jnp.dtype(jnp.bfloat16)
            dtype = (
                ml_dtypes.bfloat16 if (full_seq and bf16_computed)
                else np.float32
            )
        seq = mcfg.vision.seq_len if full_seq else 1
        est_bytes = (
            len(unique_paths) * seq * mcfg.vision.hidden_size
            * np.dtype(dtype).itemsize
        )
        if max_bytes is not None and est_bytes > max_bytes:
            raise FeatureCacheTooLarge(
                f"feature cache would need {est_bytes / 1e9:.2f} GB "
                f"({len(unique_paths)} images x {seq} x "
                f"{mcfg.vision.hidden_size} @ {np.dtype(dtype).name}) "
                f"> max_bytes={max_bytes / 1e9:.2f} GB"
            )

        # params as jit argument (a closure constant would be baked into the
        # compiled program and stall compilation for real-size encoders)
        encode_fn = jax.jit(
            lambda p, px: encode_images({"encoder": p}, mcfg, px,
                                        compute_dtype=compute_dtype)
        )
        encode = lambda px: encode_fn(encoder_params, px)

        native = getattr(dataset, "native_loader", None)

        failed = set()

        def load(path):
            try:
                if native is not None:
                    return native.load_path(path)
                from PIL import Image

                with Image.open(path) as im:
                    return pre(im)
            except Exception:
                failed.add(path)    # set.add is GIL-atomic
                return np.zeros(pre.output_shape, np.float32)

        rows = []
        with ThreadPoolExecutor(max(1, num_workers)) as pool:
            for i in range(0, len(unique_paths), batch_size):
                chunk = unique_paths[i : i + batch_size]
                pixels = np.stack(list(pool.map(load, chunk)))
                # pad to full batch so the encode jit compiles once
                if len(chunk) < batch_size:
                    pad = batch_size - len(chunk)
                    pixels = np.concatenate(
                        [pixels, np.zeros((pad, *pixels.shape[1:]), pixels.dtype)]
                    )
                feats = np.asarray(encode(jnp.asarray(pixels)))[: len(chunk)]
                rows.append(feats.astype(dtype))
                if verbose and (i // batch_size) % 20 == 0:
                    print(
                        f"\r  feature cache: {min(i + batch_size, len(unique_paths))}"
                        f"/{len(unique_paths)} images",
                        end="",
                    )
        if verbose:
            print()
        return cls(np.concatenate(rows, axis=0), path_to_row, failed)

    def lookup(self, paths: List[str]) -> np.ndarray:
        """(B, S, H_enc) features for a batch of image paths, in the
        cache's own dtype (upcasting a bf16 full-sequence cache here would
        double the host RAM and H2D bytes per batch just for the train
        step to cast straight back down — the step handles the cast).

        Unknown paths (e.g. the dataset's dummy-item marker for corrupt
        images) resolve to zero features.
        """
        b = len(paths)
        out = np.zeros((b, *self.features.shape[1:]), self.features.dtype)
        for i, p in enumerate(paths):
            row = self.path_to_row.get(p)
            if row is not None:
                out[i] = self.features[row]
        return out

    @property
    def nbytes(self) -> int:
        return self.features.nbytes


def attach_features(batch: dict, cache: Optional[FeatureCache]) -> dict:
    """Replace images with cached features in a loader batch (pads rows of a
    partial batch get zero features — their targets are all-PAD anyway)."""
    if cache is None:
        return batch
    feats = cache.lookup(batch["image_paths"])
    b = batch["decoder_input_tokens"].shape[0]
    if feats.shape[0] < b:  # batch was padded to static size
        feats = np.concatenate(
            [feats, np.zeros((b - feats.shape[0], *feats.shape[1:]), feats.dtype)]
        )
    out = dict(batch)
    out["features"] = feats
    out.pop("images", None)     # absent on the text-only loader path
    return out
