"""Image-caption dataset: flattening, tokenization, fixed-shape batching.

Reference: dataset.py:29-206 (``ImageTextDataset`` + ``collate_fn``).
Behaviors preserved:
- one example per (image, caption) pair — an image with 5 captions yields 5
  examples (reference dataset.py:78-102);
- missing image files and non-string captions are skipped with warnings;
- corrupt images at read time yield a dummy black image + all-PAD caption
  instead of raising (reference dataset.py:117-130);
- truncated captions are forced to end with END (reference dataset.py:152-174
  — with the ID-mismatch bug fixed: END here is the *tokenizer's* END);
- teacher-forcing shift in batching: input = cap[:, :-1], target = cap[:, 1:]
  (reference dataset.py:195-197).

TPU-first re-design:
- every batch has the static shape (B, MAX_SEQ_LEN-1); the final partial
  batch is padded with dummy all-PAD rows (zero loss contribution under
  PAD-masked CE) so XLA compiles exactly one step shape;
- loading/preprocessing runs in a thread pool that prefetches ahead of the
  accelerator (replacing torch DataLoader worker processes,
  reference train.py:282-297 — threads suffice since PIL decode releases
  the GIL).
"""

from __future__ import annotations

import json
import os
import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Dict, Iterator, List, Optional, Sequence, Tuple

import numpy as np

from mit_tpu.config import Config
from mit_tpu.data.preprocess import HostPreprocessor
from mit_tpu.text.tokenizer import Tokenizer


class ImageTextDataset:
    """Flattened (image, caption) pairs with lazy per-item preprocessing."""

    def __init__(
        self,
        image_dir: str,
        captions_file: str,
        max_seq_len: int,
        tokenizer: Tokenizer,
        encoder_name: str,
        verbose: bool = True,
        use_native_loader: bool = True,
    ):
        self.image_dir = image_dir
        self.max_seq_len = max_seq_len
        self.tokenizer = tokenizer
        self.preprocessor = HostPreprocessor(encoder_name)
        # C++ JPEG decode+preprocess fast path (GIL-releasing), PIL fallback
        self.native_loader = None
        if use_native_loader:
            try:
                from mit_tpu.data.native_loader import NativeImageLoader

                self.native_loader = NativeImageLoader(encoder_name)
            except Exception:
                self.native_loader = None

        self.image_paths: List[str] = []
        self.captions: List[str] = []

        try:
            with open(captions_file, "r", encoding="utf-8") as f:
                captions_data = json.load(f)
        except FileNotFoundError:
            if verbose:
                print(f"Error: Captions file not found at {captions_file}. "
                      "Dataset will be empty.")
            return
        except json.JSONDecodeError:
            if verbose:
                print(f"Error: Could not decode JSON from {captions_file}. "
                      "Dataset will be empty.")
            return

        if not isinstance(captions_data, dict):
            if verbose:
                print(f"Error: Captions data from {captions_file} is not a dict.")
            return

        for filename, caption_list in captions_data.items():
            img_path = os.path.join(image_dir, filename)
            if not os.path.exists(img_path):
                if verbose:
                    print(f"Warning: image listed in captions but not found: "
                          f"{img_path}. Skipping.")
                continue
            if isinstance(caption_list, str):
                caption_list = [caption_list]
            for caption in caption_list:
                if isinstance(caption, str):
                    self.image_paths.append(img_path)
                    self.captions.append(caption)
                elif verbose:
                    print(f"Warning: non-string caption for {filename}: "
                          f"{caption!r}. Skipping.")

        if verbose:
            print(f"Loaded {len(self.image_paths)} image-caption pairs.")

    def __len__(self) -> int:
        return len(self.image_paths)

    # ------------------------------------------------------------------
    def encode_caption(self, caption: str) -> np.ndarray:
        """Tokenize + pad/truncate with END-forcing, shape (MAX_SEQ_LEN,).

        The tokenizer already reserves room for START/END and pads
        (text/tokenizer.py); END-forcing is then guaranteed by construction —
        this wrapper re-asserts it for captions at exactly max length
        (the intent of reference dataset.py:163-167).
        """
        ids = self.tokenizer.encode(caption)
        ids = np.asarray(ids[: self.max_seq_len], dtype=np.int32)
        if ids[-1] != self.tokenizer.pad_id and ids[-1] != self.tokenizer.end_id:
            ids[-1] = self.tokenizer.end_id
        return ids

    def text_item(self, idx: int, bad_paths=None) -> Dict:
        """Item without pixel work — for cached-feature training, where the
        encoder (and thus the image) never enters the step. ``bad_paths``
        are images that failed decoding at cache-build time; they keep the
        reference's corrupt-image semantics (dummy all-PAD item → zero loss,
        reference dataset.py:117-130)."""
        img_path = self.image_paths[idx]
        if bad_paths and img_path in bad_paths:
            return {
                "image_path": "error_loading_image_path",
                "caption_tokens": np.full(
                    (self.max_seq_len,), self.tokenizer.pad_id, np.int32
                ),
            }
        return {
            "image_path": img_path,
            "caption_tokens": self.encode_caption(self.captions[idx]),
        }

    def __getitem__(self, idx: int) -> Dict:
        img_path = self.image_paths[idx]
        caption = self.captions[idx]
        try:
            if self.native_loader is not None:
                image = self.native_loader.load_path(img_path)
            else:
                from PIL import Image

                with Image.open(img_path) as im:
                    image = self.preprocessor(im)
        except Exception as e:  # corrupt image → dummy item, never raise
            print(f"Error loading image {img_path}: {e}. Returning a dummy item.")
            image = np.zeros(self.preprocessor.output_shape, np.float32)
            return {
                "image_path": "error_loading_image_path",
                "image": image,
                "caption_tokens": np.full(
                    (self.max_seq_len,), self.tokenizer.pad_id, np.int32
                ),
            }
        return {
            "image_path": img_path,
            "image": image,
            "caption_tokens": self.encode_caption(caption),
        }


# ----------------------------------------------------------------------
def split_indices(
    n: int, train_ratio: float, seed: int
) -> Tuple[np.ndarray, np.ndarray]:
    """Deterministic train/val split (reference train.py:275-277 random_split)."""
    perm = np.random.default_rng(seed).permutation(n)
    k = int(train_ratio * n)
    return perm[:k], perm[k:]


def collate(items: Sequence[Dict], pad_id: int, batch_size: int) -> Dict:
    """Stack items; teacher-forcing shift; pad to static batch size.

    Returns fixed-shape arrays:
      images          (B, 3, H, W)
      decoder_input   (B, MAX_SEQ_LEN-1)
      target          (B, MAX_SEQ_LEN-1)
      valid           (B,) bool — False for padding rows of a partial batch
    """
    n = len(items)
    caps = np.stack([it["caption_tokens"] for it in items])
    if n < batch_size:
        caps = np.concatenate(
            [caps, np.full((batch_size - n, caps.shape[1]), pad_id, caps.dtype)]
        )
    valid = np.arange(batch_size) < n
    out = {
        "image_paths": [it["image_path"] for it in items],
        "decoder_input_tokens": caps[:, :-1],
        "target_tokens": caps[:, 1:],
        "valid": valid,
    }
    if "image" in items[0]:       # absent on the text-only (cached) path
        images = np.stack([it["image"] for it in items])
        if n < batch_size:
            images = np.concatenate(
                [images,
                 np.zeros((batch_size - n, *images.shape[1:]), images.dtype)]
            )
        out["images"] = images
    return out


def prefetch_to_device(iterator, transform=None, depth: int = 2):
    """Keep ``depth`` transformed batches in flight ahead of the consumer.

    JAX dispatch is async, so simply *issuing* the device_put/transform for
    the next batch before yielding the current one overlaps host batch
    assembly + H2D transfer with device compute (the reference relies on
    DataLoader workers + pinned memory for the same overlap,
    reference train.py:282-297).
    """
    import collections

    buf = collections.deque()
    for item in iterator:
        buf.append(transform(item) if transform else item)
        if len(buf) >= depth:
            yield buf.popleft()
    while buf:
        yield buf.popleft()


class Loader:
    """Prefetching batch iterator over a dataset subset.

    Replaces torch DataLoader (reference train.py:282-297): ``num_workers``
    preprocessing threads keep ``prefetch`` batches ready ahead of the
    consumer.
    """

    def __init__(
        self,
        dataset: ImageTextDataset,
        indices: np.ndarray,
        batch_size: int,
        shuffle: bool,
        seed: int = 0,
        num_workers: int = 2,
        prefetch: int = 4,
        drop_last: bool = False,
        shard_index: int = 0,
        shard_count: int = 1,
        load_images: bool = True,
        bad_paths=None,
    ):
        """``shard_index``/``shard_count`` partition the index set across
        hosts for multi-host data-parallel training (each process loads a
        disjoint 1/Nth of the data; the device mesh handles the rest).

        ``load_images=False`` skips JPEG decode + resize entirely (batches
        carry only tokens + paths) — used when training from cached
        encoder features, where pixels never reach the step. ``bad_paths``
        forwards cache-build decode failures to keep dummy-item semantics.
        """
        self.dataset = dataset
        indices = np.asarray(indices)
        if shard_count > 1:
            indices = indices[shard_index::shard_count]
        self.indices = indices
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.num_workers = max(1, num_workers)
        self.prefetch = prefetch
        self.drop_last = drop_last
        self.load_images = load_images
        self.bad_paths = bad_paths
        self._epoch = 0

    def __len__(self) -> int:
        n = len(self.indices)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _batches(self) -> Iterator[np.ndarray]:
        order = self.indices
        if self.shuffle:
            order = order[
                np.random.default_rng(self.seed + self._epoch).permutation(len(order))
            ]
        for i in range(0, len(order), self.batch_size):
            chunk = order[i : i + self.batch_size]
            if self.drop_last and len(chunk) < self.batch_size:
                return
            yield chunk

    def __iter__(self) -> Iterator[Dict]:
        self._epoch += 1
        pad_id = self.dataset.tokenizer.pad_id
        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        if self.load_images:
            fetch = self.dataset.__getitem__
        else:
            fetch = lambda i: self.dataset.text_item(i, self.bad_paths)

        def produce():
            with ThreadPoolExecutor(self.num_workers) as pool:
                try:
                    for chunk in self._batches():
                        if stop.is_set():
                            return
                        items = list(pool.map(fetch, chunk))
                        q.put(collate(items, pad_id, self.batch_size))
                finally:
                    q.put(None)

        t = threading.Thread(target=produce, daemon=True)
        t.start()
        try:
            while True:
                batch = q.get()
                if batch is None:
                    break
                yield batch
        finally:
            stop.set()
            # drain so the producer can exit
            while not q.empty():
                try:
                    q.get_nowait()
                except queue.Empty:
                    break
