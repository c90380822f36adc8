#!/usr/bin/env python
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
"""End-to-end training LOOP throughput (host data path + device steps).

bench_train.py measures the raw jitted step on resident data; this script
measures what a user sees: the full `train()` loop over a fabricated
JPEG dataset — loader threads, feature cache, device feed, logging.
Fabricates U unique images x C captions, runs NUM_EPOCHS epochs, and
reports img/s of the post-compile epochs.

Env: MIT_BENCH_UNIQUE / MIT_BENCH_CAPS / MIT_BENCH_BATCH / MIT_BENCH_EPOCHS.
"""

import json
import os
import shutil
import tempfile
import time


def fabricate(root: str, unique: int, caps: int):
    import numpy as np
    from PIL import Image

    img_dir = os.path.join(root, "images")
    os.makedirs(img_dir, exist_ok=True)
    rng = np.random.default_rng(0)
    words = ["dog", "cat", "tree", "sky", "red", "blue", "runs", "sits",
             "park", "ball", "man", "woman", "water", "grass", "road"]
    captions = {}
    for i in range(unique):
        name = f"img_{i:05d}.jpg"
        arr = rng.integers(0, 256, (256, 256, 3), dtype=np.uint8)
        Image.fromarray(arr).save(os.path.join(img_dir, name), quality=85)
        captions[name] = [
            "a " + " ".join(rng.choice(words, size=6)) for _ in range(caps)
        ]
    with open(os.path.join(root, "captions.json"), "w") as f:
        json.dump(captions, f)


def main():
    from mit_tpu.config import Config
    from mit_tpu.train.loop import train

    unique = int(os.environ.get("MIT_BENCH_UNIQUE", 512))
    caps = int(os.environ.get("MIT_BENCH_CAPS", 4))
    batch = int(os.environ.get("MIT_BENCH_BATCH", 128))
    epochs = int(os.environ.get("MIT_BENCH_EPOCHS", 4))

    root = tempfile.mkdtemp(prefix="mit_loopbench_")
    try:
        t0 = time.time()
        fabricate(root, unique, caps)
        print(f"fabricated {unique}x{caps} dataset in {time.time()-t0:.1f}s")
        cfg = Config(
            DATA_DIR=root, BATCH_SIZE=batch, NUM_EPOCHS=epochs,
            VOCAB_SIZE=1000, PRETRAINED_ENCODER="off",
            VALIDATION_INTERVAL=epochs,      # one val pass, at the end
            HF_UPLOAD_BEST_CHECKPOINTS=False,
        )
        t0 = time.time()
        summary = train(cfg, auto_prepare=False, wandb_enabled=False)
        wall = time.time() - t0
        n_train = int(unique * caps * cfg.TRAIN_SPLIT_RATIO)
        # first epoch pays jit compile; steady state = later epochs. The
        # loop prints per-epoch img/s; recompute from the summary count.
        print(json.dumps({
            "metric": "train_loop_images_per_sec_per_chip",
            "epochs": epochs,
            "train_samples": n_train,
            "wall_seconds_total": round(wall, 1),
        }))
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
