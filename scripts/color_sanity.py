#!/usr/bin/env python
"""End-to-end learning sanity: train on a learnable synthetic dataset and
verify the model actually captions from image content.

Generates 8 solid-color image classes (50 noisy instances each) captioned
"a {color} square on the screen", trains the default ViT-B/16 + 6-layer
decoder stack, and evaluates BLEU-4 on the held-out split. A healthy
framework reaches **BLEU-4 = 1.0** in ~12 epochs (~2 min on a v5e chip):
the frozen random-init encoder's CLS features separate colors, and the
trainable projection + decoder learn to route that information through
cross-attention into correct captions.

This validates what loss-only checks cannot: image information really flows
vision→projection→cross-attention→tokens (a decoder ignoring the image
would plateau at the marginal caption entropy ≈ ln 8 ≈ 2.08).

Usage: python scripts/color_sanity.py [workdir]
"""

import json
import os
import subprocess
import sys

import numpy as np
from PIL import Image

COLORS = {
    "red": (220, 30, 30), "green": (30, 200, 30), "blue": (40, 40, 220),
    "yellow": (230, 230, 30), "purple": (160, 40, 200),
    "orange": (240, 140, 20), "white": (235, 235, 235), "black": (25, 25, 25),
}


def main():
    workdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/color_sanity"
    data = os.path.join(workdir, "")
    os.makedirs(os.path.join(data, "images"), exist_ok=True)
    rng = np.random.default_rng(0)
    caps = {}
    for cname, rgb in COLORS.items():
        for i in range(50):
            base = np.asarray(rgb, np.int16)
            img = np.clip(
                base + rng.integers(-25, 25, (224, 224, 3)), 0, 255
            ).astype(np.uint8)
            name = f"{cname}_{i:02d}.jpg"
            Image.fromarray(img).save(
                os.path.join(data, "images", name), quality=92
            )
            caps[name] = [f"a {cname} square on the screen"]
    with open(os.path.join(data, "captions.json"), "w") as f:
        json.dump(caps, f)
    print(f"dataset: {len(caps)} images in {data}")

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    run = lambda *args: subprocess.run(
        [sys.executable, *args], cwd=root, check=True
    )
    # resume state skipped (--train_state_interval 100): a 2-minute sanity
    # run never resumes, and the optimizer-state fetch dominates wall time
    # on a tunneled device
    run("train.py", "--data_dir", data, "--epochs", "12", "--batch_size",
        "32", "--learning_rate", "3e-4", "--no_prepare", "--no_wandb",
        "--train_state_interval", "100")
    import glob

    ckpt = max(glob.glob(os.path.join(data, "*.safetensors")),
               key=os.path.getmtime)
    run("evaluate.py", "--checkpoint_path", ckpt, "--data_dir", data)


if __name__ == "__main__":
    main()
