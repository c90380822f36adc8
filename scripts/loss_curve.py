#!/usr/bin/env python
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
"""Loss-curve parity runbook (BASELINE.md training anchor).

The reference's only quantitative training record is the val-CE trajectory
embedded in its checkpoint filenames: 3.0019 -> 2.5425 over 10 epochs of
Flickr30k with ViT-B/16 (reference run_batch_test.sh:7-16). This script
reproduces that run with the reference's exact hyperparameters
(config.py:57-93: batch 32, AdamW lr 1e-4 betas (0.9, 0.98) eps 1e-9,
wd 1e-5, clip 5.0, 6-layer/512-dim decoder, vocab 10k) and records the
curve for comparison.

Modes:
- REAL:    `--data_dir` points at a prepared Flickr30k (images/ +
           captions.json). Network egress is blocked in the build
           environment and prepare_flickr30k cannot download here, so this
           mode runs the moment data access exists — that is the documented
           blocker, not a missing capability.
- FIXTURE: no real data -> a deterministic mini-Flickr stand-in is
           fabricated from a fixed seed (compositional scene captions with
           Zipf-like vocabulary over structured images), and the curve is
           recorded the same way. This validates the full runbook path
           end-to-end; the absolute values are not comparable to Flickr30k.

Output: JSON {mode, epochs: [{epoch, train_loss, val_loss}], reference
curve} to --output (default loss_curve.json) plus a side-by-side table.
"""

import argparse
import json
import os
import sys

REFERENCE_CURVE = [
    3.0019, 2.8036, 2.7074, 2.6526, 2.6176,
    2.5925, 2.5645, 2.5563, 2.5503, 2.5425,
]  # reference run_batch_test.sh:7-16 (ViT-B/16 run)


def fabricate_mini_flickr(root: str, n_images: int = 400, caps_per: int = 5):
    """Deterministic compositional dataset: scenes of colored shapes with
    template captions — learnable structure + long-tail word noise, so the
    val curve decreases smoothly like real caption data."""
    import numpy as np
    from PIL import Image, ImageDraw

    rng = np.random.default_rng(1234)
    img_dir = os.path.join(root, "images")
    os.makedirs(img_dir, exist_ok=True)
    colors = {
        "red": (220, 40, 40), "blue": (40, 70, 220), "green": (40, 180, 60),
        "yellow": (230, 210, 40), "purple": (150, 50, 190),
        "orange": (240, 140, 30), "white": (240, 240, 240),
        "black": (25, 25, 25),
    }
    shapes = ["circle", "square", "triangle"]
    sizes = ["small", "large"]
    positions = ["left", "right", "top", "bottom"]
    fillers = ["bright", "plain", "shiny", "dark", "odd", "nice", "big",
               "tiny", "round", "flat"]
    captions = {}
    for i in range(n_images):
        color = rng.choice(list(colors))
        shape = rng.choice(shapes)
        size = rng.choice(sizes)
        pos = rng.choice(positions)
        img = Image.new(
            "RGB", (224, 224),
            tuple(int(x) for x in rng.integers(90, 150, 3)),
        )
        d = ImageDraw.Draw(img)
        r = 40 if size == "small" else 75
        cx = {"left": 60, "right": 164, "top": 112, "bottom": 112}[pos]
        cy = {"left": 112, "right": 112, "top": 60, "bottom": 164}[pos]
        box = (cx - r, cy - r, cx + r, cy + r)
        if shape == "circle":
            d.ellipse(box, fill=colors[color])
        elif shape == "square":
            d.rectangle(box, fill=colors[color])
        else:
            d.polygon([(cx, cy - r), (cx - r, cy + r), (cx + r, cy + r)],
                      fill=colors[color])
        name = f"mini_{i:05d}.jpg"
        img.save(os.path.join(img_dir, name), quality=92)
        caps = []
        for _ in range(caps_per):
            extra = rng.choice(fillers)
            template = rng.integers(0, 3)
            if template == 0:
                c = f"a {size} {color} {shape} on the {pos} side"
            elif template == 1:
                c = f"the {extra} {color} {shape} sits at the {pos}"
            else:
                c = f"a {extra} {size} {shape} colored {color}"
            caps.append(c)
        captions[name] = caps
    with open(os.path.join(root, "captions.json"), "w") as f:
        json.dump(captions, f)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data_dir", default=None,
                    help="Prepared Flickr30k dir (images/ + captions.json). "
                         "Absent/unprepared -> deterministic mini fixture.")
    ap.add_argument("--epochs", type=int, default=10)
    ap.add_argument("--batch_size", type=int, default=32)
    ap.add_argument("--output", default="loss_curve.json")
    ap.add_argument("--fixture_dir", default="/tmp/mit_mini_flickr")
    ap.add_argument("--fixture_images", type=int, default=400)
    args = ap.parse_args()

    from mit_tpu.config import Config
    from mit_tpu.data.prepare import check_dataset_exists
    from mit_tpu.train.loop import train

    mode = "real"
    data_dir = args.data_dir
    if data_dir is None or not check_dataset_exists(
        Config(DATA_DIR=data_dir)
    ):
        mode = "fixture"
        data_dir = args.fixture_dir
        if not check_dataset_exists(Config(DATA_DIR=data_dir)):
            print(f"Fabricating deterministic mini-Flickr at {data_dir} ...")
            fabricate_mini_flickr(data_dir, args.fixture_images)
        print(
            "NOTE: running in FIXTURE mode (real Flickr30k not present; "
            "network egress is blocked in this environment). Rerun with "
            "--data_dir <prepared_flickr30k> for the parity anchor."
        )

    # Reference hyperparameters (reference config.py:57-93) — only the
    # epoch count is taken from the CLI.
    cfg = Config(
        DATA_DIR=data_dir,
        NUM_EPOCHS=args.epochs,
        BATCH_SIZE=args.batch_size,
        VALIDATION_INTERVAL=1,
        HF_UPLOAD_BEST_CHECKPOINTS=False,
    )
    summary = train(cfg, auto_prepare=False, wandb_enabled=False)

    curve = [
        {"epoch": e["epoch"], "train_loss": round(e["train_loss"], 4),
         "val_loss": round(e.get("val_loss", float("nan")), 4)}
        for e in summary["epochs"]
    ]
    out = {
        "mode": mode,
        "data_dir": data_dir,
        "epochs": curve,
        "reference_val_curve": REFERENCE_CURVE,
        "reference_source": "reference run_batch_test.sh:7-16",
    }
    with open(args.output, "w") as f:
        json.dump(out, f, indent=2)

    print(f"\n{'epoch':>5} {'val CE (ours)':>14} {'val CE (reference)':>19}")
    for i, e in enumerate(curve):
        ref = REFERENCE_CURVE[i] if i < len(REFERENCE_CURVE) else float("nan")
        print(f"{e['epoch']:>5} {e['val_loss']:>14.4f} {ref:>19.4f}")
    print(f"\nCurve written to {args.output} (mode={mode}).")
    if mode == "fixture":
        print("Parity vs the reference curve requires real Flickr30k data.")
    return 0


if __name__ == "__main__":
    sys.exit(main())
