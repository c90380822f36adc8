#!/usr/bin/env python
"""Per-attribute diagnosis for the compositional quality gate.

The gate's learned-floor margin sits at ~0.008 over the 0.5 BLEU floor
(VERDICT r4 weak #3a), and train-val BLEU ~= held-out BLEU — the
signature of a REPRESENTATION ceiling (the frozen random-init encoder's
CLS feature doesn't carry some attribute), not underfitting. This tool
locates the ceiling: it captions every image in the gate workdir's
train/ and heldout/ splits, parses ground truth from the filename
(``{color}_{shape}_{pos-with-dashes}_{i}.jpg``), and reports per-
attribute accuracy plus a confusion matrix for the weakest attribute.

Usage: python scripts/gate_diagnose.py [workdir] [--encoder_quant Q]
Prints one JSON line.
"""
import argparse
import glob
import json
import os
import sys
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

COLORS = ("red", "green", "blue", "yellow", "purple", "orange", "white",
          "black")
SHAPES = ("square", "circle", "triangle", "cross", "ring")
POSITIONS = ("top left", "top right", "bottom left", "bottom right")


def parse_name(path):
    stem = os.path.basename(path).rsplit(".", 1)[0]
    color, shape, pos, _ = stem.split("_")
    return color, shape, pos.replace("-", " ")


def parse_pred(caption):
    """Extract (color, shape, position) mentions from a predicted caption."""
    toks = caption.lower().split()
    color = next((t for t in toks if t in COLORS), None)
    shape = next((t for t in toks if t in SHAPES), None)
    pos = None
    for i in range(len(toks) - 1):
        cand = f"{toks[i]} {toks[i + 1]}"
        if cand in POSITIONS:
            pos = cand
            break
    return color, shape, pos


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("workdir", nargs="?", default="/tmp/comp_gate")
    ap.add_argument("--encoder_quant", default="none")
    ap.add_argument("--batch_size", type=int, default=64)
    args = ap.parse_args()

    from mit_tpu.config import CONFIG
    from mit_tpu.decode.api import load_captioner
    from PIL import Image

    train_dir = os.path.join(args.workdir, "train")

    def val_of(path):
        stem = os.path.basename(path).rsplit(".safetensors", 1)[0]
        try:
            return float(stem.rsplit("val_loss_", 1)[1])
        except (IndexError, ValueError):
            return float("inf")

    ckpt = min(glob.glob(os.path.join(train_dir, "*.safetensors")),
               key=val_of)
    cfg = CONFIG.replace(DATA_DIR=train_dir + "/")
    captioner = load_captioner(ckpt, cfg, encoder_quant=args.encoder_quant)

    out = {"metric": "gate_diagnosis", "checkpoint": os.path.basename(ckpt),
           "encoder_quant": args.encoder_quant}
    for split in ("train", "heldout"):
        paths = sorted(glob.glob(
            os.path.join(args.workdir, split, "images", "*.jpg")))
        if not paths:
            continue
        preds = []
        for i in range(0, len(paths), args.batch_size):
            chunk = paths[i:i + args.batch_size]
            images = []
            for p in chunk:
                with Image.open(p) as im:
                    images.append(im.convert("RGB"))
            preds.extend(captioner.caption_batch(images, method="greedy"))
        acc = {k: 0 for k in ("color", "shape", "position", "exact")}
        confusion = Counter()
        lens = Counter()
        for p, pred in zip(paths, preds):
            gt = parse_name(p)
            pr = parse_pred(pred)
            for k, g, h in zip(("color", "shape", "position"), gt, pr):
                acc[k] += int(g == h)
            acc["exact"] += int(
                pred.strip().lower()
                == f"a {gt[0]} {gt[1]} in the {gt[2]}")
            confusion[(gt[1], pr[1] or "<none>")] += 1
            lens[len(pred.split())] += 1
        n = len(paths)
        out[split] = {
            "n": n,
            **{k: round(v / n, 4) for k, v in acc.items()},
            "caption_len_hist": dict(sorted(lens.items())),
            "shape_confusion": {
                f"{g}->{h}": c for (g, h), c in sorted(confusion.items())
                if g != h and c > 0},
        }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
