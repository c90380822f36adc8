#!/usr/bin/env python
"""Evaluate a checkpoint: BLEU-4 + CIDEr-D on the validation split.

Usage: python evaluate.py --checkpoint_path ckpt.safetensors [--data_dir D]
       [--limit N] [--method greedy|beam]
"""

import argparse
import json
import os
import sys


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description="BLEU-4 caption evaluation.")
    parser.add_argument("--checkpoint_path", type=str, required=True)
    parser.add_argument("--data_dir", type=str, default=None)
    parser.add_argument("--limit", type=int, default=0,
                        help="Max unique images to evaluate (0 = all).")
    parser.add_argument("--method", type=str, default="greedy",
                        choices=["greedy", "beam"])
    parser.add_argument("--batch_size", type=int, default=32)
    parser.add_argument("--split", type=str, default="val",
                        choices=["val", "train", "all"])
    parser.add_argument("--encoder_quant", type=str, default="none",
                        choices=["none", "int8", "int8_defect"],
                        help="int8 = W8A8-quantize the frozen encoder at "
                        "load (quantified-quality evaluation). int8_defect "
                        "= int8 with a deliberate 2x fc2-scale corruption — "
                        "the quality gate's negative-control canary; never "
                        "a serving configuration.")
    args = parser.parse_args(argv)

    from mit_tpu.config import CONFIG
    from mit_tpu.data.dataset import ImageTextDataset, split_indices
    from mit_tpu.decode.api import load_captioner
    from mit_tpu.eval.bleu import evaluate_captioner

    cfg = CONFIG if args.data_dir is None else CONFIG.replace(DATA_DIR=args.data_dir)
    if not os.path.exists(args.checkpoint_path):
        print(f"Checkpoint not found: {args.checkpoint_path}", file=sys.stderr)
        return 1

    captioner = load_captioner(args.checkpoint_path, cfg,
                               encoder_quant=args.encoder_quant)
    cfg = captioner.cfg
    dataset = ImageTextDataset(
        cfg.IMAGE_DIR, cfg.CAPTIONS_FILE, cfg.MAX_SEQ_LEN,
        captioner.tokenizer, cfg.ENCODER_MODEL_NAME,
    )
    tr, va = split_indices(len(dataset), cfg.TRAIN_SPLIT_RATIO, cfg.RANDOM_SEED)
    idx = {"val": va, "train": tr, "all": range(len(dataset))}[args.split]
    paths = [dataset.image_paths[i] for i in idx]
    refs = {}
    for i in idx:
        refs.setdefault(dataset.image_paths[i], []).append(dataset.captions[i])

    result = evaluate_captioner(
        captioner, paths, refs, batch_size=args.batch_size,
        method=args.method, max_images=args.limit,
    )
    print(json.dumps({"split": args.split, "method": args.method,
                      "encoder_quant": args.encoder_quant, **result}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
