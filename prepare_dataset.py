#!/usr/bin/env python
"""Root entry point: ``python prepare_dataset.py`` — downloads and prepares
Flickr30k (reference prepare_dataset.py:324-582 flow)."""
from mit_tpu.config import CONFIG
from mit_tpu.data.prepare import prepare_flickr30k

if __name__ == "__main__":
    ok = prepare_flickr30k(CONFIG)
    raise SystemExit(0 if ok else 1)
