#!/usr/bin/env python
"""Root entry point: ``python train.py`` — mirrors the reference's training
CLI surface (reference train.py:489-490)."""
from mit_tpu.train.cli import main

if __name__ == "__main__":
    raise SystemExit(main())
