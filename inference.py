#!/usr/bin/env python
"""Root entry point: ``python inference.py --image_path X`` — mirrors the
reference's captioning CLI surface (reference inference.py:131-155)."""
from mit_tpu.decode.cli import main

if __name__ == "__main__":
    raise SystemExit(main())
