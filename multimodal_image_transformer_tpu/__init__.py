"""Name-compliant alias package: ``multimodal_image_transformer_tpu``.

The implementation lives in the shorter importable package :mod:`mit_tpu`
(the project brief's literal directory name contains dashes, which Python
packages cannot carry). This alias re-exports the full namespace so both
import paths work:

    import multimodal_image_transformer_tpu as mit
    from multimodal_image_transformer_tpu.models.decoder import decoder_forward
"""

import importlib
import sys

import mit_tpu as _impl

__version__ = _impl.__version__

_submodules = [
    "config", "text", "ops", "models", "data", "train", "decode",
    "parallel", "eval", "utils",
]
for _name in _submodules:
    _mod = importlib.import_module(f"mit_tpu.{_name}")
    sys.modules[f"{__name__}.{_name}"] = _mod
    globals()[_name] = _mod
