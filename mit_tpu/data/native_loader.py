"""ctypes binding for the C++ JPEG decode + preprocess pipeline.

Drop-in alternative to :class:`mit_tpu.data.preprocess.HostPreprocessor`
for JPEG files: decode, PIL-compatible antialiased resize (+ CLIP-style
shortest-edge/crop), rescale and normalize happen in one native call with
the GIL released — the loader's worker threads parallelize for real.
Non-JPEG inputs and decode failures fall back to the PIL path / the
dataset's dummy-item handling.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Union

import numpy as np

from mit_tpu.data.preprocess import HostPreprocessor, spec_for_encoder

_NATIVE_DIR = os.path.abspath(
    os.path.join(os.path.dirname(__file__), "..", "..", "native")
)
_LIB_PATH = os.path.join(_NATIVE_DIR, "libimage_loader.so")

_lib = None


def _get_lib():
    global _lib
    if _lib is None:
        if not os.path.exists(_LIB_PATH):
            subprocess.run(
                ["make", "-C", _NATIVE_DIR], check=True, capture_output=True
            )
        lib = ctypes.CDLL(_LIB_PATH)
        lib.img_preprocess_jpeg.restype = ctypes.c_int32
        lib.img_preprocess_jpeg.argtypes = [
            ctypes.c_char_p, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
            ctypes.c_int32, ctypes.c_int32,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float),
        ]
        _lib = lib
    return _lib


def native_available() -> bool:
    try:
        _get_lib()
        return True
    except Exception:
        return False


class NativeImageLoader:
    """C++ JPEG preprocessing with PIL fallback; HostPreprocessor-compatible."""

    def __init__(self, encoder_name: str, image_size: Optional[int] = None):
        self.spec = spec_for_encoder(encoder_name)
        if image_size is not None and image_size != self.spec.target[0]:
            self.spec = self.spec._replace(target=(image_size, image_size))
        self._fallback = HostPreprocessor(encoder_name, image_size)
        self._mean = (ctypes.c_float * 3)(*self.spec.mean)
        self._std = (ctypes.c_float * 3)(*self.spec.std)
        self._resample = 0 if self.spec.resample == "bilinear" else 1
        self._mode = 0 if self.spec.mode == "fixed" else 1
        self._lib = _get_lib()

    @property
    def output_shape(self):
        return (3, *self.spec.target)

    def load_jpeg_bytes(self, data: bytes) -> np.ndarray:
        th, tw = self.spec.target
        out = np.empty((3, th, tw), np.float32)
        rc = self._lib.img_preprocess_jpeg(
            data, len(data), th, tw, self._resample, self._mode,
            self._mean, self._std,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        )
        if rc != 0:
            raise ValueError(f"JPEG decode failed (code {rc})")
        return out

    def load_path(self, path: str) -> np.ndarray:
        low = path.lower()
        if low.endswith((".jpg", ".jpeg")):
            with open(path, "rb") as f:
                return self.load_jpeg_bytes(f.read())
        from PIL import Image

        with Image.open(path) as im:
            return self._fallback(im)

    def __call__(self, image_or_path: Union[str, "object"]) -> np.ndarray:
        if isinstance(image_or_path, (str, os.PathLike)):
            return self.load_path(str(image_or_path))
        return self._fallback(image_or_path)
