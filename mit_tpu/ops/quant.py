"""int8 quantized matmul path for the frozen vision encoder.

The reference runs its frozen encoder in fp32 under ``torch.no_grad``
(reference model.py:133-136); the encoder is *frozen*, which makes it the
textbook post-training-quantization target: weights are static (quantize
once, offline) and no gradients ever flow through it.

TPU-native rationale: the v5e MXU runs int8 at 2x the bf16 peak
(394 vs 197 TOPS). Measured on this chip with 4096-cube dependent GEMM
chains: bf16 167.8 TFLOP/s vs int8 288.4 TOP/s — 1.72x. ~96% of ViT
encoder FLOPs are plain GEMMs (QKV/out projections, MLP, patch embed), so
routing those through int8 buys a large slice of that factor end to end.

Scheme (standard symmetric PTQ, e.g. LLM.int8 / AQT-style):
- weights:      per-output-channel symmetric int8, scale = max|w| / 127,
                quantized ONCE at load time;
- activations:  per-token (row) dynamic symmetric int8 at runtime;
- accumulation: int32 on the MXU (exact), rescaled to the compute dtype by
                the rank-1 outer product of the two scales.

Everything else (layernorm, softmax/attention, GELU, residuals) stays in
bf16/fp32 — this is W8A8 on the GEMMs only.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class QuantizedLinear(NamedTuple):
    """int8 weight + per-output-channel scale (+ optional f32 bias).

    ``w8``: (..., K, N) int8; ``scale``: (..., N) f32 such that
    ``w ≈ w8 * scale`` broadcast over K. Leading dims batch layers for
    ``lax.scan`` stacks.
    """

    w8: jnp.ndarray
    scale: jnp.ndarray
    bias: jnp.ndarray | None = None


def quantize_weight(w: jnp.ndarray, bias: jnp.ndarray | None = None,
                    ) -> QuantizedLinear:
    """Per-output-channel symmetric int8 quantization of (..., K, N)."""
    wf = w.astype(jnp.float32)
    amax = jnp.max(jnp.abs(wf), axis=-2)                  # (..., N)
    scale = jnp.maximum(amax, 1e-8) / 127.0
    w8 = jnp.clip(jnp.round(wf / scale[..., None, :]), -127, 127).astype(
        jnp.int8
    )
    return QuantizedLinear(
        w8, scale, None if bias is None else bias.astype(jnp.float32)
    )


def dynamic_quantize(x: jnp.ndarray):
    """Per-row (token) symmetric int8: x (..., K) → (x8 int8, sx (..., 1))."""
    xf = x.astype(jnp.float32)
    amax = jnp.maximum(jnp.max(jnp.abs(xf), axis=-1, keepdims=True), 1e-8)
    # reciprocal-multiply form (one divide per row, not per element) —
    # keep in lockstep with pallas_int8_mlp._quantize_rows so the XLA and
    # kernel int8 paths quantize bit-identically
    inv = 127.0 / amax
    x8 = jnp.clip(jnp.round(xf * inv), -127, 127).astype(jnp.int8)
    return x8, amax * (1.0 / 127.0)


def int8_matmul(x: jnp.ndarray, q: QuantizedLinear, out_dtype=jnp.bfloat16,
                ) -> jnp.ndarray:
    """x (..., T, K) @ dequant(q) → (..., T, N) in ``out_dtype``.

    Dynamically quantizes the activation rows, runs the int8xint8→int32
    GEMM on the MXU, and rescales with the rank-1 scale outer product.
    Weight leading dims beyond (K, N) are layer-stack batch dims and must
    match x's leading dims; a plain (K, N) weight applies to x of any rank.
    """
    x8, sx = dynamic_quantize(x)
    nb = q.w8.ndim - 2
    acc = jax.lax.dot_general(
        x8, q.w8,
        (((x8.ndim - 1,), (q.w8.ndim - 2,)),
         (tuple(range(nb)), tuple(range(nb)))),
        preferred_element_type=jnp.int32,
    )                                                      # (..., T, N) int32
    out = acc.astype(jnp.float32) * (sx * q.scale[..., None, :])
    if q.bias is not None:
        out = out + q.bias[..., None, :]
    return out.astype(out_dtype)
