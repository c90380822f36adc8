"""Fused int8 (W8A8) transformer-MLP Pallas kernel.

Why a kernel: the naive XLA int8 path (ops/quant.py) LOSES to bf16 at
encoder shapes — measured 21.2 vs 19.5 ms per MLP block at (B·T, D, F) =
(201728, 768, 3072) — because every int8 GEMM materializes its int32
accumulator ((M, F), 4 B/elem — twice bf16's bytes) to HBM and the
dynamic-quantize passes re-read the activations. The 1.72x int8 MXU
advantage drowns in elementwise traffic.

This kernel keeps the ENTIRE MLP in VMEM per M-tile: the int8 weight
matrices are small enough to be fully resident (D*F bytes — 2.4 MB each
for ViT-B), so per (BM, D) row-tile it does

    rowmax-quantize x → int8 GEMM (MXU) → int32 acc in VMEM
    → scale + bias + GELU (f32, VPU) → rowmax-quantize
    → int8 GEMM (MXU) → scale + bias → bf16 out

and the only HBM traffic is x in (2 B/elem) and out (2 B/elem) — the
int32 accumulators, the (M, F) hidden activations, and the quantized
copies never leave the chip.

Numerics match the composition gelu(int8_matmul(x, q1)) @ int8_matmul
(ops/quant.py) to fp tolerance; weights use the same QuantizedLinear
(per-output-channel scales) produced by quantize_weight.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mit_tpu.ops.quant import QuantizedLinear


# odd-polynomial least-squares fit of erf(z) = z * P(z^2) on |z| <= 3
_ERF_C = (
    1.1265645860e+00, -3.6740184481e-01, 1.0037558057e-01,
    -1.8627491535e-02, 2.1716450163e-03, -1.4152522556e-04,
    3.8978985791e-06,
)


def _erf(z: jnp.ndarray) -> jnp.ndarray:
    """Elementwise erf — Mosaic has no erf/erfc lowering, so implement it.

    Odd polynomial on |z| <= 3, clamped outside (1 - erf(3) = 2.2e-5);
    max abs error ~1e-3. That error is far below the int8 requantization
    resolution the GELU output immediately passes through (half a quant
    step is amax/254, i.e. ~2e-2 for typical MLP activations), and it is
    2x cheaper on the VPU than the previous A&S 7.1.26 rational form —
    no exp, no divide (measured 3.8 -> ~1 ms/layer at ViT-B batch 1024).
    Every int8 kernel path (per-op MLP, mega-layer, split-layer) shares
    this function, so int8 paths stay mutually consistent.
    """
    z = jnp.clip(z, -3.0, 3.0)
    u = z * z
    c = _ERF_C
    p = c[6]
    for k in (5, 4, 3, 2, 1, 0):
        p = p * u + c[k]
    return z * p


def _gelu(x: jnp.ndarray) -> jnp.ndarray:
    return 0.5 * x * (1.0 + _erf(x * 0.7071067811865475))


def _quantize_rows(x: jnp.ndarray):
    """(BM, K) f32 → (int8, (BM, 1) f32 scale); same math as
    ops.quant.dynamic_quantize.

    The per-element ``x / sx`` is computed as ``x * (127 / amax)`` — one
    VPU divide per ROW instead of per element (f32 divide is a multi-op
    reciprocal sequence on the VPU; quantize runs on every GEMM input in
    the int8 path, ~2M elements per mega-kernel instance). The two forms
    round identically except at half-ulp boundaries of the scale itself.
    """
    amax = jnp.maximum(jnp.max(jnp.abs(x), axis=1, keepdims=True), 1e-8)
    inv = 127.0 / amax
    x8 = jnp.clip(jnp.round(x * inv), -127, 127).astype(jnp.int8)
    return x8, amax * (1.0 / 127.0)


def _mlp_kernel(x_ref, w1_ref, s1_ref, b1_ref, w2_ref, s2_ref, b2_ref,
                o_ref, *, act: str):
    x = x_ref[:].astype(jnp.float32)                       # (BM, D)
    x8, sx = _quantize_rows(x)
    acc1 = jax.lax.dot_general(
        x8, w1_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )                                                      # (BM, F) int32
    h = acc1.astype(jnp.float32) * (sx * s1_ref[0, :][None, :])
    h = h + b1_ref[0, :][None, :]
    if act == "gelu":
        h = _gelu(h)
    elif act == "quick_gelu":
        h = h * jax.nn.sigmoid(1.702 * h)
    elif act != "none":
        raise ValueError(f"unknown act {act!r}")
    h8, sh = _quantize_rows(h)
    acc2 = jax.lax.dot_general(
        h8, w2_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )                                                      # (BM, D) int32
    out = acc2.astype(jnp.float32) * (sh * s2_ref[0, :][None, :])
    out = out + b2_ref[0, :][None, :]
    o_ref[:] = out.astype(o_ref.dtype)


def _linear_impl(xf, w8, s, b, *, block_m, out_dtype, interpret):
    m, k = xf.shape
    n = w8.shape[-1]
    full = lambda shape: pl.BlockSpec(
        shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        _linear_kernel,
        grid=(pl.cdiv(m, block_m),),
        in_specs=[
            pl.BlockSpec((block_m, k), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            full((k, n)), full((1, n)), full((1, n)),
        ],
        out_specs=pl.BlockSpec((block_m, n), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, n), out_dtype),
        interpret=interpret,
    )(xf, w8, s, b)


def _mlp_impl(xf, w1, s1, b1, w2, s2, b2, *, act, block_m, out_dtype,
              interpret):
    m, d = xf.shape
    f = w1.shape[-1]
    full = lambda shape: pl.BlockSpec(
        shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        functools.partial(_mlp_kernel, act=act),
        grid=(pl.cdiv(m, block_m),),
        in_specs=[
            pl.BlockSpec((block_m, d), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            full((d, f)),                                 # w1 (resident)
            full((1, f)), full((1, f)),                   # s1, b1
            full((f, d)),                                 # w2 (resident)
            full((1, d)), full((1, d)),                   # s2, b2
        ],
        out_specs=pl.BlockSpec((block_m, d), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, d), out_dtype),
        interpret=interpret,
    )(xf, w1, s1, b1, w2, s2, b2)


# ----------------------------------------------------------------------
# GSPMD integration: the flattened row dim shards over the data mesh axis
# (rows are independent — per-row quantization), weights/scales replicate.
# Without this, sharded serving would all-gather operands around the
# opaque pallas_call (the patch embed and the cls-only last layer run
# through these even when the whole-layer kernel handles the stack).
# ----------------------------------------------------------------------
@functools.lru_cache(maxsize=None)
def _make_partitioned_op(kind, kw):
    from jax.experimental.custom_partitioning import custom_partitioning
    from jax.sharding import NamedSharding, PartitionSpec as P

    impl = {"linear": _linear_impl, "mlp": _mlp_impl}[kind]
    impl = functools.partial(impl, **dict(kw))
    n_weights = {"linear": 3, "mlp": 6}[kind]

    @custom_partitioning
    def fwd(xf, *arrs):
        return impl(xf, *arrs)

    def _row_axis(arg_shapes):
        try:
            spec = arg_shapes[0].sharding.spec
        except AttributeError:
            return None
        return spec[0] if len(spec) > 0 else None

    def infer_sharding(mesh, arg_shapes, result_shape):
        return NamedSharding(mesh, P(_row_axis(arg_shapes), None))

    def partition(mesh, arg_shapes, result_shape):
        ax = _row_axis(arg_shapes)
        xs = NamedSharding(mesh, P(ax, None))
        rep = NamedSharding(mesh, P())

        def lower(xf, *arrs):
            return impl(xf, *arrs)

        return mesh, lower, xs, (xs,) + (rep,) * n_weights

    rule = {
        "linear": "m k, k n, u n, v n -> m n",
        "mlp": "m d, d f, u f, v f, f d, w d, y d -> m d",
    }[kind]
    fwd.def_partition(
        infer_sharding_from_operands=infer_sharding,
        partition=partition,
        sharding_rule=rule,
    )
    return fwd


def _linear_kernel(x_ref, w_ref, s_ref, b_ref, o_ref):
    x = x_ref[:].astype(jnp.float32)                       # (BM, K)
    x8, sx = _quantize_rows(x)
    acc = jax.lax.dot_general(
        x8, w_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    out = acc.astype(jnp.float32) * (sx * s_ref[0, :][None, :])
    out = out + b_ref[0, :][None, :]
    o_ref[:] = out.astype(o_ref.dtype)


def int8_linear(
    x: jnp.ndarray,                    # (..., K)
    q: QuantizedLinear,                # (K, N) int8 + (N,) scale + (N,) bias
    out_dtype=jnp.bfloat16,
    block_m: int = 256,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """Single int8 GEMM with fused quantize + dequant/bias epilogue.

    Unlike the XLA path the int32 accumulator never reaches HBM: the
    epilogue runs in VMEM and only ``out_dtype`` bytes are written. The
    weight stays fully VMEM-resident across M-tiles (fine up to a few MB —
    e.g. a fused (D, 3D) QKV projection at ViT-B is 1.7 MB).
    """
    if interpret is None:
        from mit_tpu.ops.pallas_attention import on_tpu

        interpret = not on_tpu()
    lead = x.shape[:-1]
    k = x.shape[-1]
    n = q.w8.shape[-1]
    m = 1
    for s in lead:
        m *= s
    kw = (("block_m", block_m), ("out_dtype", out_dtype),
          ("interpret", interpret))
    out = _make_partitioned_op("linear", kw)(
        x.reshape(m, k), q.w8, q.scale[None, :], q.bias[None, :]
    )
    return out.reshape(*lead, n)


def fused_int8_mlp(
    x: jnp.ndarray,                    # (..., D) activations
    q1: QuantizedLinear,               # (D, F) int8 + (F,) scale + (F,) bias
    q2: QuantizedLinear,               # (F, D) int8 + (D,) scale + (D,) bias
    act: str = "gelu",                 # "gelu" | "quick_gelu" | "none"
    out_dtype=jnp.bfloat16,
    block_m: int = 256,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """act2(act1-quantized) fused MLP: returns (..., D) in ``out_dtype``.

    Weight tensors must be 2-D (one layer — slice layer stacks before
    calling). Biases must be present on both QuantizedLinears.
    """
    if interpret is None:
        from mit_tpu.ops.pallas_attention import on_tpu

        interpret = not on_tpu()
    lead = x.shape[:-1]
    d = x.shape[-1]
    m = 1
    for s in lead:
        m *= s
    kw = (("act", act), ("block_m", block_m), ("out_dtype", out_dtype),
          ("interpret", interpret))
    out = _make_partitioned_op("mlp", kw)(
        x.reshape(m, d), q1.w8, q1.scale[None, :], q1.bias[None, :],
        q2.w8, q2.scale[None, :], q2.bias[None, :],
    )
    return out.reshape(*lead, d)
