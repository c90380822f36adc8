"""Pallas TPU kernels for the attention hot paths.

Kernel 1 — fused causal self-attention (decoder training/prefill):
    per (batch, head) grid cell, Q/K/V tiles live in VMEM; scores, the
    causal+padding mask, the numerically-stable softmax and the PV matmul
    all happen in one kernel — no (B, H, T, T) probability tensor ever
    reaches HBM (the reference materializes additive masks and runs
    separate ATen kernels per op, reference utils.py:11-70,
    decoder.py:153-186).

At the reference's shapes (T ≤ 128, hd = 64) one (T, T) tile fits VMEM
easily, so this is single-block flash attention: no K/V streaming loop is
needed — the fusion (mask + softmax + two MXU matmuls, one HBM round trip)
is where the win is.

Backward: ``jax.custom_vjp`` recomputes attention with XLA einsums from the
saved Q/K/V (rematerialization — trades FLOPs for never storing probs).

All kernels run in ``interpret`` mode off-TPU so the test suite validates
them on CPU; `use_pallas()` gates the fast path at runtime.
"""

from __future__ import annotations

import functools
import os
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e9


@functools.lru_cache(maxsize=1)
def on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


_FORCED: bool = None


def set_pallas_enabled(value) -> None:
    """Force the fused kernels on/off (None = auto: on when on TPU).

    The kernels are GSPMD-safe (custom_partitioning-wrapped), so they stay
    enabled under sharded multi-chip execution; this switch exists for
    A/B measurement and for forcing interpret-mode runs in tests.
    """
    global _FORCED
    _FORCED = value


def pallas_enabled() -> bool:
    if os.environ.get("MIT_PALLAS") == "0":
        return False
    if _FORCED is not None:
        return _FORCED
    return on_tpu()


def _attn_body(q, k, v_ref_h, pad_row, scale, causal, t, s):
    """softmax(mask(q·kᵀ·scale))·v for one head's (T, hd)/(S, hd) tiles."""
    scores = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale                                             # (T, S)
    if causal:
        row = jax.lax.broadcasted_iota(jnp.int32, (t, s), 0)
        col = jax.lax.broadcasted_iota(jnp.int32, (t, s), 1)
        scores = scores + jnp.where(col <= row, 0.0, NEG_INF)
    scores = scores + pad_row[None, :]
    m = jnp.max(scores, axis=1, keepdims=True)
    p = jnp.exp(scores - m)
    probs = p / jnp.sum(p, axis=1, keepdims=True)
    return jax.lax.dot_general(
        probs.astype(v_ref_h.dtype), v_ref_h,
        (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
    )


def _attn_kernel_allheads(q_ref, k_ref, v_ref, pad_ref, o_ref, *,
                          scale: float, causal: bool, heads: int):
    """One BATCH cell: all heads processed in a static unrolled loop.

    Gridding per (batch, head) pays fixed per-cell overhead ~H× more often;
    measured at ViT-B shapes (B=1024, H=12, T=197) the per-batch grid is
    4.3× faster (65.4 → 15.2 ms) with identical output.
    refs: q/k/v (H, T|S, hd), pad (1, S).
    """
    t = q_ref.shape[1]
    s = k_ref.shape[1]
    pad_row = pad_ref[0, :]
    for h in range(heads):
        q = q_ref[h].astype(jnp.float32)
        k = k_ref[h].astype(jnp.float32)
        o_ref[h] = _attn_body(
            q, k, v_ref[h], pad_row, scale, causal, t, s
        ).astype(o_ref.dtype)


def _flash_forward(q, k, v, pad_add, causal):
    """q: (B, H, T, hd); k/v: (B, H, S, hd); pad_add: (B, S) additive."""
    b, h, t, hd = q.shape
    s = k.shape[2]
    scale = 1.0 / math.sqrt(hd)
    itemsize = jnp.dtype(q.dtype).itemsize
    # VMEM budget per cell: q + k + v + out tiles (+ transient scores)
    per_cell = (2 * h * t * hd + 2 * h * s * hd) * itemsize + t * s * 4
    if per_cell > 8 * 1024 * 1024:
        # huge models: fall back to one head per cell
        qf = q.reshape(b * h, 1, t, hd)
        kf = k.reshape(b * h, 1, s, hd)
        vf = v.reshape(b * h, 1, s, hd)
        padf = jnp.repeat(pad_add[:, None, :], h, axis=1).reshape(b * h, 1, s)
        grid_b, heads = b * h, 1
    else:
        qf, kf, vf = q, k, v
        padf = pad_add[:, None, :]
        grid_b, heads = b, h

    kernel = functools.partial(
        _attn_kernel_allheads, scale=scale, causal=causal, heads=heads
    )
    tile = lambda a, c: pl.BlockSpec((None, heads, a, c),
                                     lambda i: (i, 0, 0, 0),
                                     memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        grid=(grid_b,),
        in_specs=[
            tile(t, hd), tile(s, hd), tile(s, hd),
            pl.BlockSpec((None, 1, s), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=tile(t, hd),
        out_shape=jax.ShapeDtypeStruct((grid_b, heads, t, hd), q.dtype),
        interpret=not on_tpu(),
    )(qf, kf, vf, padf)
    return out.reshape(b, h, t, hd)


# ----------------------------------------------------------------------
# Head-packed (B, T, D) kernel — the default since round 2.
#
# The (B, H, T, hd) layout needs 3 input transposes + 1 output transpose of
# the full activation tensor around every attention (310 MB each at ViT-B
# B=1024), and its hd=64 minor dim only half-fills the 128-lane registers.
# This kernel keeps activations in their native (T, D) layout — heads are
# static column slices inside VMEM — so the QKV projections feed it with no
# layout change at all, and the output feeds the out-projection likewise.
# The softmax denominator is applied after the PV matmul ((T, hd) divisions
# instead of (T, S)). Measured on v5e at ViT-B/16 B=1024: encoder
# 2,210 → 2,535 img/s vs the per-head-layout kernel.
# ----------------------------------------------------------------------
def _attn_kernel_btd(q_ref, k_ref, v_ref, pad_ref, o_ref, *,
                     scale: float, causal: bool, heads: int, hd: int,
                     has_pad: bool = True):
    """One batch cell. q_ref (T, D); k/v_ref (S, D); pad_ref (1, S).

    ``has_pad=False`` (encoder: no key is ever padding) skips the per-head
    (T, S) pad-row add — ~1/8 of the kernel's VPU elementwise work.
    """
    t = q_ref.shape[0]
    s = k_ref.shape[0]
    pad_row = pad_ref[0, :]
    if causal:
        row = jax.lax.broadcasted_iota(jnp.int32, (t, s), 0)
        col = jax.lax.broadcasted_iota(jnp.int32, (t, s), 1)
        causal_add = jnp.where(col <= row, 0.0, NEG_INF)
    for h in range(heads):
        sl = slice(h * hd, (h + 1) * hd)
        scores = jax.lax.dot_general(
            q_ref[:, sl].astype(jnp.float32), k_ref[:, sl].astype(jnp.float32),
            (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
        ) * scale                                        # (T, S)
        if causal:
            scores = scores + causal_add
        if has_pad:
            scores = scores + pad_row[None, :]
        m = jnp.max(scores, axis=1, keepdims=True)
        p = jnp.exp(scores - m)
        o = jax.lax.dot_general(
            p.astype(v_ref.dtype), v_ref[:, sl],
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        )
        o_ref[:, sl] = (o / jnp.sum(p, axis=1, keepdims=True)).astype(
            o_ref.dtype
        )


def _attn_kernel_btd_fusedqkv(qkv_ref, o_ref, *, scale: float, heads: int,
                              hd: int):
    """One batch cell over a FUSED (T, 3D) qkv tensor — bidirectional, no
    padding (the encoder case). q/k/v are static column slices [0:D),
    [D:2D), [2D:3D); per head the same (T, hd) sub-slices as the split
    kernel. Lets a fused QKV projection feed attention with zero splits,
    copies, or layout changes.
    """
    t = qkv_ref.shape[0]
    d = heads * hd
    for h in range(heads):
        qs = slice(h * hd, (h + 1) * hd)
        ks = slice(d + h * hd, d + (h + 1) * hd)
        vs = slice(2 * d + h * hd, 2 * d + (h + 1) * hd)
        scores = jax.lax.dot_general(
            qkv_ref[:, qs].astype(jnp.float32),
            qkv_ref[:, ks].astype(jnp.float32),
            (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
        ) * scale                                        # (T, T)
        m = jnp.max(scores, axis=1, keepdims=True)
        p = jnp.exp(scores - m)
        o = jax.lax.dot_general(
            p.astype(qkv_ref.dtype), qkv_ref[:, vs],
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        )
        o_ref[:, qs] = (o / jnp.sum(p, axis=1, keepdims=True)).astype(
            o_ref.dtype
        )


def flash_attention_btd_fusedqkv(qkv: jnp.ndarray, head_dim: int,
                                 ) -> jnp.ndarray:
    """qkv (B, T, 3D) → context (B, T, D). Bidirectional, unpadded
    (encoder self-attention). Inference-only: no custom_vjp (the int8
    encoder path is forward-only — the encoder is frozen)."""
    b, t, d3 = qkv.shape
    d = d3 // 3
    heads = d // head_dim
    kernel = functools.partial(
        _attn_kernel_btd_fusedqkv, scale=1.0 / math.sqrt(head_dim),
        heads=heads, hd=head_dim,
    )
    return pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[pl.BlockSpec((None, t, d3), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((None, t, d), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, t, d), qkv.dtype),
        interpret=not on_tpu(),
    )(qkv)


def _flash_forward_btd(q, k, v, pad_add, causal, head_dim, has_pad=True):
    """q (B, T, D); k/v (B, S, D); pad_add (B, S) additive → (B, T, D)."""
    b, t, d = q.shape
    s = k.shape[1]
    heads = d // head_dim
    scale = 1.0 / math.sqrt(head_dim)
    kernel = functools.partial(
        _attn_kernel_btd, scale=scale, causal=causal, heads=heads,
        hd=head_dim, has_pad=has_pad,
    )
    tile = lambda a: pl.BlockSpec((None, a, d), lambda i: (i, 0, 0),
                                  memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            tile(t), tile(s), tile(s),
            pl.BlockSpec((None, 1, s), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=tile(t),
        out_shape=jax.ShapeDtypeStruct((b, t, d), q.dtype),
        interpret=not on_tpu(),
    )(q, k, v, pad_add[:, None, :])


def _btd_fits_vmem(q, k, head_dim) -> bool:
    """Guard: one batch cell's tiles + a transient score block in ~8 MB."""
    b, t, d = q.shape
    s = k.shape[1]
    itemsize = jnp.dtype(q.dtype).itemsize
    per_cell = (2 * t * d + 2 * s * d) * itemsize + t * s * 4
    return per_cell <= 8 * 1024 * 1024


def _split_heads_btd(x, head_dim):
    b, t, d = x.shape
    return x.reshape(b, t, d // head_dim, head_dim).transpose(0, 2, 1, 3)


def _xla_attention_btd(q, k, v, pad_add, causal, head_dim):
    """XLA reference / backward recompute for the (B, T, D) layout."""
    ctx = _xla_attention(
        _split_heads_btd(q, head_dim),
        _split_heads_btd(k, head_dim),
        _split_heads_btd(v, head_dim),
        pad_add, causal,
    )
    b, h, t, hd = ctx.shape
    return ctx.transpose(0, 2, 1, 3).reshape(b, t, h * hd).astype(q.dtype)


@functools.lru_cache(maxsize=None)
def _make_partitioned_forward_btd(causal: bool, head_dim: int,
                                  has_pad: bool = True):
    from jax.experimental.custom_partitioning import custom_partitioning
    from jax.sharding import NamedSharding, PartitionSpec as P

    @custom_partitioning
    def fwd(q, k, v, pad_add):
        return _flash_forward_btd(q, k, v, pad_add, causal, head_dim, has_pad)

    def _axes(arg_shapes):
        try:
            spec = arg_shapes[0].sharding.spec
        except AttributeError:
            return None, None
        b = spec[0] if len(spec) > 0 else None
        d = spec[2] if len(spec) > 2 else None
        return b, d

    def infer_sharding(mesh, arg_shapes, result_shape):
        b, d = _axes(arg_shapes)
        return NamedSharding(mesh, P(b, None, d))

    def partition(mesh, arg_shapes, result_shape):
        # batch shards under DP; the feature dim shards under Megatron TP
        # (whole heads per shard — heads are column blocks of D); sequence
        # stays local.
        b, d = _axes(arg_shapes)
        qkv = NamedSharding(mesh, P(b, None, d))
        pad = NamedSharding(mesh, P(b, None))

        def lower(q, k, v, pad_add):
            return _flash_forward_btd(q, k, v, pad_add, causal, head_dim,
                                      has_pad)

        return mesh, lower, qkv, (qkv, qkv, qkv, pad)

    fwd.def_partition(
        infer_sharding_from_operands=infer_sharding,
        partition=partition,
        sharding_rule="b t d, b s d, b s d, b s -> b t d",
    )
    return fwd


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def flash_attention_btd(q, k, v, pad_add, causal=False, head_dim=64,
                        has_pad=True):
    """Fused attention in native (B, T, D) activation layout.

    q (B, T, D); k/v (B, S, D); pad_add (B, S) additive; heads are D-column
    blocks of ``head_dim``. No head split/merge transposes anywhere — QKV
    projections feed it directly and its output feeds the out-projection.
    GSPMD-safe via custom_partitioning (batch → DP axis, D → TP axis).
    Backward recomputes attention with XLA einsums (rematerialization).
    ``has_pad=False`` promises pad_add is all-zero and skips its in-kernel
    add (the encoder's case — images have no padded keys).
    """
    return _make_partitioned_forward_btd(causal, head_dim, has_pad)(
        q, k, v, pad_add
    )


def _fwd_btd(q, k, v, pad_add, causal, head_dim, has_pad):
    out = _make_partitioned_forward_btd(causal, head_dim, has_pad)(
        q, k, v, pad_add
    )
    return out, (q, k, v, pad_add)


def _bwd_btd(causal, head_dim, has_pad, res, g):
    q, k, v, pad_add = res
    _, vjp = jax.vjp(
        lambda q, k, v: _xla_attention_btd(q, k, v, pad_add, causal, head_dim),
        q, k, v,
    )
    dq, dk, dv = vjp(g)
    return dq, dk, dv, None


flash_attention_btd.defvjp(_fwd_btd, _bwd_btd)


# ----------------------------------------------------------------------
# GSPMD integration: pallas_call does not auto-partition, so the kernel is
# wrapped in jax.experimental.custom_partitioning with the natural rule —
# batch and head dims shard freely (batch rides the "data" axis under DP,
# heads ride "model" under Megatron TP), sequence and head_dim stay local.
# Each shard then runs the kernel on its local (B/dp, H/tp, T, hd) block
# with zero communication; XLA inserts any reshards around it.
# ----------------------------------------------------------------------
def _bh_axes(arg_shapes):
    """(batch_axis, head_axis) from q's operand sharding, if any."""
    try:
        spec = arg_shapes[0].sharding.spec
    except AttributeError:
        return None, None
    b = spec[0] if len(spec) > 0 else None
    h = spec[1] if len(spec) > 1 else None
    return b, h


def _make_partitioned_forward(causal: bool):
    from jax.experimental.custom_partitioning import custom_partitioning
    from jax.sharding import NamedSharding, PartitionSpec as P

    @custom_partitioning
    def fwd(q, k, v, pad_add):
        return _flash_forward(q, k, v, pad_add, causal)

    def infer_sharding(mesh, arg_shapes, result_shape):
        b, h = _bh_axes(arg_shapes)
        return NamedSharding(mesh, P(b, h, None, None))

    def partition(mesh, arg_shapes, result_shape):
        b, h = _bh_axes(arg_shapes)
        qkv = NamedSharding(mesh, P(b, h, None, None))
        pad = NamedSharding(mesh, P(b, None))

        def lower(q, k, v, pad_add):
            # traced with per-shard shapes: the kernel grid and VMEM
            # heuristic see the local block, exactly as single-chip
            return _flash_forward(q, k, v, pad_add, causal)

        return mesh, lower, qkv, (qkv, qkv, qkv, pad)

    fwd.def_partition(
        infer_sharding_from_operands=infer_sharding,
        partition=partition,
        # Shardy propagation rule (einsum-like): t/s/d are shared factors,
        # b/h shard through.
        sharding_rule="b h t d, b h s d, b h s d, b s -> b h t d",
    )
    return fwd


_PARTITIONED_FWD = {
    True: _make_partitioned_forward(True),
    False: _make_partitioned_forward(False),
}


def _xla_attention(q, k, v, pad_add, causal):
    """Reference XLA implementation (also the backward-pass recompute)."""
    hd = q.shape[-1]
    t = q.shape[2]
    s = k.shape[2]
    scores = jnp.einsum(
        "bhtd,bhsd->bhts", q.astype(jnp.float32), k.astype(jnp.float32)
    ) / math.sqrt(hd)
    if causal:
        i = jnp.arange(t)[:, None]
        j = jnp.arange(s)[None, :]
        scores = scores + jnp.where(j <= i, 0.0, NEG_INF)[None, None]
    scores = scores + pad_add[:, None, None, :]
    probs = jax.nn.softmax(scores, axis=-1)
    return jnp.einsum("bhts,bhsd->bhtd", probs.astype(q.dtype), v)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def flash_attention(q, k, v, pad_add, causal=True):
    """Fused attention: q (B,H,T,hd), k/v (B,H,S,hd), pad_add (B,S) additive.

    ``causal=True`` for decoder self-attention, ``False`` for encoder
    (bidirectional) attention. Dropout-free — callers fall back to the XLA
    path when attention-prob dropout is active.

    GSPMD-safe: the kernel is custom_partitioning-wrapped, so sharded
    multi-chip execution (DP batch split and/or TP head split) keeps the
    fused kernel per-shard instead of falling back to XLA attention.
    """
    return _PARTITIONED_FWD[causal](q, k, v, pad_add)


def _fwd(q, k, v, pad_add, causal):
    # nondiff_argnums args keep their original positions in fwd (they lead
    # only in the bwd rule's signature)
    return _PARTITIONED_FWD[causal](q, k, v, pad_add), (q, k, v, pad_add)


def _bwd(causal, res, g):
    q, k, v, pad_add = res
    _, vjp = jax.vjp(
        lambda q, k, v: _xla_attention(q, k, v, pad_add, causal), q, k, v
    )
    dq, dk, dv = vjp(g)
    return dq, dk, dv, None


flash_attention.defvjp(_fwd, _bwd)
