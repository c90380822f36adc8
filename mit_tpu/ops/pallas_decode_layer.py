"""Fused per-token decoder layer for KV-cached generation (CLS memory mode).

One decode step of one post-LN decoder layer runs ~30 XLA ops (QKV GEMM,
two cache scatters, two attention einsums whose batched (M=H, N=T) shapes
tile the MXU poorly, softmax, out-proj, a constant cross-attention add,
two MLP GEMMs, three layer norms). Each op is tiny at one token per
sequence — per-op launch/fusion slack, not FLOPs, dominates the measured
step time. This kernel fuses the whole layer into one ``pallas_call``:

    QKV GEMM → (emit fresh K/V rows) → attention over the cache block
    (broadcast-multiply-reduce on the VPU — no per-head tiny matmuls)
    → out-proj → post-LN → + cross constant → post-LN → MLP → post-LN

- The (B, T, D) K/V cache blocks stream in per batch block; the layer's
  bf16 weights (6.3 MB at the flagship 512/2048 geometry) are constant
  blocks that stay VMEM-resident across the grid.
- The CURRENT step's K/V never round-trip: the fresh rows are computed
  in-kernel, used for the ``t == pos`` attention term directly, emitted
  as (B, D) row outputs, and scattered into the cache by one contiguous
  XLA dynamic-update per cache (the cache itself is not an in/out alias,
  which keeps the kernel's VMEM footprint to two streaming blocks).
- ``pos`` is a per-row (B, 1) vector, so the same kernel serves the batch
  decode loops (scalar position broadcast) and the continuous-batching
  service (per-slot positions).
- Masking is one additive (B, T) f32 input (0 or -inf) prepared by the
  caller: position visibility (j <= pos) and generated-PAD key masking
  (reference semantics, reference decoder.py:162 via model.py:224) fold
  into the same tensor.

Semantics match :func:`mit_tpu.decode.step.decoder_step` (same f32
score/softmax accumulation; the probability*V reduction and the residual
stream stay f32 where the XLA path rounds intermediates to the compute
dtype — strictly tighter). Equivalence is pinned exactly at f32 and to
tolerance at bf16 by tests/test_pallas_decode.py in interpret mode, and
by the token-identity suite on TPU.

Cross-attention here is the CLS fast path (memory length 1: softmax over
one key is 1, so the cross block is a precomputed per-layer constant —
the same algebra the XLA step uses). Full-sequence memory falls back to
the XLA path.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _ln(x, scale, bias, eps):
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps) * scale + bias


def _decode_layer_kernel(
    x_ref,                             # (BB, D) compute dtype
    pos_ref,                           # (BB, 1) int32 — per-row position
    madd_ref,                          # (BB, T) f32 additive key mask
    kc_ref, vc_ref,                    # (BB, T, D) cache blocks
    cross_ref,                         # (BB, D) f32 cross-attn constant
    wqkv, bqkv, wo, bo,                # attention weights (cd / f32 biases)
    ln1s, ln1b, ln2s, ln2b, ln3s, ln3b,
    w1, b1, w2, b2,                    # MLP weights
    xo_ref, knew_ref, vnew_ref,        # outputs: (BB, D) each
    ctx_ref,                           # VMEM scratch (BB, D) f32
    *, heads: int, hd: int, eps: float, scale: float,
):
    bb, t, d = kc_ref.shape
    f32 = jnp.float32
    x = x_ref[:].astype(f32)

    qkv = jax.lax.dot_general(
        x_ref[:], wqkv[:], (((1,), (0,)), ((), ())),
        preferred_element_type=f32,
    ) + bqkv[0, :][None, :]
    q = qkv[:, :d]
    k_new = qkv[:, d : 2 * d]
    v_new = qkv[:, 2 * d :]
    knew_ref[:] = k_new.astype(knew_ref.dtype)
    vnew_ref[:] = v_new.astype(vnew_ref.dtype)

    # Attention over the cache block, one head at a time: all operands are
    # 2-D/3-D with the head's hd-wide LANE SLICE of the full D dimension —
    # Mosaic cannot shape-cast (BB, T, D) → (BB, T, H, hd) (splitting the
    # lane dim is an unsupported relayout on real TPUs; the earlier fused
    # form compiled only in interpret mode), but static lane slices are
    # cheap and the same pattern the int8 layer kernel uses.
    kc = kc_ref[:].astype(f32)                                   # (BB, T, D)
    vc = vc_ref[:].astype(f32)
    at_pos = (
        jax.lax.broadcasted_iota(jnp.int32, (bb, t), 1) == pos_ref[:]
    )                                                            # (BB, T)
    madd = madd_ref[:]
    for hh in range(heads):
        hs = slice(hh * hd, (hh + 1) * hd)
        q_h = q[:, hs]                                           # (BB, hd)
        s = jnp.sum(q_h[:, None, :] * kc[:, :, hs], -1) * scale  # (BB, T)
        # fresh K at t == pos (the cache block still holds the stale row)
        s_pos = jnp.sum(q_h * k_new[:, hs], -1, keepdims=True) * scale
        s = jnp.where(at_pos, s_pos, s) + madd                   # (BB, T)
        m = jnp.max(s, axis=1, keepdims=True)
        p = jnp.exp(s - m)                                       # (BB, T)
        denom = jnp.sum(p, axis=1, keepdims=True)                # (BB, 1)
        # context: cache rows except t == pos, plus the fresh V row
        p_cache = jnp.where(at_pos, 0.0, p)
        ctx_h = jnp.sum(p_cache[:, :, None] * vc[:, :, hs], 1)   # (BB, hd)
        p_pos = jnp.sum(jnp.where(at_pos, p, 0.0), 1, keepdims=True)
        ctx_h = ctx_h + p_pos * v_new[:, hs]
        ctx_ref[:, hs] = ctx_h / denom
    ctx = ctx_ref[:]

    sa = jax.lax.dot_general(
        ctx.astype(x_ref.dtype), wo[:], (((1,), (0,)), ((), ())),
        preferred_element_type=f32,
    ) + bo[0, :][None, :]
    x = _ln(x + sa, ln1s[0, :][None, :], ln1b[0, :][None, :], eps)
    x = _ln(x + cross_ref[:].astype(f32),
            ln2s[0, :][None, :], ln2b[0, :][None, :], eps)

    mid = jax.lax.dot_general(
        x.astype(x_ref.dtype), w1[:], (((1,), (0,)), ((), ())),
        preferred_element_type=f32,
    ) + b1[0, :][None, :]
    mid = jnp.maximum(mid, 0.0)
    y = jax.lax.dot_general(
        mid.astype(x_ref.dtype), w2[:], (((1,), (0,)), ((), ())),
        preferred_element_type=f32,
    ) + b2[0, :][None, :]
    x = _ln(x + y, ln3s[0, :][None, :], ln3b[0, :][None, :], eps)
    xo_ref[:] = x.astype(xo_ref.dtype)


def _batch_block(b: int, t: int, d: int, f: int, itemsize: int) -> int:
    """Largest batch block whose kernel fits VMEM.

    Budget: weights (resident, single-buffered constant blocks) + two
    double-buffered cache blocks + the f32 activation stream, against the
    same device-derived budget the int8 layer kernels use."""
    from mit_tpu.ops.pallas_int8_layer import _vmem_bytes

    if d % 128 != 0:
        # lane-padded D: the kernel's per-head lane slices and (BB, T, D)
        # blocks relayout on real TPUs when D pads the 128-lane tile (same
        # Mosaic constraint the int8 layer kernels gate on — observed at
        # the tiny d=64 debug geometry). Fall back to the XLA step.
        return 0
    weights = (4 * d * d + 2 * d * f) * itemsize
    budget = (13 * _vmem_bytes()) // 16
    for bb in (512, 256, 128, 64, 32, 16, 8, 4, 2, 1):
        if b % bb != 0:
            continue
        caches = 2 * 2 * bb * t * d * itemsize        # k+v, double-buffered
        # the kernel holds BOTH f32 cache casts (kc and vc) live across
        # the per-head loop, plus the fused q*k elementwise chain; budget
        # two full (BB, T, D) f32 copies
        f32_attn = 2 * 4 * bb * t * d
        acts = bb * (3 * d + t + f) * 4 * 2           # f32 stream, headroom
        if weights + caches + f32_attn + acts <= budget:
            return bb
    return 0


def decode_layer_supported(b: int, t: int, d: int, f: int, itemsize: int) -> bool:
    return _batch_block(b, t, d, f, itemsize) > 0


def _impl(x, posv, madd, k_cache, v_cache, cross, *weights,
          heads, eps, interpret):
    """pallas_call over the LOCAL batch block (per-shard under GSPMD)."""
    b, t, d = k_cache.shape
    f = weights[10].shape[-1]              # w1
    cd = x.dtype
    bb = b if interpret else _batch_block(b, t, d, f, jnp.dtype(cd).itemsize)
    if bb == 0:
        raise ValueError(
            f"fused_decode_layer: no batch block of B={b} fits VMEM "
            f"(T={t}, D={d}, F={f})"
        )
    kernel = functools.partial(
        _decode_layer_kernel,
        heads=heads, hd=d // heads, eps=eps,
        scale=1.0 / math.sqrt(d // heads),
    )
    row = lambda n: pl.BlockSpec((1, n), lambda i: (0, 0),
                                 memory_space=pltpu.VMEM)
    wspec = lambda shape: pl.BlockSpec(shape, lambda i: (0, 0),
                                       memory_space=pltpu.VMEM)
    bblk = lambda *shape: pl.BlockSpec((bb,) + shape,
                                       lambda i: (i,) + (0,) * len(shape),
                                       memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(b // bb,),
        in_specs=[
            bblk(d),                    # x
            bblk(1),                    # pos per row
            bblk(t),                    # madd
            bblk(t, d), bblk(t, d),     # k/v cache blocks
            bblk(d),                    # cross const
            wspec((d, 3 * d)), row(3 * d),
            wspec((d, d)), row(d),
            row(d), row(d), row(d), row(d), row(d), row(d),   # 3 LNs
            wspec((d, f)), row(f),
            wspec((f, d)), row(d),
        ],
        out_specs=[bblk(d), bblk(d), bblk(d)],
        out_shape=[
            jax.ShapeDtypeStruct((b, d), cd),
            jax.ShapeDtypeStruct((b, d), cd),
            jax.ShapeDtypeStruct((b, d), cd),
        ],
        scratch_shapes=[pltpu.VMEM((bb, d), jnp.float32)],  # attn context
        interpret=interpret,
    )(x, posv, madd, k_cache, v_cache, cross, *weights)


# GSPMD integration: batch is the only shardable dim — the six per-row
# operands shard over the data mesh axis, weights replicate, and each
# shard runs the kernel on its local rows (same pattern as the int8
# layer kernels). Required for the sharded CaptionService.
@functools.lru_cache(maxsize=None)
def _make_partitioned(statics):
    from jax.experimental.custom_partitioning import custom_partitioning
    from jax.sharding import NamedSharding, PartitionSpec as P

    impl = functools.partial(_impl, **dict(statics))

    @custom_partitioning
    def fwd(*arrs):
        return impl(*arrs)

    def _batch_axis(arg_shapes):
        # Scan the batched operands, CACHES FIRST: in the sharded service
        # x derives from replicated tokens (emb lookup), so its propagated
        # spec can be unsharded while the donated K/V cache blocks carry
        # the authoritative P('data') slot-row sharding. Inferring from
        # x alone would resolve the whole kernel to replicated compute.
        for i in (3, 4, 0, 5, 2, 1):
            try:
                spec = arg_shapes[i].sharding.spec
            except AttributeError:
                continue
            if len(spec) > 0 and spec[0] is not None:
                return spec[0]
        return None

    def infer_sharding(mesh, arg_shapes, result_shape):
        out = NamedSharding(mesh, P(_batch_axis(arg_shapes), None))
        return (out, out, out)

    def partition(mesh, arg_shapes, result_shape):
        bax = _batch_axis(arg_shapes)
        rep = NamedSharding(mesh, P())
        bsh = lambda nd: NamedSharding(
            mesh, P(*([bax] + [None] * (nd - 1)))
        )
        ins = tuple(
            bsh(len(s.shape)) if i < 6 else rep
            for i, s in enumerate(arg_shapes)
        )
        out = bsh(2)

        def lower(*arrs):
            return impl(*arrs)

        return mesh, lower, (out, out, out), ins

    rule = (
        "b d, b u, b t, b t d, b t d, b d, "
        + ", ".join(f"p{i} q{i}" for i in range(14))
        + " -> b d, b d, b d"
    )
    fwd.def_partition(
        infer_sharding_from_operands=infer_sharding,
        partition=partition,
        sharding_rule=rule,
    )
    return fwd


def fused_decode_layer(
    x: jnp.ndarray,                    # (B, D) residual stream, compute dtype
    pos: jnp.ndarray,                  # () or (B,) int32 position(s)
    madd: jnp.ndarray,                 # (B, T) f32 additive key mask
    k_cache: jnp.ndarray,              # (B, T, D) this layer's K cache
    v_cache: jnp.ndarray,              # (B, T, D)
    cross_const: jnp.ndarray,          # (B, D) cross-attn constant
    lay: dict,                         # stacked prepared layer params
    l: int,                            # layer index into the stacks
    num_heads: int,
    eps: float = 1e-5,
    interpret: bool | None = None,
):
    """→ (x', k_new (B, D), v_new (B, D)); caller scatters the rows."""
    if interpret is None:
        from mit_tpu.ops.pallas_attention import on_tpu

        interpret = not on_tpu()
    b = k_cache.shape[0]
    r2 = lambda a: a.reshape(1, -1)
    ln = lambda p: (r2(p["scale"]), r2(p["bias"]))
    l1s, l1b = ln(jax.tree.map(lambda a: a[l], lay["ln1"]))
    l2s, l2b = ln(jax.tree.map(lambda a: a[l], lay["ln2"]))
    l3s, l3b = ln(jax.tree.map(lambda a: a[l], lay["ln3"]))
    posv = jnp.broadcast_to(
        jnp.reshape(pos.astype(jnp.int32), (-1, 1)), (b, 1)
    )
    fwd = _make_partitioned(
        (("heads", num_heads), ("eps", eps), ("interpret", interpret))
    )
    return fwd(
        x, posv, madd.astype(jnp.float32),
        k_cache, v_cache, cross_const.astype(jnp.float32),
        lay["wqkv"][l], r2(lay["bqkv"][l].astype(jnp.float32)),
        lay["wo"][l], r2(lay["bo"][l].astype(jnp.float32)),
        l1s, l1b, l2s, l2b, l3s, l3b,
        lay["w1"][l], r2(lay["b1"][l].astype(jnp.float32)),
        lay["w2"][l], r2(lay["b2"][l].astype(jnp.float32)),
    )
