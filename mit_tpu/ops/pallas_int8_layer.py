"""Whole-transformer-layer fused int8 kernel for the frozen ViT encoder.

The endgame of the int8 experiments (see git history): isolated int8 GEMM
kernels each beat their XLA twin, but composing them LOST to plain bf16 —
every pallas_call boundary forces the activation to materialize in HBM
(LN outputs, GEMM epilogues) exactly where XLA would have fused, and the
per-call launch overhead stacks 4-5x per layer.

So fuse the ENTIRE pre-LN transformer layer into one kernel. int8 is what
makes this possible: a ViT-B layer's int8 weights (QKV 1.7 MB + out 0.6 +
fc1 2.4 + fc2 2.4 = 7.1 MB) are VMEM-resident alongside one batch item's
activations, where bf16 weights (14.2 MB) would not fit. Per (T, D) batch
item the kernel runs

    LN1 → rowquant → int8 QKV GEMM → per-head softmax attention (bf16)
    → rowquant → int8 out-proj GEMM → +residual
    → LN2 → rowquant → int8 fc1 GEMM → GELU → rowquant → int8 fc2 GEMM
    → +residual

with ONE HBM read of x and ONE write of the output — no intermediate
(LN outputs, QKV, attention context, MLP hidden, int32 accumulators)
ever leaves the chip.

Inference-only (the encoder is frozen — no backward exists). Encoder
self-attention is bidirectional and unpadded, so no masks.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mit_tpu.ops.quant import QuantizedLinear
from mit_tpu.ops.pallas_int8_mlp import _gelu, _quantize_rows


def _ln(x, scale, bias, eps):
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps) * scale + bias


def _dq(acc, sx, s_ref, b_ref):
    """int32 accumulator → f32 with row/channel scales + bias."""
    return acc.astype(jnp.float32) * (sx * s_ref[0, :][None, :]) + (
        b_ref[0, :][None, :]
    )



def _attn_heads_per_chunk(heads: int, t: int) -> int:
    """Heads per batched-attention dot_general. All heads at once when the
    (hc, T, T) f32 scores stay under ~2.5 MB (ViT-B: 12 heads, one chunk);
    otherwise the largest divisor of ``heads`` that fits (ViT-L in the
    split kernel: 16 heads, T=257 → chunks of 8) so the scores buffer
    can't blow the VMEM budget the fit-checks promised."""
    budget = (5 * 1024 * 1024) // 2
    cap = max(1, budget // (t * t * 4))
    if cap >= heads:
        return heads
    return max(c for c in range(1, cap + 1) if heads % c == 0)


def _attn_body(x, ln1_s, ln1_b, wqkv, sqkv, bqkv, wo, so, bo, ctx_ref,
               heads, hd, eps, npack=1):
    """Attention sublayer on an (npack·T, D) f32 residual stream.

    ``npack`` images share the LN/GEMM passes (better MXU M-padding:
    197 rows pad ~14%, 394 pad ~6%) but attend strictly within their own
    T-row block — per-image softmax chains are mutually independent, which
    also hands the scheduler VPU/MXU overlap freedom across images.

    Per image, attention runs in the transposed-head layout: one
    (t, 3D) → (3D, t) transpose, a major-dim reshape to (3·heads, hd, t),
    then ONE batched dot_general over all heads for scores and one for
    P·V — instead of 3 lane-slices + 2 GEMMs per head. Measured (ViT-B,
    B=1024, 12 scanned layers, same-run A/B in benchmarks/
    ab_mega_variants.py): 19.4 → 18.0 ms/layer; bf16 score inputs and a
    fully-transposed out-proj both measured slower, so scores keep f32
    inputs. Heads are chunked only when the (heads, t, t) f32 scores
    would not fit VMEM (ViT-L split kernel)."""
    d = heads * hd
    t = x.shape[0] // npack
    h = _ln(x, ln1_s[0, :][None, :], ln1_b[0, :][None, :], eps)
    h8, sh = _quantize_rows(h)
    qkv = _dq(
        jax.lax.dot_general(h8, wqkv[:], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.int32),
        sh, sqkv, bqkv,
    ).astype(jnp.bfloat16)
    # softmax scale folded with log2(e): p = exp(s·scale − m) computed as
    # exp2(s·scale2 − m2) with scale2 = scale·log2e (max commutes with the
    # positive rescale). exp2 is the VPU primitive exp lowers to anyway —
    # folding removes one multiply over the (heads, T, T) scores. The
    # normalize divides once per (head, row) and multiplies per element
    # instead of dividing per element (f32 divide = multi-op VPU sequence).
    scale2 = 1.4426950408889634 / math.sqrt(hd)
    hc = _attn_heads_per_chunk(heads, t)
    for im in range(npack):
        rs = slice(im * t, (im + 1) * t)
        qkv_t = qkv[rs].T.reshape(3 * heads, hd, t)
        for h0 in range(0, heads, hc):
            cs = slice(h0, h0 + hc)
            q = qkv_t[cs]
            k = qkv_t[heads + h0:heads + h0 + hc]
            v = qkv_t[2 * heads + h0:2 * heads + h0 + hc]
            scores = jax.lax.dot_general(
                q.astype(jnp.float32), k.astype(jnp.float32),
                (((1,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            ) * scale2                                      # (hc, tq, tk)
            m = jnp.max(scores, axis=2, keepdims=True)
            p = jnp.exp2(scores - m)
            o = jax.lax.dot_general(
                v, p.astype(jnp.bfloat16),
                (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )                                               # (hc, hd, tq)
            o = o * (1.0 / jnp.sum(p, axis=2))[:, None, :]
            ctx_ref[rs, h0 * hd:(h0 + hc) * hd] = o.reshape(hc * hd, t).T
    c8, sc = _quantize_rows(ctx_ref[:])
    return x + _dq(
        jax.lax.dot_general(c8, wo[:], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.int32),
        sc, so, bo,
    )


def _mlp_body(x, ln2_s, ln2_b, w1, s1, b1, w2, s2, b2, eps, act):
    """MLP sublayer on a (T, D) f32 residual stream → new stream."""
    h = _ln(x, ln2_s[0, :][None, :], ln2_b[0, :][None, :], eps)
    h8, sh = _quantize_rows(h)
    mid = _dq(
        jax.lax.dot_general(h8, w1[:], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.int32),
        sh, s1, b1,
    )
    if act == "gelu":
        mid = _gelu(mid)
    elif act == "quick_gelu":
        mid = mid * jax.nn.sigmoid(1.702 * mid)
    m8, sm = _quantize_rows(mid)
    return x + _dq(
        jax.lax.dot_general(m8, w2[:], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.int32),
        sm, s2, b2,
    )

def _act(mid, act):
    if act == "gelu":
        return _gelu(mid)
    if act == "quick_gelu":
        return mid * jax.nn.sigmoid(1.702 * mid)
    raise ValueError(act)


def _layer_body_stag(
    x_ref, ln1_s, ln1_b, wqkv, sqkv, bqkv, wo, so, bo,
    ln2_s, ln2_b, w1, s1, b1, w2, s2, b2, o_ref, ctx_ref,
    heads, hd, eps, act, npack,
):
    """PHASE-STAGGERED layer for npack >= 2: per-image GEMMs (M=T rows,
    slightly worse MXU padding than the pack-joint M=npack*T) emitted so
    every MXU op is immediately adjacent in program order to an
    INDEPENDENT VPU phase of the other image — LN1_B‖QKV_A,
    softmax_A‖scores_B, GELU_A‖fc1_B, GELU_B‖fc2_A. Mosaic/the hardware
    overlap the units only when program-adjacent ops are independent:
    whole-chain interleaving (the r3 `dual` variant) stalls because each
    op depends on its predecessor in its own chain. Measured same-run at
    ViT-B B=2048 (benchmarks/ab_mega_variants.py, 8 interleaved reps):
    32.81 vs 33.84 ms/layer pack-joint (−3.0%; −4.2% on a quieter run).
    Joint-GEMM hybrids measured WORSE (stagattn/stagmlp/stagboth 36.4-37.1
    — the pack-joint GEMM is one big dependency barrier between the
    per-image VPU phases, so nothing overlaps).

    Numerics: every op is row-local (LN/quantize per row, GEMM dot
    products per row, softmax per image) — bit-identical to the
    pack-joint schedule, only program ORDER changes; the interpret-mode
    parity suite and bench.py's captions≡bf16 gate pin it.
    """
    npk, t, d = x_ref.shape
    scale2 = 1.4426950408889634 / math.sqrt(hd)
    hc = _attn_heads_per_chunk(heads, t)
    xs = [x_ref[im].reshape(t, d).astype(jnp.float32) for im in range(npk)]

    # attention: LN+quant (VPU) staggered with QKV GEMMs (MXU)
    qkvs = [None] * npk
    for im in range(npk):
        h = _ln(xs[im], ln1_s[0, :][None, :], ln1_b[0, :][None, :], eps)
        h8, sh = _quantize_rows(h)                               # VPU
        qkvs[im] = _dq(
            jax.lax.dot_general(h8, wqkv[:], (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32),
            sh, sqkv, bqkv,
        ).astype(jnp.bfloat16)                                   # MXU
    # scores GEMMs, then softmax_A (VPU) between scores_B / PV_A (MXU)
    qt = [qkvs[im].T.reshape(3 * heads, hd, t) for im in range(npk)]
    scores, ps, sums, outs = ([[None] * (heads // hc) for _ in range(npk)]
                              for _ in range(4))
    for ci, h0 in enumerate(range(0, heads, hc)):
        for im in range(npk):
            scores[im][ci] = jax.lax.dot_general(                # MXU
                qt[im][h0:h0 + hc].astype(jnp.float32),
                qt[im][heads + h0:heads + h0 + hc].astype(jnp.float32),
                (((1,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            ) * scale2
        for im in range(npk):
            m = jnp.max(scores[im][ci], axis=2, keepdims=True)
            ps[im][ci] = jnp.exp2(scores[im][ci] - m)            # VPU
            sums[im][ci] = jnp.sum(ps[im][ci], axis=2)
        for im in range(npk):
            o = jax.lax.dot_general(                             # MXU
                qt[im][2 * heads + h0:2 * heads + h0 + hc],
                ps[im][ci].astype(jnp.bfloat16),
                (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )
            outs[im][ci] = o * (1.0 / sums[im][ci])[:, None, :]  # VPU
    for im in range(npk):
        rs = slice(im * t, (im + 1) * t)
        for ci, h0 in enumerate(range(0, heads, hc)):
            ctx_ref[rs, h0 * hd:(h0 + hc) * hd] = (
                outs[im][ci].reshape(hc * hd, t).T
            )
    c8s, scs = [None] * npk, [None] * npk
    for im in range(npk):
        rs = slice(im * t, (im + 1) * t)
        c8s[im], scs[im] = _quantize_rows(ctx_ref[rs, :])        # VPU
        xs[im] = xs[im] + _dq(                                   # MXU
            jax.lax.dot_general(c8s[im], wo[:], (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32),
            scs[im], so, bo,
        )

    # MLP: LN2_B‖fc1_A, GELU_A‖fc1_B, GELU_B‖fc2_A
    mids = [None] * npk
    for im in range(npk):
        h = _ln(xs[im], ln2_s[0, :][None, :], ln2_b[0, :][None, :], eps)
        h8, sh = _quantize_rows(h)                               # VPU
        mids[im] = _dq(                                          # MXU
            jax.lax.dot_general(h8, w1[:], (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32),
            sh, s1, b1,
        )
    m8s, sms = [None] * npk, [None] * npk
    for im in range(npk):
        m8s[im], sms[im] = _quantize_rows(_act(mids[im], act))   # VPU
    for im in range(npk):
        xs[im] = xs[im] + _dq(                                   # MXU
            jax.lax.dot_general(m8s[im], w2[:], (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32),
            sms[im], s2, b2,
        )
        o_ref[im] = xs[im].astype(o_ref.dtype)


def _layer_kernel(
    x_ref,
    ln1_s, ln1_b, wqkv, sqkv, bqkv, wo, so, bo,
    ln2_s, ln2_b, w1, s1, b1, w2, s2, b2,
    o_ref, ctx_ref,
    *, heads: int, hd: int, eps: float, act: str, npack: int,
):
    npk, t, d = x_ref.shape
    if npack >= 2:
        _layer_body_stag(
            x_ref, ln1_s, ln1_b, wqkv, sqkv, bqkv, wo, so, bo,
            ln2_s, ln2_b, w1, s1, b1, w2, s2, b2, o_ref, ctx_ref,
            heads, hd, eps, act, npack,
        )
        return
    x = x_ref[:].reshape(npk * t, d).astype(jnp.float32)
    x = _attn_body(x, ln1_s, ln1_b, wqkv, sqkv,
                   bqkv, wo, so, bo, ctx_ref, heads, hd, eps, npack=npack)
    x = _mlp_body(x, ln2_s, ln2_b, w1, s1, b1, w2, s2, b2, eps, act)
    o_ref[:] = x.reshape(npk, t, d).astype(o_ref.dtype)


def _attn_half_kernel(
    x_ref, ln1_s, ln1_b, wqkv, sqkv, bqkv, wo, so, bo, o_ref, ctx_ref,
    *, heads: int, hd: int, eps: float,
):
    """Attention half of the split (two-pass) layer — used when the whole
    layer exceeds VMEM (ViT-L): only the residual stream x round-trips
    HBM between the halves."""
    x = _attn_body(x_ref[:].astype(jnp.float32), ln1_s, ln1_b, wqkv, sqkv,
                   bqkv, wo, so, bo, ctx_ref, heads, hd, eps)
    o_ref[:] = x.astype(o_ref.dtype)


def _mlp_half_kernel(
    x_ref, ln2_s, ln2_b, w1, s1, b1, w2, s2, b2, o_ref,
    *, eps: float, act: str,
):
    """MLP half of the split layer: LN2 → fc1 → act → fc2 → +residual."""
    x = _mlp_body(x_ref[:].astype(jnp.float32), ln2_s, ln2_b, w1, s1, b1,
                  w2, s2, b2, eps, act)
    o_ref[:] = x.astype(o_ref.dtype)


@functools.lru_cache(maxsize=1)
def _vmem_bytes() -> int:
    """Per-core VMEM of the default device. v2-v5 TPU generations carry
    ~16 MB/core (the budgets below were measured on v5e against that);
    newer chips carry more. Derived from the device rather than baked in
    so a smaller-VMEM generation falls back to the per-op int8 path
    instead of failing kernel compilation at runtime (ADVICE r2)."""
    try:
        dev = jax.devices()[0]
    except Exception:
        return 16 * 1024 * 1024
    v = getattr(dev, "vmem_size_bytes", None)  # plugin-provided if present
    if isinstance(v, int) and v > 0:
        return v
    kind = str(getattr(dev, "device_kind", "")).lower()
    if "v6" in kind or "trillium" in kind or "v7" in kind:
        return 32 * 1024 * 1024
    return 16 * 1024 * 1024


def layer_fits_vmem(t: int, d: int, f: int) -> bool:
    """Will one batch item's layer fit VMEM? weights (int8) + the peak
    live activation set (MLP phase: x f32 + hidden f32 + hidden int8).
    ViT-B (197, 768, 3072) → ~10.7 MB: fits. ViT-L (257, 1024, 4096) →
    ~18.9 MB: falls back to the split two-pass kernels.

    Budget = 13/16 of device VMEM (the v5e-measured headroom, scaled).
    d must fill the 128-lane tile: the kernel's (1, T, D) → (T, D)
    reshape (and the pack-2 merge) is an unsupported Mosaic shape cast
    when D pads the lane dim (observed at the tiny d=64 debug geometry;
    real ViT widths are multiples of 128)."""
    if d % 128 != 0:
        return False
    weights = d * 3 * d + d * d + 2 * d * f
    acts = t * (4 * d + 5 * f)
    return weights + acts <= (13 * _vmem_bytes()) // 16


def _mega_pack(b: int, t: int, d: int, f: int) -> int:
    """Images per kernel instance. 2 when the doubled activation set still
    fits VMEM (same 15.5/16 headroom as the split budget — measured on
    v5e: ViT-B pack2 = 7.1 MB weights + 7.3 MB acts compiles and runs;
    pack4's 21.1 MB exceeds the 16 MB scoped limit). Packing improves the
    int8 GEMM M-padding (197→14% pad, 394→6%) and interleaves two
    independent per-image softmax/GELU chains for the scheduler:
    measured 23.4 → 20.4 ms/layer at ViT-B batch 1024."""
    weights = d * 3 * d + d * d + 2 * d * f
    acts = t * (4 * d + 5 * f)
    if b % 2 == 0 and weights + 2 * acts <= (155 * _vmem_bytes()) // 160:
        return 2
    return 1


def _mega_impl(x, ln1s, ln1b, wqkv, sqkv, bqkv, wo, so, bo,
               ln2s, ln2b, w1, s1, b1, w2, s2, b2,
               *, heads, hd, eps, act, interpret):
    b, t, d = x.shape
    f = w1.shape[-1]
    npack = _mega_pack(b, t, d, f)
    kernel = functools.partial(
        _layer_kernel, heads=heads, hd=hd, eps=eps, act=act, npack=npack
    )
    row = lambda n: pl.BlockSpec((1, n), lambda i: (0, 0),
                                 memory_space=pltpu.VMEM)
    wspec = lambda shape: pl.BlockSpec(shape, lambda i: (0, 0),
                                       memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(b // npack,),
        in_specs=[
            pl.BlockSpec((npack, t, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            row(d), row(d),                      # ln1
            wspec((d, 3 * d)), row(3 * d), row(3 * d),   # qkv
            wspec((d, d)), row(d), row(d),               # out proj
            row(d), row(d),                      # ln2
            wspec((d, f)), row(f), row(f),               # fc1
            wspec((f, d)), row(d), row(d),               # fc2
        ],
        out_specs=pl.BlockSpec((npack, t, d), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, t, d), x.dtype),
        scratch_shapes=[pltpu.VMEM((npack * t, d), jnp.float32)],  # attn ctx
        interpret=interpret,
    )(x, ln1s, ln1b, wqkv, sqkv, bqkv, wo, so, bo,
      ln2s, ln2b, w1, s1, b1, w2, s2, b2)


# ----------------------------------------------------------------------
# GSPMD integration: batch is the only shardable dim — x shards over the
# data mesh axis, weights/scales replicate, and each shard runs the kernel
# on its local batch block (same pattern as ops/pallas_attention.py).
# ----------------------------------------------------------------------
@functools.lru_cache(maxsize=None)
def _make_partitioned(statics):
    from jax.experimental.custom_partitioning import custom_partitioning
    from jax.sharding import NamedSharding, PartitionSpec as P

    impl_name, kw = statics
    impl = {"mega": _mega_impl, "split": _split_impl}[impl_name]
    impl = functools.partial(impl, **dict(kw))

    @custom_partitioning
    def fwd(x, *arrs):
        return impl(x, *arrs)

    def _batch_axis(arg_shapes):
        try:
            spec = arg_shapes[0].sharding.spec
        except AttributeError:
            return None
        return spec[0] if len(spec) > 0 else None

    def infer_sharding(mesh, arg_shapes, result_shape):
        return NamedSharding(mesh, P(_batch_axis(arg_shapes), None, None))

    def partition(mesh, arg_shapes, result_shape):
        bax = _batch_axis(arg_shapes)
        xs = NamedSharding(mesh, P(bax, None, None))
        rep = NamedSharding(mesh, P())

        def lower(x, *arrs):
            return impl(x, *arrs)

        return mesh, lower, xs, (xs,) + (rep,) * (len(arg_shapes) - 1)

    # Shardy rule: x's batch factor shards through to the output; every
    # weight/scale/bias operand gets its own free factors (replicated in
    # practice — partition() pins them to P()).
    rule = ", ".join(
        ["b t d"] + [f"p{i} q{i}" for i in range(16)]
    ) + " -> b t d"
    fwd.def_partition(
        infer_sharding_from_operands=infer_sharding,
        partition=partition,
        sharding_rule=rule,
    )
    return fwd


@functools.lru_cache(maxsize=64)
def kernel_compiles(kind: str, b: int, t: int, d: int, f: int, heads: int,
                    eps: float, act: str, dtype_name: str) -> bool:
    """AOT-compile the selected fused kernel at this exact geometry on the
    real backend before dispatch commits to it.

    The static VMEM-fit estimates (:func:`layer_fits_vmem` /
    :func:`split_fits_vmem`) cannot see compiler buffer reuse — they are
    calibrated rankings, not guarantees — and the batched-head attention
    adds an (hc, t, t) f32 scores buffer they do not count. For a
    near-budget geometry the honest arbiter is the compiler itself: probe
    once per geometry (lru-cached in-process; the persistent jax
    compilation cache makes re-probes cheap across processes) and fall to
    the next dispatch tier on failure instead of dying with a Mosaic
    scoped-memory error at the first real call (ADVICE r2).

    Only meaningful on a real TPU backend — interpret-mode callers skip it.
    """
    impl = {"mega": _mega_impl, "split": _split_impl}[kind]
    sds = jax.ShapeDtypeStruct
    f32, i8 = jnp.float32, jnp.int8
    x = sds((b, t, d), jnp.dtype(dtype_name))
    args = (
        sds((1, d), f32), sds((1, d), f32),
        sds((d, 3 * d), i8), sds((1, 3 * d), f32), sds((1, 3 * d), f32),
        sds((d, d), i8), sds((1, d), f32), sds((1, d), f32),
        sds((1, d), f32), sds((1, d), f32),
        sds((d, f), i8), sds((1, f), f32), sds((1, f), f32),
        sds((f, d), i8), sds((1, d), f32), sds((1, d), f32),
    )
    fn = functools.partial(impl, heads=heads, hd=d // heads, eps=eps,
                           act=act, interpret=False)
    try:
        jax.jit(fn).lower(x, *args).compile()
        return True
    except Exception:
        return False


def _flat_args(ln1, qkv, out, ln2, fc1, fc2):
    vec = lambda p: p[None, :].astype(jnp.float32)
    return (
        vec(ln1["scale"]), vec(ln1["bias"]),
        qkv.w8, vec(qkv.scale), vec(qkv.bias),
        out.w8, vec(out.scale), vec(out.bias),
        vec(ln2["scale"]), vec(ln2["bias"]),
        fc1.w8, vec(fc1.scale), vec(fc1.bias),
        fc2.w8, vec(fc2.scale), vec(fc2.bias),
    )


def fused_int8_vit_layer(
    x: jnp.ndarray,                    # (B, T, D)
    ln1: dict,                         # {"scale": (D,), "bias": (D,)} f32
    qkv: QuantizedLinear,              # (D, 3D)
    out: QuantizedLinear,              # (D, D)
    ln2: dict,
    fc1: QuantizedLinear,              # (D, F)
    fc2: QuantizedLinear,              # (F, D)
    num_heads: int,
    eps: float,
    act: str = "gelu",
    interpret: bool | None = None,
) -> jnp.ndarray:
    """One pre-LN encoder layer, fully fused → (B, T, D) same dtype as x.

    GSPMD-safe: custom_partitioning shards the batch over the data mesh
    axis (weights replicate), so sharded multi-chip serving keeps the
    fused kernel per-shard."""
    if interpret is None:
        from mit_tpu.ops.pallas_attention import on_tpu

        interpret = not on_tpu()
    d = x.shape[-1]
    kw = (("heads", num_heads), ("hd", d // num_heads), ("eps", eps),
          ("act", act), ("interpret", interpret))
    return _make_partitioned(("mega", kw))(x, *_flat_args(ln1, qkv, out,
                                                          ln2, fc1, fc2))


def split_fits_vmem(t: int, d: int, f: int) -> bool:
    """Two-pass fit: the MLP half is the bigger one (fc1+fc2 weights +
    x f32 + hidden f32 + hidden int8). ViT-L (257, 1024, 4096):
    8.4 MB weights + ~6.3 MB activations ≈ 14.7 MB — fits; the attention
    half is smaller."""
    # The estimate is conservative (the compiler reuses x/h/mid buffers);
    # ViT-L's MLP half computes to 15.0 MB and compiles + runs on v5e.
    # Budget = 15.5/16 of device VMEM (v5e-measured headroom, scaled).
    if d % 128 != 0:           # lane-padded D: see layer_fits_vmem
        return False
    mlp = 2 * d * f + t * (8 * d + 5 * f)
    attn = 3 * d * d + d * d + t * (4 * d + 2 * 3 * d + 4 * d + 4 * t)
    return max(mlp, attn) <= (155 * _vmem_bytes()) // 160


def _split_impl(x, ln1s, ln1b, wqkv, sqkv, bqkv, wo, so, bo,
                ln2s, ln2b, w1, s1, b1, w2, s2, b2,
                *, heads, hd, eps, act, interpret):
    b, t, d = x.shape
    f = w1.shape[-1]
    row = lambda n: pl.BlockSpec((1, n), lambda i: (0, 0),
                                 memory_space=pltpu.VMEM)
    wspec = lambda shape: pl.BlockSpec(shape, lambda i: (0, 0),
                                       memory_space=pltpu.VMEM)
    xspec = pl.BlockSpec((None, t, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    x = pl.pallas_call(
        functools.partial(_attn_half_kernel, heads=heads, hd=hd, eps=eps),
        grid=(b,),
        in_specs=[
            xspec,
            row(d), row(d),
            wspec((d, 3 * d)), row(3 * d), row(3 * d),
            wspec((d, d)), row(d), row(d),
        ],
        out_specs=xspec,
        out_shape=jax.ShapeDtypeStruct((b, t, d), x.dtype),
        scratch_shapes=[pltpu.VMEM((t, d), jnp.float32)],
        interpret=interpret,
    )(x, ln1s, ln1b, wqkv, sqkv, bqkv, wo, so, bo)
    return pl.pallas_call(
        functools.partial(_mlp_half_kernel, eps=eps, act=act),
        grid=(b,),
        in_specs=[
            xspec,
            row(d), row(d),
            wspec((d, f)), row(f), row(f),
            wspec((f, d)), row(d), row(d),
        ],
        out_specs=xspec,
        out_shape=jax.ShapeDtypeStruct((b, t, d), x.dtype),
        interpret=interpret,
    )(x, ln2s, ln2b, w1, s1, b1, w2, s2, b2)


def fused_int8_vit_layer_split(
    x: jnp.ndarray,                    # (B, T, D)
    ln1: dict,
    qkv: QuantizedLinear,
    out: QuantizedLinear,
    ln2: dict,
    fc1: QuantizedLinear,
    fc2: QuantizedLinear,
    num_heads: int,
    eps: float,
    act: str = "gelu",
    interpret: bool | None = None,
) -> jnp.ndarray:
    """Two-pass variant of :func:`fused_int8_vit_layer` for geometries
    whose full layer exceeds VMEM (ViT-L): attention half and MLP half run
    as separate kernels, each with its weights resident; only the (B, T, D)
    residual stream round-trips HBM between them. GSPMD-safe like the
    single-kernel form (batch shards, weights replicate)."""
    if interpret is None:
        from mit_tpu.ops.pallas_attention import on_tpu

        interpret = not on_tpu()
    d = x.shape[-1]
    kw = (("heads", num_heads), ("hd", d // num_heads), ("eps", eps),
          ("act", act), ("interpret", interpret))
    return _make_partitioned(("split", kw))(x, *_flat_args(ln1, qkv, out,
                                                           ln2, fc1, fc2))
