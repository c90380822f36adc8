"""Pallas attention with in-kernel dropout — fused forward AND backward.

Completes the fusion story for the reference's flagship *training*
configuration (DECODER_DROPOUT=0.1, reference config.py:69): plain
``flash_attention`` is dropout-free and training fell back to the XLA path;
here the dropout mask is generated inside the kernel from a counter-based
hash PRNG (murmur3-style mixing of seed/cell/element — the hardware PRNG is
unavailable in interpret mode and harder to reproduce across passes), so
the (B, H, T, S) probability/mask tensors never exist in HBM in either
pass.

Determinism contract: the mask is a pure function of (seed, grid cell), so
the backward kernel — seeded identically — regenerates the exact mask and
computes the standard single-block flash backward:

    dv = pdᵀ·do          pd = drop(p)/(1-r)
    dp = (do·vᵀ) ∘ mask/(1-r)
    ds = p ∘ (dp − rowsum(dp ∘ p))
    dq = ds·k·scale      dk = dsᵀ·q·scale

Off-TPU the kernels run in interpret mode, so fwd/bwd consistency is
CPU-testable; equivalence with an XLA attention fed the dumped mask is the
correctness oracle (tests/test_pallas_dropout.py).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu  # noqa: F401 (memory spaces)

from mit_tpu.ops.pallas_attention import NEG_INF, on_tpu


def _keep_mask(shape, rate: float, seed, cell):
    """Bernoulli(1-rate) keep mask from a counter-based hash PRNG.

    Stateless murmur3-style integer mixing of (seed, grid cell, element
    index): platform-independent (works compiled AND in interpret mode —
    the TPU hardware PRNG is unavailable off-chip), and trivially
    reproducible in the backward kernel, which is the whole point.
    """
    t, s = shape
    idx = (
        jax.lax.broadcasted_iota(jnp.uint32, shape, 0) * jnp.uint32(s)
        + jax.lax.broadcasted_iota(jnp.uint32, shape, 1)
    )
    x = idx ^ (seed.astype(jnp.uint32) * jnp.uint32(2654435761))
    x = x ^ (cell.astype(jnp.uint32) * jnp.uint32(0x9E3779B9))
    # murmur3 finalizer
    x = x ^ (x >> 16)
    x = x * jnp.uint32(0x85EBCA6B)
    x = x ^ (x >> 13)
    x = x * jnp.uint32(0xC2B2AE35)
    x = x ^ (x >> 16)
    threshold = jnp.uint32(min(int(rate * (1 << 32)), (1 << 32) - 1))
    return x >= threshold


def _scores(q_ref, k_ref, pad_ref, scale, causal):
    t, s = q_ref.shape[0], k_ref.shape[0]
    scores = jax.lax.dot_general(
        q_ref[:].astype(jnp.float32), k_ref[:].astype(jnp.float32),
        (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
    ) * scale
    if causal:
        row = jax.lax.broadcasted_iota(jnp.int32, (t, s), 0)
        col = jax.lax.broadcasted_iota(jnp.int32, (t, s), 1)
        scores = scores + jnp.where(col <= row, 0.0, NEG_INF)
    return scores + pad_ref[0, :][None, :]


def _fwd_kernel(seed_ref, q_ref, k_ref, v_ref, pad_ref, o_ref, *,
                scale, causal, rate):
    scores = _scores(q_ref, k_ref, pad_ref, scale, causal)
    m = jnp.max(scores, axis=1, keepdims=True)
    p = jnp.exp(scores - m)
    p = p / jnp.sum(p, axis=1, keepdims=True)
    keep = _keep_mask(p.shape, rate, seed_ref[0], pl.program_id(0))
    pd = jnp.where(keep, p / (1.0 - rate), 0.0)
    o_ref[:] = jax.lax.dot_general(
        pd.astype(v_ref.dtype), v_ref[:],
        (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
    ).astype(o_ref.dtype)


def _bwd_kernel(seed_ref, q_ref, k_ref, v_ref, pad_ref, do_ref,
                dq_ref, dk_ref, dv_ref, *, scale, causal, rate):
    q = q_ref[:].astype(jnp.float32)
    k = k_ref[:].astype(jnp.float32)
    v = v_ref[:].astype(jnp.float32)
    do = do_ref[:].astype(jnp.float32)

    scores = _scores(q_ref, k_ref, pad_ref, scale, causal)
    m = jnp.max(scores, axis=1, keepdims=True)
    p = jnp.exp(scores - m)
    p = p / jnp.sum(p, axis=1, keepdims=True)
    keep = _keep_mask(p.shape, rate, seed_ref[0], pl.program_id(0))  # SAME stream
    inv = 1.0 / (1.0 - rate)
    pd = jnp.where(keep, p * inv, 0.0)

    dv = jax.lax.dot_general(
        pd, do, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    dpd = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    dp = jnp.where(keep, dpd * inv, 0.0)
    ds = p * (dp - jnp.sum(dp * p, axis=1, keepdims=True))
    dq = jax.lax.dot_general(
        ds, k, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale
    dk = jax.lax.dot_general(
        ds, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale
    dq_ref[:] = dq.astype(dq_ref.dtype)
    dk_ref[:] = dk.astype(dk_ref.dtype)
    dv_ref[:] = dv.astype(dv_ref.dtype)


def _specs(t, s, hd):
    tile = lambda a, b: pl.BlockSpec((None, a, b), lambda i: (i, 0, 0),
                                     memory_space=pltpu.VMEM)
    return [tile(t, hd), tile(s, hd), tile(s, hd), tile(1, s)]


def _flatten(q, k, v, pad_add):
    b, h, t, hd = q.shape
    s = k.shape[2]
    return (
        q.reshape(b * h, t, hd),
        k.reshape(b * h, s, hd),
        v.reshape(b * h, s, hd),
        jnp.repeat(pad_add[:, None, :], h, axis=1).reshape(b * h, 1, s),
    )


def _run_fwd(q, k, v, pad_add, seed, causal, rate):
    b, h, t, hd = q.shape
    s = k.shape[2]
    qf, kf, vf, padf = _flatten(q, k, v, pad_add)
    kernel = functools.partial(
        _fwd_kernel, scale=1.0 / math.sqrt(hd), causal=causal, rate=rate
    )
    out = pl.pallas_call(
        kernel,
        grid=(b * h,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] + _specs(t, s, hd),
        out_specs=pl.BlockSpec((None, t, hd), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b * h, t, hd), q.dtype),
        interpret=not on_tpu(),
    )(jnp.asarray([seed], jnp.int32) if jnp.ndim(seed) == 0 else seed,
      qf, kf, vf, padf)
    return out.reshape(b, h, t, hd)


def _run_bwd(q, k, v, pad_add, seed, causal, rate, g):
    b, h, t, hd = q.shape
    s = k.shape[2]
    qf, kf, vf, padf = _flatten(q, k, v, pad_add)
    gf = g.reshape(b * h, t, hd)
    kernel = functools.partial(
        _bwd_kernel, scale=1.0 / math.sqrt(hd), causal=causal, rate=rate
    )
    tile_out = lambda a: pl.BlockSpec((None, a, hd), lambda i: (i, 0, 0),
                                      memory_space=pltpu.VMEM)
    dq, dk, dv = pl.pallas_call(
        kernel,
        grid=(b * h,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] + _specs(t, s, hd)
        + [pl.BlockSpec((None, t, hd), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)],
        out_specs=(tile_out(t), tile_out(s), tile_out(s)),
        out_shape=(
            jax.ShapeDtypeStruct((b * h, t, hd), q.dtype),
            jax.ShapeDtypeStruct((b * h, s, hd), k.dtype),
            jax.ShapeDtypeStruct((b * h, s, hd), v.dtype),
        ),
        interpret=not on_tpu(),
    )(jnp.asarray([seed], jnp.int32) if jnp.ndim(seed) == 0 else seed,
      qf, kf, vf, padf, gf)
    return (
        dq.reshape(b, h, t, hd),
        dk.reshape(b, h, s, hd),
        dv.reshape(b, h, s, hd),
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def flash_attention_dropout(q, k, v, pad_add, seed, causal=True, rate=0.1):
    """Fused attention with in-kernel dropout on the attention probs.

    seed: int32 scalar array — the dropout stream; identical (seed, cell)
    pairs reproduce identical masks, which is what makes the fused backward
    exact. q (B,H,T,hd); k/v (B,H,S,hd); pad_add (B,S) additive.
    """
    return _run_fwd(q, k, v, pad_add, seed, causal, rate)


def _fwd_rule(q, k, v, pad_add, seed, causal, rate):
    return _run_fwd(q, k, v, pad_add, seed, causal, rate), (
        q, k, v, pad_add, seed,
    )


def _bwd_rule(causal, rate, res, g):
    q, k, v, pad_add, seed = res
    dq, dk, dv = _run_bwd(q, k, v, pad_add, seed, causal, rate, g)
    return dq, dk, dv, None, None


flash_attention_dropout.defvjp(_fwd_rule, _bwd_rule)


# ----------------------------------------------------------------------
# Test oracle: dump the kernel's dropout mask for a given (seed, cell)
# ----------------------------------------------------------------------
def dump_dropout_mask(b, h, t, s, seed, rate) -> jnp.ndarray:
    """(B, H, T, S) bool keep-mask exactly as the kernels generate it."""

    def kernel(seed_ref, o_ref):
        o_ref[:] = _keep_mask(
            (t, s), rate, seed_ref[0], pl.program_id(0)
        ).astype(jnp.int32)

    out = pl.pallas_call(
        kernel,
        grid=(b * h,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec((None, t, s), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b * h, t, s), jnp.int32),
        interpret=not on_tpu(),
    )(jnp.asarray([seed], jnp.int32))
    return out.reshape(b, h, t, s).astype(bool)
