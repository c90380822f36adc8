"""Isolate where the int8 whole-layer mega-kernel's time goes (ViT-B,
B=1024, pack-2): same-run A/B of kernel variants.

  v0_current    the production kernel (per-head 64-lane-slice attention)
  v1_noattn     attention replaced by an identity (ctx = q columns) —
                everything else identical; v0 - v1 = in-kernel attention
  v2_bf16qkv    per-head attention with bf16 score inputs (no f32 casts)
  v3_batched    per-image attention via ONE batched dot_general over heads
                (relayout once instead of 3 slices x 12 heads)

Each variant is timed as 12 scanned layer applications (like the encoder)
with a dependent fetch, median of reps, interleaved.
"""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import functools
import math
import time
import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mit_tpu.models.vision import (config_for_encoder, init_vision_params,
                                   quantize_vision_params)
from mit_tpu.ops.pallas_int8_layer import _flat_args, _ln, _dq, _mlp_body
from mit_tpu.ops.pallas_int8_mlp import _quantize_rows

B = int(os.environ.get("AB_BATCH", 1024))
LAYERS = 12
REPS = int(os.environ.get("AB_REPS", 3))

cfg = config_for_encoder("google/vit-base-patch16-224-in21k")
params = init_vision_params(jax.random.PRNGKey(0), cfg)
qp = quantize_vision_params(params, cfg)
lay = jax.tree.map(lambda a: a[0], qp["layers"])
T, D, F = cfg.seq_len, cfg.hidden_size, cfg.intermediate_size
HEADS, HD = cfg.num_heads, D // cfg.num_heads
EPS = cfg.layer_norm_eps
NPACK = 2


def make_kernel(attn_mode):
    def _attn(x, ln1_s, ln1_b, wqkv, sqkv, bqkv, wo, so, bo, ctx_ref):
        d = D
        t = x.shape[0] // NPACK
        h = _ln(x, ln1_s[0, :][None, :], ln1_b[0, :][None, :], EPS)
        h8, sh = _quantize_rows(h)
        qkv = _dq(
            jax.lax.dot_general(h8, wqkv[:], (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32),
            sh, sqkv, bqkv,
        ).astype(jnp.bfloat16)
        scale = 1.0 / math.sqrt(HD)
        if attn_mode == "noattn":
            ctx_ref[:] = qkv[:, :d].astype(jnp.float32)
        elif attn_mode in ("current", "bf16qkv"):
            cast = (lambda a: a.astype(jnp.float32)) if attn_mode == "current" \
                else (lambda a: a)
            for im in range(NPACK):
                rs = slice(im * t, (im + 1) * t)
                qkv_i = qkv[rs]
                for hh in range(HEADS):
                    qs = slice(hh * HD, (hh + 1) * HD)
                    ks = slice(d + hh * HD, d + (hh + 1) * HD)
                    vs = slice(2 * d + hh * HD, 2 * d + (hh + 1) * HD)
                    scores = jax.lax.dot_general(
                        cast(qkv_i[:, qs]), cast(qkv_i[:, ks]),
                        (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    ) * scale
                    m = jnp.max(scores, axis=1, keepdims=True)
                    p = jnp.exp(scores - m)
                    o = jax.lax.dot_general(
                        p.astype(jnp.bfloat16), qkv_i[:, vs],
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                    ctx_ref[rs, qs] = o / jnp.sum(p, axis=1, keepdims=True)
        elif attn_mode == "batched":
            for im in range(NPACK):
                rs = slice(im * t, (im + 1) * t)
                qkv_i = qkv[rs]
                qh = qkv_i[:, :d].reshape(t, HEADS, HD).transpose(1, 0, 2)
                kh = qkv_i[:, d:2 * d].reshape(t, HEADS, HD).transpose(1, 0, 2)
                vh = qkv_i[:, 2 * d:].reshape(t, HEADS, HD).transpose(1, 0, 2)
                scores = jax.lax.dot_general(
                    qh.astype(jnp.float32), kh.astype(jnp.float32),
                    (((2,), (2,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32,
                ) * scale                                  # (H, T, T)
                m = jnp.max(scores, axis=2, keepdims=True)
                p = jnp.exp(scores - m)
                o = jax.lax.dot_general(
                    p.astype(jnp.bfloat16), vh,
                    (((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32,
                )                                          # (H, T, HD)
                o = o / jnp.sum(p, axis=2, keepdims=True)
                ctx_ref[rs, :] = o.transpose(1, 0, 2).reshape(t, d)
        c8, sc = _quantize_rows(ctx_ref[:])
        return x + _dq(
            jax.lax.dot_general(c8, wo[:], (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32),
            sc, so, bo,
        )

    def kern(x_ref, ln1_s, ln1_b, wqkv, sqkv, bqkv, wo, so, bo,
             ln2_s, ln2_b, w1, s1, b1, w2, s2, b2, o_ref, ctx_ref):
        npk, t, d = x_ref.shape
        x = x_ref[:].reshape(npk * t, d).astype(jnp.float32)
        x = _attn(x, ln1_s, ln1_b, wqkv, sqkv, bqkv, wo, so, bo, ctx_ref)
        x = _mlp_body(x, ln2_s, ln2_b, w1, s1, b1, w2, s2, b2, EPS, "gelu")
        o_ref[:] = x.reshape(npk, t, d).astype(o_ref.dtype)

    return kern


def make_layer_fn(attn_mode):
    kern = make_kernel(attn_mode)
    row = lambda n: pl.BlockSpec((1, n), lambda i: (0, 0),
                                 memory_space=pltpu.VMEM)
    wspec = lambda shape: pl.BlockSpec(shape, lambda i: (0, 0),
                                       memory_space=pltpu.VMEM)

    def apply(x, *arrs):
        return pl.pallas_call(
            kern,
            grid=(B // NPACK,),
            in_specs=[
                pl.BlockSpec((NPACK, T, D), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                row(D), row(D),
                wspec((D, 3 * D)), row(3 * D), row(3 * D),
                wspec((D, D)), row(D), row(D),
                row(D), row(D),
                wspec((D, F)), row(F), row(F),
                wspec((F, D)), row(D), row(D),
            ],
            out_specs=pl.BlockSpec((NPACK, T, D), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, T, D), x.dtype),
            scratch_shapes=[pltpu.VMEM((NPACK * T, D), jnp.float32)],
        )(x, *arrs)

    return apply


arrs = _flat_args(lay["ln1"], lay["attn"]["qkv"], lay["attn"]["o"],
                  lay["ln2"], lay["fc1"], lay["fc2"])

variants = {}
for mode in ("current", "noattn", "bf16qkv", "batched"):
    f = make_layer_fn(mode)

    @jax.jit
    def run(key, _f=f):
        x = jax.random.normal(key, (B, T, D), jnp.bfloat16)
        def body(c, _):
            y = _f(x + c, *arrs)
            return jnp.mean(y).astype(jnp.bfloat16), ()
        c, _ = jax.lax.scan(body, jnp.bfloat16(0), None, length=LAYERS)
        return c

    variants[mode] = run

for name, run in variants.items():
    t0 = time.perf_counter()
    try:
        np.asarray(run(jax.random.PRNGKey(0)))
        print(f"compile {name}: {time.perf_counter()-t0:.1f}s", flush=True)
    except Exception as e:
        print(f"compile {name}: FAILED {type(e).__name__}: {e}", flush=True)
        variants[name] = None

results = {k: [] for k, v in variants.items() if v is not None}
for rep in range(1, REPS + 1):
    for name in results:
        t0 = time.perf_counter()
        np.asarray(variants[name](jax.random.PRNGKey(rep)))
        results[name].append((time.perf_counter() - t0) / LAYERS)

print()
for name, xs in results.items():
    ms = 1e3 * float(np.median(xs))
    print(f"{name:10s} {ms:7.2f} ms/layer  "
          f"(reps: {['%.2f' % (1e3*x) for x in xs]})", flush=True)
