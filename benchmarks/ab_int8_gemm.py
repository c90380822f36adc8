"""Isolate raw MXU GEMM throughput inside a Pallas kernel at the
mega-kernel's exact shapes: the four per-layer GEMMs (qkv, out, fc1, fc2)
chained on a (394, 768) stream, int8 vs bf16 operands.

Answers: does the int8 MXU mode actually deliver ~2x bf16 at M=394 under
Mosaic, or is the mega-kernel's GEMM portion itself far off peak?

Peak times for the 4-GEMM chain per grid instance (394 rows):
  FLOPs = 2*394*768*(2304 + 768 + 3072 + 3072... fc2 is (3072,768))
        = 2*394*768*2304 + 2*394*768*768 + 2*394*768*3072 + 2*394*3072*768
        = 5.58 GFLOP
  x1024 instances (B=2048 images): 5.71 TFLOP
  v5e: bf16 197 TFLOP/s -> 29.0 ms; int8 394 TOPS -> 14.5 ms
"""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

GRID = int(os.environ.get("AB_GRID", 1024))
M, D, F = int(os.environ.get("AB_M", 394)), 768, 3072
REPS = int(os.environ.get("AB_REPS", 5))
XLA = os.environ.get("AB_XLA") == "1"   # same chain as one XLA dot chain


def make(dtype):
    acc_t = jnp.int32 if dtype == jnp.int8 else jnp.float32

    def kern(x_ref, wqkv, wo, w1, w2, o_ref):
        x = x_ref[0]
        qkv = jax.lax.dot_general(x, wqkv[:], (((1,), (0,)), ((), ())),
                                  preferred_element_type=acc_t)
        ctx = qkv[:, :D].astype(dtype)
        o = jax.lax.dot_general(ctx, wo[:], (((1,), (0,)), ((), ())),
                                preferred_element_type=acc_t)
        h = o.astype(dtype)
        mid = jax.lax.dot_general(h, w1[:], (((1,), (0,)), ((), ())),
                                  preferred_element_type=acc_t)
        m = mid.astype(dtype)
        out = jax.lax.dot_general(m, w2[:], (((1,), (0,)), ((), ())),
                                  preferred_element_type=acc_t)
        o_ref[0] = out.astype(o_ref.dtype)

    w = lambda shape: pl.BlockSpec(shape, lambda i: (0, 0),
                                   memory_space=pltpu.VMEM)

    if XLA:
        def run(x, wqkv, wo, w1, w2):
            # whole-batch XLA chain: (GRID*M, D) — what the per-op int8
            # path's GEMMs see (HBM round-trips between ops included)
            xx = x.reshape(GRID * M, D)
            qkv = jax.lax.dot_general(
                xx, wqkv, (((1,), (0,)), ((), ())),
                preferred_element_type=acc_t)
            ctx = qkv[:, :D].astype(dtype)
            o = jax.lax.dot_general(ctx, wo, (((1,), (0,)), ((), ())),
                                    preferred_element_type=acc_t)
            h = o.astype(dtype)
            mid = jax.lax.dot_general(h, w1, (((1,), (0,)), ((), ())),
                                      preferred_element_type=acc_t)
            m = mid.astype(dtype)
            out = jax.lax.dot_general(m, w2, (((1,), (0,)), ((), ())),
                                      preferred_element_type=acc_t)
            return out.reshape(GRID, M, D).astype(jnp.float32)
        return run

    def run(x, wqkv, wo, w1, w2):
        return pl.pallas_call(
            kern,
            grid=(GRID,),
            in_specs=[pl.BlockSpec((1, M, D), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
                      w((D, 3 * D)), w((D, D)), w((D, F)), w((F, D))],
            out_specs=pl.BlockSpec((1, M, D), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((GRID, M, D), jnp.float32),
        )(x, wqkv, wo, w1, w2)

    return run


rng = np.random.default_rng(0)


def arrs(dtype):
    if dtype == jnp.int8:
        mk = lambda *s: jnp.asarray(
            rng.integers(-127, 127, s, dtype=np.int8))
    else:
        mk = lambda *s: jnp.asarray(
            rng.standard_normal(s), jnp.bfloat16)
    x = mk(GRID, M, D).reshape(GRID, M, D)
    return x, mk(D, 3 * D), mk(D, D), mk(D, F), mk(F, D)


for name, dtype in [("int8", jnp.int8), ("bf16", jnp.bfloat16)]:
    run = jax.jit(make(dtype))
    a = arrs(dtype)
    out = run(*a)
    float(jnp.sum(out[0, 0]))          # compile + warm
    ts = []
    for r in range(REPS):
        # stamp one element so no two dispatches share identical args
        # (the tunnel memoizes identical (executable, args) pairs)
        a = (a[0].at[0, 0, 0].set(jnp.asarray(r + 1, a[0].dtype)),) + a[1:]
        t0 = time.perf_counter()
        float(jnp.sum(run(*a)[0, 0]))
        ts.append(time.perf_counter() - t0)
    ms = 1e3 * float(np.median(ts))
    tf = 2 * M * D * (3 * D + D + F + F) * GRID / (ms / 1e3) / 1e12
    print(f"{name}: {ms:7.2f} ms  ({tf:6.1f} TFLOP/s eff)", flush=True)
