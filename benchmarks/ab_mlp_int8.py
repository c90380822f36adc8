"""MLP-block A/B at encoder shapes: where does the int8 win go?

bf16:       x @ W1 -> gelu -> @ W2                       (all bf16)
int8-naive: dynquant(x) @ W1(int8) -> int32 -> scale+gelu -> dynquant
            -> @ W2(int8) -> int32 -> scale               (ops/quant.py path)
Theory: the (M, F) int32 accumulator (4 B/elem) + extra quantize passes
double elementwise HBM traffic vs bf16, eating the 1.72x MXU win.
"""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
import jax
import numpy as np
jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
from mit_tpu.ops.quant import quantize_weight, int8_matmul

M, D, F = 1024 * 197, 768, 3072
ITERS = 10
mode = sys.argv[1]

kw1, kw2 = jax.random.split(jax.random.PRNGKey(0))
w1 = jax.random.normal(kw1, (D, F), jnp.float32) * 0.03
w2 = jax.random.normal(kw2, (F, D), jnp.float32) * 0.03

if mode == "fused":
    from mit_tpu.ops.pallas_int8_mlp import fused_int8_mlp
    b1 = jnp.zeros((F,), jnp.float32)
    b2 = jnp.zeros((D,), jnp.float32)
    q1, q2 = quantize_weight(w1, b1), quantize_weight(w2, b2)

    @jax.jit
    def run(q1, q2, key):
        x = jax.random.normal(key, (M, D), jnp.bfloat16)
        def body(c, _):
            y = fused_int8_mlp(x + c, q1, q2, act="gelu")
            return jnp.mean(y).astype(jnp.bfloat16), ()
        c, _ = jax.lax.scan(body, jnp.bfloat16(0), None, length=ITERS)
        return c
    args = (q1, q2)
elif mode == "bf16":
    w1c, w2c = w1.astype(jnp.bfloat16), w2.astype(jnp.bfloat16)

    @jax.jit
    def run(w1c, w2c, key):
        x = jax.random.normal(key, (M, D), jnp.bfloat16)
        def body(c, _):
            h = jax.nn.gelu((x + c) @ w1c, approximate=False)
            y = h @ w2c
            return jnp.mean(y).astype(jnp.bfloat16), ()
        c, _ = jax.lax.scan(body, jnp.bfloat16(0), None, length=ITERS)
        return c
    args = (w1c, w2c)
else:
    q1, q2 = quantize_weight(w1), quantize_weight(w2)

    @jax.jit
    def run(q1, q2, key):
        x = jax.random.normal(key, (M, D), jnp.bfloat16)
        def body(c, _):
            h = jax.nn.gelu(int8_matmul(x + c, q1), approximate=False)
            y = int8_matmul(h, q2)
            return jnp.mean(y).astype(jnp.bfloat16), ()
        c, _ = jax.lax.scan(body, jnp.bfloat16(0), None, length=ITERS)
        return c
    args = (q1, q2)

t0 = time.perf_counter()
np.asarray(run(*args, jax.random.PRNGKey(0)))
print(f"compile+first: {time.perf_counter()-t0:.1f}s", flush=True)
best = float("inf")
for r in range(1, 4):
    t0 = time.perf_counter()
    np.asarray(run(*args, jax.random.PRNGKey(r)))
    best = min(best, (time.perf_counter()-t0)/ITERS)
flops = 2 * M * D * F * 2
print(f"{mode}: {best*1e3:.2f} ms/block  {flops/best/1e12:.1f} T/s", flush=True)
