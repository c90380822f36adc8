"""A/B: bf16 vs int8 (W8A8) ViT encoder forward at serving batch size.

Usage: python benchmarks/ab_enc_int8.py {bf16|int8} {cls|full} [batch]
Params travel as jit ARGUMENTS — closure-captured params serialize into the
HLO and overflow the remote-compile transport (HTTP 413) besides stalling
compilation.
"""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
import jax
import numpy as np
jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
from functools import partial
from mit_tpu.models.vision import (config_for_encoder, init_vision_params,
    vision_forward, vision_forward_int8, quantize_vision_params)

mode = sys.argv[1]          # bf16 | int8
cls_only = sys.argv[2] == "cls" if len(sys.argv) > 2 else True
B = int(sys.argv[3]) if len(sys.argv) > 3 else 1024
ENC = sys.argv[4] if len(sys.argv) > 4 else "google/vit-base-patch16-224-in21k"
ITERS = 8

cfg = config_for_encoder(ENC)
params = jax.tree.map(lambda a: jnp.asarray(a, jnp.float32),
                      init_vision_params(jax.random.PRNGKey(0), cfg))
if mode == "int8":
    params = jax.jit(lambda p: quantize_vision_params(p, cfg))(params)
fwd = vision_forward_int8 if mode == "int8" else vision_forward


@jax.jit
def run(p, key):
    px = jax.random.normal(key, (B, 3, cfg.image_size, cfg.image_size), jnp.float32)
    def body(c, _):
        out = fwd(p, cfg, px + c, jnp.bfloat16, cls_only=cls_only)
        return jnp.mean(out).astype(jnp.float32), ()
    c, _ = jax.lax.scan(body, jnp.float32(0), None, length=ITERS)
    return c


t0 = time.perf_counter()
np.asarray(run(params, jax.random.PRNGKey(0)))
print(f"compile+first: {time.perf_counter()-t0:.1f}s", flush=True)
best = float("inf")
for r in range(1, 4):
    t0 = time.perf_counter()
    np.asarray(run(params, jax.random.PRNGKey(r)))
    best = min(best, (time.perf_counter()-t0)/ITERS)
print(f"{mode} cls_only={cls_only} B={B}: {best*1e3:.1f} ms  "
      f"{B/best:.0f} img/s", flush=True)
