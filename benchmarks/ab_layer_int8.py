"""A/B one full ViT-B encoder layer: fused int8 mega-kernel on TPU."""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
import jax
import numpy as np
jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
from mit_tpu.models.vision import (config_for_encoder, init_vision_params,
                                   quantize_vision_params)
from mit_tpu.ops.pallas_int8_layer import fused_int8_vit_layer

B, ITERS = 1024, 8
cfg = config_for_encoder("google/vit-base-patch16-224-in21k")
params = init_vision_params(jax.random.PRNGKey(0), cfg)
qp = quantize_vision_params(params, cfg)
lay = jax.tree.map(lambda a: a[0], qp["layers"])


@jax.jit
def run(lay, key):
    x = jax.random.normal(key, (B, cfg.seq_len, cfg.hidden_size),
                          jnp.bfloat16)
    def body(c, _):
        y = fused_int8_vit_layer(
            x + c, lay["ln1"], lay["attn"]["qkv"], lay["attn"]["o"],
            lay["ln2"], lay["fc1"], lay["fc2"],
            num_heads=cfg.num_heads, eps=cfg.layer_norm_eps, act="gelu",
        )
        return jnp.mean(y).astype(jnp.bfloat16), ()
    c, _ = jax.lax.scan(body, jnp.bfloat16(0), None, length=ITERS)
    return c


t0 = time.perf_counter()
np.asarray(run(lay, jax.random.PRNGKey(0)))
print(f"compile+first: {time.perf_counter()-t0:.1f}s", flush=True)
best = float("inf")
for r in range(1, 4):
    t0 = time.perf_counter()
    np.asarray(run(lay, jax.random.PRNGKey(r)))
    best = min(best, (time.perf_counter()-t0)/ITERS)
print(f"fused layer: {best*1e3:.2f} ms/layer (bf16 XLA whole-encoder is "
      f"~31 ms/layer at this batch)", flush=True)
