"""Same-run breakdown of the headline captioning pipeline (int8 encoder).

Times, in ONE process on the real chip (tunnel variance makes cross-run
numbers incomparable):
  preproc        device_preprocess alone
  encode_int8    preprocess + int8 encoder (cls memory) + projection
  decode12       KV-cached greedy decode alone, 12 steps (trained-caption
                 length; max_len=13 forces exactly 12 steps on random
                 weights — same work as a trained END-exit at 12)
  pipe12         full pipeline with max_len=13 (encode + 12-step decode)
  pipe100        full pipeline at the flagship max_len=100 worst case

Per-segment medians over interleaved reps; one dependent fetch per pass.
"""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp

from mit_tpu.config import Config
from mit_tpu.data.preprocess import device_preprocess
from mit_tpu.decode.greedy import greedy_generate
from mit_tpu.models.model import (ModelConfig, encode_images,
                                  init_model_params, project_features)
from mit_tpu.models.vision import quantize_vision_params

B = int(os.environ.get("AB_BATCH", 1024))
ITERS = int(os.environ.get("AB_ITERS", 4))
REPS = int(os.environ.get("AB_REPS", 3))

cfg = Config()
mcfg = ModelConfig.build(cfg, vocab_size=10000)
spec_name = mcfg.encoder_name
cd = jnp.bfloat16

params = init_model_params(jax.random.PRNGKey(0), mcfg)
params_q = dict(params)
params_q["encoder"] = jax.jit(
    lambda p: quantize_vision_params(p, mcfg.vision)
)(params["encoder"])

rng = np.random.default_rng(0)
images = jnp.asarray(rng.integers(0, 255, (B, 224, 224, 3), dtype=np.uint8))


def _stamp_roll(x, shift, stamp):
    """Argument-uniqueness transform INSIDE the jit (a standalone jnp.roll
    dispatch materializes its full output between programs — the tunnel
    round-trips it when synced, ~1.3 s at B=2048, which dominated the
    cheap segments in the first version of this script)."""
    x = jnp.roll(x, shift, axis=0)
    idx = (0,) * x.ndim
    return x.at[idx].set(jnp.asarray(stamp, x.dtype))


@jax.jit
def preproc(u8, shift, stamp):
    # reduce INSIDE the jit: returning the raw (B, 3, 224, 224) f32 output
    # makes the remote-tunnel platform ship ~1.2 GB back to the host per
    # dispatch. A full-array sum keeps every element live under DCE and
    # costs one extra bandwidth pass (~1.5 ms at B=2048).
    return jnp.sum(device_preprocess(_stamp_roll(u8, shift, stamp), spec_name))


@jax.jit
def enc_int8(p, u8, shift, stamp):
    u8 = _stamp_roll(u8, shift, stamp)
    feats = encode_images(p, mcfg, device_preprocess(u8, spec_name), cd)
    return project_features(p, mcfg, feats, cd)


memory = enc_int8(params_q, images, jnp.asarray(0, jnp.int32),
                  jnp.asarray(0, jnp.uint8))
memory.block_until_ready()


def dec_fn(max_len):
    @jax.jit
    def f(p, mem, shift, stamp):
        mem = _stamp_roll(mem, shift, stamp)
        toks, _ = greedy_generate(
            p["decoder"], mcfg.decoder, mem, 2, 3, 0, max_len,
            compute_dtype=cd,
        )
        return toks
    return f


dec12 = dec_fn(13)
dec100 = dec_fn(100)


def pipe_fn(max_len):
    @jax.jit
    def f(p, u8, shift, stamp):
        u8 = _stamp_roll(u8, shift, stamp)
        feats = encode_images(p, mcfg, device_preprocess(u8, spec_name), cd)
        mem = project_features(p, mcfg, feats, cd)
        toks, _ = greedy_generate(
            p["decoder"], mcfg.decoder, mem, 2, 3, 0, max_len,
            compute_dtype=cd,
        )
        return toks
    return f


pipe12 = pipe_fn(13)
pipe100 = pipe_fn(100)

# every dispatch must be argument-unique (the tunnel memoizes identical
# (executable, args) pairs — see bench.py): images roll by a global index
# INSIDE each jitted segment; decode-only segments roll the memory rows.
segs = {
    "preproc": lambda sh, st: preproc(images, sh, st),
    "encode_int8": lambda sh, st: enc_int8(params_q, images, sh, st)[0, 0, 0],
    "decode12": lambda sh, st: dec12(params_q, memory, sh, st)[0, 0],
    "pipe12": lambda sh, st: pipe12(params_q, images, sh, st)[0, 0],
    "pipe100": lambda sh, st: pipe100(params_q, images, sh, st)[0, 0],
}

# compile everything first
for name, fn in segs.items():
    t0 = time.perf_counter()
    float(fn(jnp.asarray(1, jnp.int32), jnp.asarray(0, jnp.int32)))
    print(f"compile {name}: {time.perf_counter()-t0:.1f}s", flush=True)

results = {k: [] for k in segs}
for rep in range(REPS):
    for name, fn in segs.items():
        t0 = time.perf_counter()
        acc = 0.0
        for i in range(ITERS):
            g = rep * ITERS + i + 1     # +1: warmup used (shift=1, stamp=0)
            span = max(B - 1, 1)
            shift = g % span + 1
            wrap = g // span
            acc += float(fn(jnp.asarray(shift, jnp.int32),
                            jnp.asarray(wrap % 200, jnp.int32)))
        dt = time.perf_counter() - t0
        results[name].append(dt / ITERS)

print()
for name, xs in results.items():
    ms = 1e3 * float(np.median(xs))
    ips = B / (ms / 1e3)
    print(f"{name:12s} {ms:8.1f} ms/iter   {ips:8.0f} img/s   "
          f"(reps: {['%.1f' % (1e3*x) for x in xs]})", flush=True)
