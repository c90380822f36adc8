#!/usr/bin/env python
"""Same-run batch sweep of the headline int8 pipeline (VERDICT r4 ask #8).

2048 won the round-3 sweep under the round-3 int8 kernel; the round-4
phase-staggered mega-kernel changes the MXU/VPU balance, so re-confirm
the headline's batch choice under the CURRENT kernel in one process
(interleaved reps, median per batch — tunnel drift hits all arms).

Mirrors bench.py's headline config: quick-trained decoder (real END
exits at ~12 tokens), int8 W8A8 encoder, device-staged uint8 images,
in-jit roll+stamp argument uniqueness, dependent-fetch completion
barrier with iters sized so the fetch is <1% of the window.

Env: AB_BATCHES (csv, default "1024,2048,4096"), AB_REPS (default 3).
Writes benchmarks/ab_batch_sweep_r05.json; prints one JSON line.
"""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import json
import time

import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp

from mit_tpu.config import Config
from mit_tpu.data.preprocess import device_preprocess
from mit_tpu.decode.greedy import greedy_generate
from mit_tpu.models.model import (
    ModelConfig, encode_images, init_model_params, project_features,
    split_trainable,
)
from mit_tpu.models.vision import quantize_vision_params
from mit_tpu.train.steps import init_train_state, make_optimizer, make_train_step

from bench import make_color_dataset  # noqa: E402  (same dataset recipe)


def main():
    batches = [int(b) for b in
               os.environ.get("AB_BATCHES", "1024,2048,4096").split(",")]
    reps = int(os.environ.get("AB_REPS", 3))
    cd = jnp.bfloat16
    cfg = Config()
    mcfg = ModelConfig.build(cfg, vocab_size=10000)
    params = init_model_params(jax.random.PRNGKey(0), mcfg)
    max_len = mcfg.decoder.max_seq_len
    spec = mcfg.encoder_name

    @jax.jit
    def caption_kernel(p, u8, shift, stamp):
        u8 = jnp.roll(u8, shift, axis=0)
        u8 = u8.at[0, 0, 0, 0].set(jnp.asarray(stamp, jnp.uint8))
        px = device_preprocess(u8, spec)
        feats = encode_images(p, mcfg, px, cd)
        memory = project_features(p, mcfg, feats, cd)
        return greedy_generate(p["decoder"], mcfg.decoder, memory,
                               2, 3, 0, max_len, compute_dtype=cd)

    # quick-train the decoder once (bench.py recipe) at a fixed 2048-image
    # feature set, then serve the SAME weights at every batch size
    rng = np.random.default_rng(0)
    images_all, caps = make_color_dataset(max(batches), 224, rng)
    encode_fn = jax.jit(lambda p, u8: encode_images(
        p, mcfg, device_preprocess(u8, spec), cd))
    n_tr = 2048
    features = np.asarray(encode_fn(params, jnp.asarray(images_all[:n_tr])),
                          np.float32)
    trainable, frozen = split_trainable(params)
    optimizer, _ = make_optimizer(cfg.replace(LEARNING_RATE=3e-4))
    step = make_train_step(mcfg, optimizer, 0, cd, from_features=True,
                           donate=False)
    state = init_train_state(trainable, optimizer)
    rngk = jax.random.PRNGKey(0)
    for _ in range(int(os.environ.get("MIT_BENCH_TRAIN_STEPS", 300))):
        sel = rng.integers(0, n_tr, 256)
        state, loss = step(state, {}, {
            "features": jnp.asarray(features[sel]),
            "decoder_input_tokens": jnp.asarray(caps[sel, :-1]),
            "target_tokens": jnp.asarray(caps[sel, 1:]),
        }, rngk)
    trained = {**state.params, **frozen}
    trained["encoder"] = jax.jit(
        lambda p: quantize_vision_params(p, mcfg.vision))(trained["encoder"])
    print(f"prep train loss {float(loss):.4f}", file=sys.stderr)

    # rtt probe (sizes iters so the completion fetch is <1% of the window)
    f1 = jax.jit(lambda x: x + 1)
    f1(jnp.zeros((1,), jnp.float32)).block_until_ready()
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        float(f1(jnp.zeros((1,), jnp.float32))[0])
        ts.append(time.perf_counter() - t0)
    rtt_s = float(np.median(ts))

    staged = {b: jnp.asarray(images_all[:b]) for b in batches}
    g = [1]

    def timed(p, b, n_iters):
        imgs = staged[b]
        t0 = time.perf_counter()
        acc = jnp.zeros((), jnp.int32)
        for _ in range(n_iters):
            shift = g[0] % (b - 1) + 1
            stamp = (g[0] // (b - 1)) % 256
            g[0] += 1
            toks, _ = caption_kernel(p, imgs, jnp.asarray(shift, jnp.int32),
                                     jnp.asarray(stamp, jnp.int32))
            acc = acc + jnp.sum(toks)
        int(acc)
        return b * n_iters / (time.perf_counter() - t0)

    iters_by, cal = {}, {}
    for b in batches:                                  # compile + calibrate
        t0 = time.perf_counter()
        timed(trained, b, 1)
        timed(trained, b, 1)                           # warm, post-compile
        dt1 = time.perf_counter() - t0
        _t = time.perf_counter()
        timed(trained, b, 2)
        per_iter = max((time.perf_counter() - _t - rtt_s) / 2, 1e-4)
        iters_by[b] = int(min(32, max(4, np.ceil(100.0 * rtt_s / per_iter))))
        cal[b] = round(per_iter, 4)

    ips = {b: [] for b in batches}
    for _ in range(reps):                              # interleaved arms
        for b in batches:
            ips[b].append(timed(trained, b, iters_by[b]))
    med = {b: float(np.median(v)) for b, v in ips.items()}
    best = max(med, key=med.get)
    out = {
        "bench": "headline_batch_sweep_r05",
        "kernel": "int8 phase-staggered mega-kernel (round-4)",
        "ips_by_batch": {str(b): round(v, 1) for b, v in med.items()},
        "reps_by_batch": {str(b): [round(x, 1) for x in v]
                          for b, v in ips.items()},
        "iters_by_batch": {str(b): iters_by[b] for b in batches},
        "cal_sec_per_iter": {str(b): cal[b] for b in batches},
        "best_batch": best,
        "tunnel_rtt_ms": round(rtt_s * 1e3, 2),
    }
    print(json.dumps(out))
    art = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "ab_batch_sweep_r05.json")
    with open(art, "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
