#!/usr/bin/env python
"""Headline benchmark: Flickr30k-style captioning throughput per chip.

Pipeline measured end-to-end on device: fused uint8 preprocess → ViT-B/16
frozen encoder (bf16, MXU) → projection → KV-cached batched greedy decode to
MAX_SEQ_LEN — the reference's inference.py path, rebuilt TPU-native
(the reference decodes one image at a time with an uncached O(T²) loop,
reference model.py:219-242).

Baseline (BASELINE.md): ≥5,000 images/sec on a v5e-8 slice → 625
images/sec/chip. vs_baseline = measured / 625.

Prints exactly one JSON line.
Env: MIT_BENCH_TINY=1 shrinks everything for CPU smoke runs.
     MIT_BENCH_BATCH / MIT_BENCH_ITERS override batch size / iterations.
"""

import json
import os
import time

import numpy as np


def main():
    tiny = os.environ.get("MIT_BENCH_TINY") == "1"

    import jax
    import jax.numpy as jnp

    from mit_tpu.config import Config
    from mit_tpu.data.preprocess import device_preprocess
    from mit_tpu.decode.greedy import greedy_generate
    from mit_tpu.models.decoder import DecoderConfig
    from mit_tpu.models.model import ModelConfig, init_model_params, project_features, encode_images
    from mit_tpu.models.vision import VisionConfig

    cfg = Config()
    if tiny:
        mcfg = ModelConfig(
            "tiny/vit",
            VisionConfig(
                family="vit", image_size=32, patch_size=16, hidden_size=64,
                num_layers=2, num_heads=8, intermediate_size=128,
                hidden_act="gelu", layer_norm_eps=1e-12,
                patch_bias=True, ln_pre=False, ln_post=True,
            ),
            DecoderConfig(
                vocab_size=1000, embed_dim=64, num_heads=8, num_layers=2,
                ff_dim=128, max_seq_len=20, dropout=0.0, pad_idx=0,
            ),
            "cls",
        )
        batch = int(os.environ.get("MIT_BENCH_BATCH", 8))
        iters = int(os.environ.get("MIT_BENCH_ITERS", 2))
        img_hw = 32
    else:
        mcfg = ModelConfig.build(cfg, vocab_size=10000)  # ViT-B/16 + 6L decoder
        batch = int(os.environ.get("MIT_BENCH_BATCH", 1024))
        iters = int(os.environ.get("MIT_BENCH_ITERS", 4))
        img_hw = 224

    params = init_model_params(jax.random.PRNGKey(0), mcfg)
    cd = jnp.bfloat16
    max_len = mcfg.decoder.max_seq_len
    tok_start, tok_end, tok_pad = 2, 3, 0

    spec_name = mcfg.encoder_name if not tiny else "google/vit-base-patch16-224-in21k"

    # ONE jitted program for the whole pipeline (separate dispatches pay
    # host→device round-trip latency per call — significant on a remote
    # tunnel and real in production too). params as jit arguments
    # (closure-captured params become giant compile-time constants).
    @jax.jit
    def caption_kernel(p, images_u8):
        pixels = device_preprocess(images_u8, spec_name)
        if tiny:
            pixels = jax.image.resize(
                pixels, (pixels.shape[0], 3, img_hw, img_hw), "bilinear"
            )
        feats = encode_images(p, mcfg, pixels, cd)
        memory = project_features(p, mcfg, feats, cd)
        tokens, lengths = greedy_generate(
            p["decoder"], mcfg.decoder, memory,
            tok_start, tok_end, tok_pad, max_len, compute_dtype=cd,
        )
        return tokens

    def caption_batch(images_u8):
        return caption_kernel(params, images_u8)

    rng = np.random.default_rng(0)
    images = rng.integers(0, 256, (batch, img_hw, img_hw, 3), dtype=np.uint8)
    images = jnp.asarray(images)

    # warmup/compile — force a host readback: on the remote-tunnel platform
    # block_until_ready() can return before execution finishes, so a
    # dependent device→host fetch is the only trustworthy barrier.
    int(jnp.sum(caption_batch(images)))

    t0 = time.perf_counter()
    acc = jnp.zeros((), jnp.int32)
    for _ in range(iters):
        acc = acc + jnp.sum(caption_batch(images))
    int(acc)  # host fetch: completes only after every iteration ran
    dt = time.perf_counter() - t0

    ips = batch * iters / dt
    baseline_per_chip = 5000.0 / 8.0
    print(
        json.dumps(
            {
                "metric": "caption_images_per_sec_per_chip",
                "value": round(ips, 2),
                "unit": "images/sec/chip",
                "vs_baseline": round(ips / baseline_per_chip, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
