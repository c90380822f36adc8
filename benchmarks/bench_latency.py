#!/usr/bin/env python
"""p50/p99 single-image caption latency (BASELINE.md: p50 < 50 ms).

Measures the serving-relevant path: preprocessed image on device → encoder
→ projection → KV-cached greedy decode to MAX_SEQ_LEN, batch 1, bf16.
"""

import json
import os
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from mit_tpu.config import Config
    from mit_tpu.decode.greedy import greedy_generate
    from mit_tpu.models.model import (
        ModelConfig, encode_images, init_model_params, project_features,
    )

    cfg = Config()
    mcfg = ModelConfig.build(cfg, vocab_size=10000)
    params = init_model_params(jax.random.PRNGKey(0), mcfg)
    cd = jnp.bfloat16
    reps = int(os.environ.get("MIT_BENCH_REPS", 30))

    @jax.jit
    def caption_one(p, pixels):
        feats = encode_images(p, mcfg, pixels, cd)
        memory = project_features(p, mcfg, feats, cd)
        tokens, _ = greedy_generate(
            p["decoder"], mcfg.decoder, memory, 2, 3, 0,
            mcfg.decoder.max_seq_len, compute_dtype=cd,
        )
        return tokens

    pixels = jnp.asarray(
        np.random.default_rng(0).normal(size=(1, 3, 224, 224)), jnp.float32
    )
    int(jnp.sum(caption_one(params, pixels)))  # compile + sync

    lat = []
    for _ in range(reps):
        t0 = time.perf_counter()
        int(jnp.sum(caption_one(params, pixels)))  # host fetch = true barrier
        lat.append((time.perf_counter() - t0) * 1000.0)
    lat.sort()
    print(json.dumps({
        "metric": "caption_latency_ms",
        "p50": round(lat[len(lat) // 2], 2),
        "p99": round(lat[min(len(lat) - 1, int(len(lat) * 0.99))], 2),
        "mean": round(sum(lat) / len(lat), 2),
        "target_p50": 50.0,
    }))


if __name__ == "__main__":
    main()
