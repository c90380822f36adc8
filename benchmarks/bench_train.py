#!/usr/bin/env python
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
"""Training-step throughput: images/sec with and without the frozen-feature
cache (BASELINE.json configs 1 & 3)."""

import json
import os
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from mit_tpu.config import Config
    from mit_tpu.models.model import ModelConfig, init_model_params, split_trainable
    from mit_tpu.train.steps import init_train_state, make_optimizer, make_train_step

    cfg = Config()
    mcfg = ModelConfig.build(cfg, vocab_size=10000)
    params = init_model_params(jax.random.PRNGKey(0), mcfg)
    trainable, frozen = split_trainable(params)
    optimizer, _ = make_optimizer(cfg)
    b = int(os.environ.get("MIT_BENCH_BATCH", 128))
    t = cfg.MAX_SEQ_LEN - 1
    iters = int(os.environ.get("MIT_BENCH_ITERS", 10))
    rng = np.random.default_rng(0)
    toks = rng.integers(4, 10000, (b, t + 1), dtype=np.int32)
    rngk = jax.random.PRNGKey(0)

    from mit_tpu.models.vision import quantize_vision_params

    frozen_q = {
        "encoder": jax.jit(
            lambda p: quantize_vision_params(p, mcfg.vision)
        )(frozen["encoder"])
    }

    out = {}
    for name, from_features, fr_sel in (
        ("cached_features", True, None),
        ("full_pipeline", False, "bf16"),
        ("full_pipeline_int8_encoder", False, "int8"),
    ):
        step = make_train_step(
            mcfg, optimizer, cfg.PAD_TOKEN_ID, jnp.bfloat16,
            from_features=from_features, donate=False,
        )
        batch = {
            "decoder_input_tokens": jnp.asarray(toks[:, :-1]),
            "target_tokens": jnp.asarray(toks[:, 1:]),
        }
        if from_features:
            batch["features"] = jnp.asarray(
                rng.normal(size=(b, 1, mcfg.vision.hidden_size)), jnp.float32
            )
            fr = {}
        else:
            batch["images"] = jnp.asarray(
                rng.normal(size=(b, 3, 224, 224)), jnp.float32
            )
            fr = frozen if fr_sel == "bf16" else frozen_q
        state = init_train_state(trainable, optimizer)
        state, loss = step(state, fr, batch, rngk)
        float(loss)  # compile + sync
        t0 = time.perf_counter()
        for _ in range(iters):
            state, loss = step(state, fr, batch, rngk)
        float(loss)
        dt = time.perf_counter() - t0
        out[name] = round(b * iters / dt, 1)

    print(json.dumps({
        "metric": "train_images_per_sec_per_chip",
        **out,
        "cache_speedup": round(out["cached_features"] / out["full_pipeline"], 2),
    }))


if __name__ == "__main__":
    main()
