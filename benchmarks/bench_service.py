#!/usr/bin/env python
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
"""Continuous-batching service throughput (BASELINE config 5).

Measures sustained captions/sec of CaptionService with a saturated queue:
a trained decoder (in-process quick train, same recipe as bench.py) so
captions terminate at real lengths and slots actually recycle. The service
syncs argmax to the host every step (END detection + admission), so this
number includes the host round-trip — on a tunneled chip that dominates;
co-located hosts see better.

Env: MIT_BENCH_SLOTS (default 256), MIT_BENCH_REQS (default 2048).
"""

import json
import os
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from mit_tpu.config import Config
    from mit_tpu.decode.api import Captioner
    from mit_tpu.decode.service import CaptionService
    from mit_tpu.models.model import ModelConfig, init_model_params, split_trainable
    from mit_tpu.train.steps import init_train_state, make_optimizer, make_train_step

    class _Tok:
        pad_id, start_id, end_id = 0, 2, 3

        def decode(self, ids, skip_special_tokens=False):
            return " ".join(str(i) for i in ids)

    cfg = Config()
    mcfg = ModelConfig.build(cfg, vocab_size=10000)
    params = init_model_params(jax.random.PRNGKey(0), mcfg)
    slots = int(os.environ.get("MIT_BENCH_SLOTS", 256))
    reqs = int(os.environ.get("MIT_BENCH_REQS", 2048))
    rng = np.random.default_rng(0)
    d_enc = mcfg.vision.hidden_size
    d_dec = mcfg.decoder.embed_dim

    # quick-train the decoder on 8 feature classes -> 12-token captions
    classes = rng.integers(0, 8, 4096)
    feats = (rng.normal(size=(8, 1, d_enc)) * 2.0)[classes] + rng.normal(
        size=(4096, 1, d_enc)) * 0.1
    word_table = rng.integers(4, 10000, (8, 10), dtype=np.int32)
    caps = np.zeros((4096, 13), np.int32)
    caps[:, 0] = 2
    caps[:, 1:11] = word_table[classes]
    caps[:, 11] = 3
    trainable, frozen = split_trainable(params)
    optimizer, _ = make_optimizer(cfg.replace(LEARNING_RATE=3e-4))
    step = make_train_step(mcfg, optimizer, 0, jnp.bfloat16,
                           from_features=True, donate=False)
    state = init_train_state(trainable, optimizer)
    rngk = jax.random.PRNGKey(0)
    for i in range(200):
        sel = rng.integers(0, 4096, 256)
        state, loss = step(state, {}, {
            "features": jnp.asarray(feats[sel], jnp.float32),
            "decoder_input_tokens": jnp.asarray(caps[sel, :-1]),
            "target_tokens": jnp.asarray(caps[sel, 1:]),
        }, rngk)
    print(f"prep train loss {float(loss):.4f}")
    trained = {**state.params, **frozen}

    cap = Captioner(trained, mcfg, _Tok(), cfg, compute_dtype=jnp.bfloat16)
    svc = CaptionService(cap, num_slots=slots, compute_dtype=jnp.bfloat16,
                         steps_per_sync=int(os.environ.get("MIT_BENCH_WINDOW", 4)))

    # project features through the trained projection -> decoder memory rows
    mem = np.asarray(
        jax.jit(lambda p, f: f.astype(jnp.float32) @ p["projection"]["w"]
                + p["projection"]["b"])(trained, jnp.asarray(feats[:reqs]))
    )

    # warm up compile with a few requests
    for i in range(min(8, reqs)):
        svc.submit_memory(mem[i])
    svc.run_to_completion()

    t0 = time.perf_counter()
    for i in range(reqs):
        svc.submit_memory(mem[i])
    results = svc.run_to_completion()
    dt = time.perf_counter() - t0
    lens = [len(v) for v in results.values()]
    print(json.dumps({
        "metric": "service_captions_per_sec_per_chip",
        "value": round(reqs / dt, 1),
        "unit": "captions/sec/chip",
        "slots": slots,
        "requests": reqs,
        "caption_len_p50": float(np.median(lens)),
        "decode_steps": svc.steps_run,
    }))


if __name__ == "__main__":
    main()
