#!/usr/bin/env python
"""Price MEMORY_MODE='full' (S_mem=197) vs 'cls' — batch pipeline + service.

The reference documents full-sequence memory as the alternative encoder
interface (reference encoder.py:107) but never wires it; mit_tpu serves
both. This bench puts a number on what the mode costs (VERDICT r4 weak
#5): cross-attention reads 197 keys per decode step instead of 1, and the
service carries per-slot (L, H, S_mem, hd) cross K/V instead of an
(L, D) constant.

Same-run arms, interleaved reps, median:
  batch pipeline (uint8 -> preprocess -> ViT-B -> project -> greedy):
    cls vs full at the flagship batch (MIT_BENCH_BATCH, default 2048)
  service (precomputed memories, saturated queue, zero-copy admission):
    cls vs full at MIT_BENCH_SLOTS (default 256) slots

Random weights -> no END exits; max_len=16 bounds the decode at realistic
trained caption length (p50 ~12) for BOTH arms, so the cls/full ratio is
the mode's price, not a caption-length artifact.

Writes benchmarks/bench_full_memory_r05.json; prints one JSON line.
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
from mit_tpu.decode.api import Captioner
from mit_tpu.decode.greedy import greedy_generate
from mit_tpu.decode.service import CaptionService
from mit_tpu.models.model import (
    ModelConfig, encode_images, init_model_params, project_features,
)

MAX_LEN = 16


class _Tok:
    pad_id, start_id, end_id = 0, 2, 3

    def decode(self, ids, skip_special_tokens=False):
        return " ".join(map(str, ids))


def main():
    batch = int(os.environ.get("MIT_BENCH_BATCH", 2048))
    slots = int(os.environ.get("MIT_BENCH_SLOTS", 256))
    svc_reqs = int(os.environ.get("MIT_BENCH_REQS", 1024))
    reps = int(os.environ.get("MIT_BENCH_REPS", 3))
    cd = jnp.bfloat16
    cfg = Config(MAX_SEQ_LEN=MAX_LEN)
    spec = "google/vit-base-patch16-224-in21k"

    modes = {}
    for mode in ("cls", "full"):
        mcfg = ModelConfig.build(cfg.replace(MEMORY_MODE=mode),
                                 vocab_size=10000)
        params = init_model_params(jax.random.PRNGKey(0), mcfg)

        @jax.jit
        def kernel(p, u8, shift, stamp, mcfg=mcfg):
            u8 = jnp.roll(u8, shift, axis=0)          # arg uniqueness (see
            u8 = u8.at[0, 0, 0, 0].set(               # bench.py timed_pass)
                jnp.asarray(stamp, jnp.uint8))
            px = device_preprocess(u8, spec)
            feats = encode_images(p, mcfg, px, cd)
            memory = project_features(p, mcfg, feats, cd)
            return greedy_generate(p["decoder"], mcfg.decoder, memory,
                                   2, 3, 0, MAX_LEN, compute_dtype=cd)

        modes[mode] = (mcfg, params, kernel)

    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.integers(0, 256, (batch, 224, 224, 3),
                                      dtype=np.int16).astype(np.uint8))

    # ---- batch pipeline arms -----------------------------------------
    g = [1]

    def timed(kernel, params, n_iters=2):
        t0 = time.perf_counter()
        acc = jnp.zeros((), jnp.int32)
        for _ in range(n_iters):
            shift = g[0] % (batch - 1) + 1
            stamp = (g[0] // (batch - 1)) % 256
            g[0] += 1
            toks, _ = kernel(params, images,
                             jnp.asarray(shift, jnp.int32),
                             jnp.asarray(stamp, jnp.int32))
            acc = acc + jnp.sum(toks)
        int(acc)
        return batch * n_iters / (time.perf_counter() - t0)

    for mode, (mcfg, params, kernel) in modes.items():
        timed(kernel, params, 1)                       # compile + warm
    batch_ips = {m: [] for m in modes}
    for _ in range(reps):
        for mode, (mcfg, params, kernel) in modes.items():
            batch_ips[mode].append(timed(kernel, params))
    batch_med = {m: float(np.median(v)) for m, v in batch_ips.items()}

    # ---- service arms (saturated queue, precomputed memories) --------
    svc_caps = {m: [] for m in modes}
    for mode, (mcfg, params, kernel) in modes.items():
        cap = Captioner(params, mcfg, _Tok(), cfg, compute_dtype=cd)
        enc = jax.jit(lambda p, u8, mcfg=mcfg: project_features(
            p, mcfg, encode_images(p, mcfg, device_preprocess(u8, spec), cd),
            cd).astype(jnp.float32))
        chunk = 256
        mems = [enc(params, images[i:i + chunk])
                for i in range(0, svc_reqs, chunk)]
        jax.block_until_ready(mems)

        def drain():
            svc = CaptionService(cap, num_slots=slots, compute_dtype=cd,
                                 steps_per_sync=12)
            t0 = time.perf_counter()
            for m in mems:
                svc.submit_memory_batch(m)
            svc.run_to_completion()
            return svc_reqs / (time.perf_counter() - t0)

        drain()                                        # compile + shakeout
        for _ in range(reps):
            svc_caps[mode].append(drain())
    svc_med = {m: float(np.median(v)) for m, v in svc_caps.items()}

    out = {
        "bench": "full_memory_vs_cls_r05",
        "s_mem": {"cls": 1, "full": modes["full"][0].vision.seq_len},
        "max_len": MAX_LEN, "batch": batch,
        "batch_pipeline_ips": {m: round(v, 1) for m, v in batch_med.items()},
        "batch_full_over_cls": round(batch_med["full"] / batch_med["cls"], 3),
        "batch_reps": {m: [round(x, 1) for x in v]
                       for m, v in batch_ips.items()},
        "service_slots": slots, "service_requests": svc_reqs,
        "service_caps_per_sec": {m: round(v, 1) for m, v in svc_med.items()},
        "service_full_over_cls": round(svc_med["full"] / svc_med["cls"], 3),
        "service_reps": {m: [round(x, 1) for x in v]
                         for m, v in svc_caps.items()},
        "note": "random weights, max_len=16 both arms — the ratio prices "
                "S_mem=197 cross-attention, not caption-length effects",
    }
    print(json.dumps(out))
    art = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "bench_full_memory_r05.json")
    with open(art, "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
