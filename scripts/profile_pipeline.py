#!/usr/bin/env python
"""Capture a jax.profiler trace of the headline captioning pipeline.

Runbook for the profiling subsystem (utils/profiling.py — the TPU-native
replacement for the reference's wall-clock epoch timing, reference
train.py:381-410): compiles the int8 serving pipeline at a reduced batch,
captures one traced pass, and prints where the trace landed plus the
StepTimer throughput of the traced step.

    python scripts/profile_pipeline.py [logdir] [--batch N]

View with TensorBoard (`tensorboard --logdir <logdir>`) or load the
.trace.json.gz into Perfetto. On the remote-tunnel platform host-side
gaps include tunnel RTT — read device-side op spans, not wall gaps.
"""
import argparse
import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("logdir", nargs="?", default="/tmp/mit_profile")
    ap.add_argument("--batch", type=int, default=256)
    args = ap.parse_args()

    import numpy as np
    import jax
    import jax.numpy as jnp

    from mit_tpu.config import Config
    from mit_tpu.data.preprocess import device_preprocess
    from mit_tpu.decode.greedy import greedy_generate
    from mit_tpu.models.model import (ModelConfig, encode_images,
                                      init_model_params, project_features)
    from mit_tpu.models.vision import quantize_vision_params
    from mit_tpu.utils.profiling import StepTimer, fence, trace

    cfg = Config()
    mcfg = ModelConfig.build(cfg, vocab_size=10000)
    params = init_model_params(jax.random.PRNGKey(0), mcfg)
    params = dict(params)
    params["encoder"] = jax.jit(
        lambda p: quantize_vision_params(p, mcfg.vision)
    )(params["encoder"])
    cd = jnp.bfloat16
    spec = mcfg.encoder_name

    @jax.jit
    def pipeline(p, u8):
        feats = encode_images(p, mcfg, device_preprocess(u8, spec), cd)
        mem = project_features(p, mcfg, feats, cd)
        toks, _ = greedy_generate(
            p["decoder"], mcfg.decoder, mem, 2, 3, 0,
            mcfg.decoder.max_seq_len, compute_dtype=cd,
        )
        return toks

    rng = np.random.default_rng(0)
    u8 = jnp.asarray(
        rng.integers(0, 255, (args.batch, 224, 224, 3), dtype=np.uint8)
    )
    fence(pipeline(params, u8))          # compile outside the trace

    timer = StepTimer()
    with trace(args.logdir):
        with timer.step(args.batch):
            fence(pipeline(params, u8))

    files = glob.glob(os.path.join(args.logdir, "**", "*.trace.json.gz"),
                      recursive=True) or glob.glob(
        os.path.join(args.logdir, "**", "*.xplane.pb"), recursive=True)
    print(f"traced pass: {timer.summary()}")
    if files:
        print(f"trace written: {files[-1]}")
        return 0
    print(f"ERROR: no trace artifact under {args.logdir}", file=sys.stderr)
    return 1


if __name__ == "__main__":
    sys.exit(main())
