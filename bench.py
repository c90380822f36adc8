#!/usr/bin/env python
"""Headline benchmark: Flickr30k-style captioning throughput per chip.

Pipeline measured end-to-end on device: fused uint8 preprocess → ViT-B/16
frozen encoder (bf16, MXU) → projection → KV-cached batched greedy decode —
the reference's inference.py path, rebuilt TPU-native (the reference decodes
one image at a time with an uncached O(T²) loop, reference model.py:219-242).

Headline mode (default): the flagship decoder is first TRAINED in-bench
(a few hundred AdamW steps on cached features of a deterministic 8-class
color dataset, caption length 12) so generation terminates with REAL
END-token early exits at realistic caption lengths — what production
serving sees. The worst-case number (random weights → no sequence ever
emits END, every caption runs all 100 steps) is also measured and reported
as a secondary key. The decoder keeps the full 10k-vocab logits matmul, so
per-step FLOPs match the flagship configuration.

MFU accounting: analytic matmul FLOPs (2*M*N*K) for the encoder and the
executed decode steps, divided by wall time x 197 TFLOP/s (v5e bf16 peak).

Baseline (BASELINE.md): ≥5,000 images/sec on a v5e-8 slice → 625
images/sec/chip. vs_baseline = measured / 625.

Measurement discipline (round-3 fix — the round-2 artifact recorded a
worst-case number *above* the trained pipeline, which is physically
impossible for the same workload; a single contiguous pass per config on a
±10% tunnel was not enough): every config is timed in INTERLEAVED
repetitions ({bf16, worst, int8} × reps) and the reported value is the
per-config MEDIAN. The trained-bf16 ≥ worst-case invariant is checked and
any violation is recorded in the JSON ("invariant_violation") instead of
silently shipping.

Prints exactly one JSON line.
Env: MIT_BENCH_TINY=1        tiny shapes for CPU smoke runs
     MIT_BENCH_HEADLINE      one of auto|bf16|int8|worst (default auto =
                             int8 iff its captions are token-identical to
                             bf16, else bf16 — the production-serving pick)
     MIT_BENCH_WORSTCASE=1   headline = worst-case (round-1 behavior)
     MIT_BENCH_BATCH / MIT_BENCH_ITERS / MIT_BENCH_TRAIN_STEPS /
     MIT_BENCH_REPS overrides.
"""

import json
import os
import time

import numpy as np

V5E_BF16_PEAK = 197e12  # FLOP/s per chip


def encoder_flops_per_image(v) -> float:
    """Analytic matmul FLOPs (2MNK) of one ViT forward."""
    s = v.seq_len
    d = v.hidden_size
    f = v.intermediate_size
    patch = 2 * v.num_patches * (3 * v.patch_size * v.patch_size) * d
    per_layer = (
        2 * 4 * s * d * d          # q/k/v/out projections
        + 2 * 2 * s * d * f        # mlp fc1 + fc2
        + 2 * 2 * s * s * d        # scores + probs*V
    )
    return patch + v.num_layers * per_layer


def decode_flops_per_step_per_seq(dec) -> float:
    """One KV-cached greedy step for one sequence (T=1 query)."""
    d = dec.embed_dim
    f = dec.ff_dim
    # self qkv+out on 1 token, cross out+v (memory len 1), mlp, logits
    per_layer = 2 * 4 * d * d + 2 * 2 * d * d + 2 * 2 * d * f
    return dec.num_layers * per_layer + 2 * d * dec.vocab_size


def make_color_dataset(batch, img_hw, rng):
    """Deterministic 8-class noisy color images + 12-token captions whose
    token ids span the full 10k vocab (so logits FLOPs are flagship-real)."""
    colors = np.array(
        [[220, 30, 30], [30, 200, 30], [40, 40, 220], [230, 230, 30],
         [160, 40, 200], [240, 140, 20], [235, 235, 235], [25, 25, 25]],
        np.int16,
    )
    cls = rng.integers(0, 8, batch)
    noise = rng.integers(-25, 25, (batch, img_hw, img_hw, 3), dtype=np.int16)
    images = np.clip(colors[cls][:, None, None, :] + noise, 0, 255).astype(
        np.uint8
    )
    # fixed 12-token caption per class: START, 10 class words, END
    word_table = rng.integers(4, 10000, (8, 10), dtype=np.int32)
    caps = np.full((batch, 13), 0, np.int32)       # trailing PAD
    caps[:, 0] = 2                                  # START
    caps[:, 1:11] = word_table[cls]
    caps[:, 11] = 3                                 # END
    return images, caps


def main():
    tiny = os.environ.get("MIT_BENCH_TINY") == "1"
    worstcase_headline = os.environ.get("MIT_BENCH_WORSTCASE") == "1"
    # validate the headline knob BEFORE the multi-minute run — a typo'd
    # value must not throw away the measurements at the final dict lookup
    headline_choice = os.environ.get("MIT_BENCH_HEADLINE", "auto")
    if headline_choice not in ("auto", "bf16", "int8", "worst"):
        print(
            f"WARNING: MIT_BENCH_HEADLINE={headline_choice!r} not in "
            "{auto,bf16,int8,worst}; using 'auto'"
        )
        headline_choice = "auto"

    import jax
    import jax.numpy as jnp

    from mit_tpu.config import Config
    from mit_tpu.data.preprocess import device_preprocess
    from mit_tpu.decode.greedy import greedy_generate
    from mit_tpu.models.decoder import DecoderConfig
    from mit_tpu.models.model import (
        ModelConfig,
        encode_images,
        init_model_params,
        project_features,
        split_trainable,
    )
    from mit_tpu.models.vision import VisionConfig
    from mit_tpu.train.steps import init_train_state, make_optimizer, make_train_step

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
        train_steps = int(os.environ.get("MIT_BENCH_TRAIN_STEPS", 4))
        img_hw = 32
    else:
        mcfg = ModelConfig.build(cfg, vocab_size=10000)  # ViT-B/16 + 6L decoder
        # batch 2048 + iters 2 = the same images per timed pass as the old
        # 1024x4, but the per-token decode step's fixed overhead (the step
        # is latency-bound, not FLOP-bound) amortizes over twice the rows:
        # measured same-day 4,472 (1024) -> 4,619 img/s (2048) on the int8
        # pipeline. 4096 regressed in the round-2 sweep (HBM pressure).
        batch = int(os.environ.get("MIT_BENCH_BATCH", 2048))
        # iters_per_rep is ADAPTIVE by default (round-5 fix): each timed
        # pass ends with ONE dependent device->host fetch (the completion
        # barrier), which costs a tunnel RTT. At the round-4 default
        # (iters=2, ~862 ms windows) that fetch was ~5% of the window —
        # a measurement artifact, not device throughput. None here means
        # "calibrate after the RTT probe so the fetch is <1% of the window".
        iters_env = os.environ.get("MIT_BENCH_ITERS")
        iters = int(iters_env) if iters_env else None
        train_steps = int(os.environ.get("MIT_BENCH_TRAIN_STEPS", 300))
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
    def caption_kernel(p, images_u8, shift=None, stamp=None):
        # argument-uniqueness transforms (roll + wrap stamp) run INSIDE the
        # jit: a separate jnp.roll dispatch materializes its 308 MB output
        # between programs, which the tunnel round-trips when synced
        # (~1.3 s measured at B=2048; see benchmarks/ab_pipeline_breakdown)
        if shift is not None:
            images_u8 = jnp.roll(images_u8, shift, axis=0)
            images_u8 = images_u8.at[0, 0, 0, 0].set(
                jnp.asarray(stamp, jnp.uint8))
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
        return tokens, lengths

    rng = np.random.default_rng(0)
    images, caps = make_color_dataset(batch, img_hw, rng)
    images = jnp.asarray(images)

    # ------------------------------------------------------------------
    # Train the decoder on cached features → real END-exit behavior.
    # ------------------------------------------------------------------
    if mcfg.decoder.vocab_size < 10000:  # tiny mode: clamp caption ids
        caps = np.minimum(caps, mcfg.decoder.vocab_size - 1)
    encode_fn = jax.jit(
        lambda p, u8: encode_images(
            p, mcfg,
            device_preprocess(u8, spec_name) if not tiny else jax.image.resize(
                device_preprocess(u8, spec_name),
                (u8.shape[0], 3, img_hw, img_hw), "bilinear",
            ),
            cd,
        )
    )
    features = np.asarray(encode_fn(params, images), np.float32)
    trainable, frozen = split_trainable(params)
    optimizer, _ = make_optimizer(cfg.replace(LEARNING_RATE=3e-4))
    step = make_train_step(
        mcfg, optimizer, tok_pad, cd, from_features=True, donate=False
    )
    state = init_train_state(trainable, optimizer)
    tb = min(batch, 256)
    rngk = jax.random.PRNGKey(0)
    t_train = time.perf_counter()
    for i in range(train_steps):
        sel = rng.integers(0, batch, tb)
        tb_batch = {
            "features": jnp.asarray(features[sel]),
            "decoder_input_tokens": jnp.asarray(caps[sel, :-1]),
            "target_tokens": jnp.asarray(caps[sel, 1:]),
        }
        state, loss = step(state, {}, tb_batch, rngk)
    final_loss = float(loss)
    t_train = time.perf_counter() - t_train
    trained = {**state.params, **frozen}

    # ------------------------------------------------------------------
    # int8 (W8A8) frozen-encoder serving path: same pipeline, encoder GEMMs
    # on the MXU's int8 mode. Caption agreement vs the bf16 pipeline is the
    # quality check (tokens, not features).
    from mit_tpu.models.vision import quantize_vision_params

    trained_q = dict(trained)
    trained_q["encoder"] = jax.jit(
        lambda p: quantize_vision_params(p, mcfg.vision)
    )(trained["encoder"])

    # GLOBAL dispatch counter: no two dispatches in the whole run may share
    # identical (executable, args) — the tunnel can serve repeats from its
    # result cache. A global counter (vs the old rep*iters+i formula) stays
    # collision-free when passes use different iteration counts (the
    # adaptive-iters calibration pass does). It starts at 1 because g=0
    # maps to (shift=1, stamp=0), byte-identical to the warmup dispatch.
    _dispatch_g = [1]

    def timed_pass(p, n_iters):
        """One timed pass of `n_iters` pipeline iterations → (ips, lengths, dt).

        A dependent device→host fetch is the completion barrier: on the
        remote-tunnel platform block_until_ready() can return before
        execution finishes. The fetch costs one tunnel RTT per pass, so
        n_iters is sized (adaptively, below) to keep it <1% of the window.
        The batch is rolled by the global dispatch counter; the roll shift
        is kept in [1, batch-1] (shift ≡ 0 mod batch would reproduce the
        unrolled warmup dispatch byte-for-byte, e.g. tiny mode's batch=8
        with reps*iters >= 8); on wraparound one pixel is stamped with the
        wrap count so the args stay globally unique."""
        t0 = time.perf_counter()
        acc = jnp.zeros((), jnp.int32)
        for _ in range(n_iters):
            g = _dispatch_g[0]
            _dispatch_g[0] += 1
            span = max(batch - 1, 1)   # batch=1: roll is identity, the wrap
            shift = g % span + 1       # stamp de-dups
            wrap = g // span
            tokens, lengths = caption_kernel(
                p, images, jnp.asarray(shift, jnp.int32),
                jnp.asarray(wrap % 256, jnp.int32),
            )
            acc = acc + jnp.sum(tokens)
        int(acc)  # host fetch: completes only after every iteration ran
        dt = time.perf_counter() - t0
        return batch * n_iters / dt, np.asarray(lengths), dt

    # Tunnel-health probes: the remote-tunnel platform's latency/throughput
    # varies >2x day to day (round-3 observed spreads up to 71% on identical
    # code). Recording a fixed reference workload alongside the pipeline
    # numbers lets cross-day artifacts be read in context.
    @jax.jit
    def _probe_rtt(x):
        return x + 1.0

    @jax.jit
    def _probe_gemm(a):
        for _ in range(4):                      # dependent chain: no overlap
            a = jnp.tanh(a @ a)
        return a[0, 0]

    n_ref = 512 if tiny else 2048
    a_ref = jnp.ones((n_ref, n_ref), jnp.bfloat16) * 0.01
    float(_probe_gemm(a_ref))                   # compile
    float(_probe_rtt(jnp.zeros((1,), jnp.float32))[0])
    rtts, gemms = [], []
    for _ in range(5):
        t0 = time.perf_counter()
        float(_probe_rtt(jnp.zeros((1,), jnp.float32))[0])
        rtts.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        float(_probe_gemm(a_ref))
        gemms.append(time.perf_counter() - t0)
    tunnel_rtt_ms = 1e3 * float(np.median(rtts))
    ref_gemm_ms = 1e3 * float(np.median(gemms))

    configs = {"bf16": trained, "worst": params, "int8": trained_q}
    # warmup/compile every config BEFORE any timing (one compile per params
    # dtype layout; all three share the bf16 executable except int8)
    for p in configs.values():
        tokens, _ = caption_kernel(p, images)
        int(jnp.sum(tokens))
        # the timed form (in-jit roll+stamp) is a separate trace — compile
        # it here so rep 1 doesn't pay the compile
        tokens, _ = caption_kernel(
            p, images, jnp.asarray(1, jnp.int32), jnp.asarray(0, jnp.int32)
        )
        int(jnp.sum(tokens))

    # Adaptive iters_per_rep (round-5): calibrate with one short bf16 pass,
    # then size the window so the dependent fetch (≈ one tunnel RTT) is
    # <1% of it. Clamped to [8, 32]: 8 already amortizes the round-4 tax
    # (~5% at iters=2) below ~1.3%, 32 bounds the run on a 90 ms tunnel.
    rtt_s = tunnel_rtt_ms / 1e3
    if iters is None:
        _, _, dt_cal = timed_pass(trained, 2)
        per_iter = max((dt_cal - rtt_s) / 2, 1e-4)
        iters = int(min(32, max(8, np.ceil(100.0 * rtt_s / per_iter))))

    # INTERLEAVED repetitions, median per config: a single contiguous pass
    # per config let ±10-40% tunnel variance ship an impossible ordering in
    # the round-2 artifact (worst-case "faster" than the trained pipeline).
    reps = int(os.environ.get("MIT_BENCH_REPS", 2 if tiny else 5))
    max_reps = int(os.environ.get("MIT_BENCH_MAX_REPS", 20))
    spread_cap = float(os.environ.get("MIT_BENCH_SPREAD_CAP", 20.0))
    samples = {k: [] for k in configs}
    lengths_by = {}
    dt_by = {k: [] for k in configs}
    rep_counter = 0
    for _ in range(reps):
        for name, p in configs.items():
            ips, lens, dt = timed_pass(p, iters)
            samples[name].append(ips)
            lengths_by[name] = lens
            dt_by[name].append(dt)
        rep_counter += 1

    def spread_pct(vals):
        return 100.0 * (max(vals) - min(vals)) / max(vals)

    # ADAPTIVE reps (round-4 fix): a fixed 5 reps let the round-3 artifact
    # ship a bf16 median whose individual samples spanned 2x (spread 97.8%).
    # Any config whose min-to-max spread exceeds the cap keeps earning more
    # interleaved reps — doubling up to max_reps — so noise-dominated
    # medians get more evidence instead of equal time with quiet ones.
    while rep_counter < max_reps:
        noisy = [n for n in configs if spread_pct(samples[n]) > spread_cap]
        if not noisy:
            break
        for name in noisy:
            ips, lens, dt = timed_pass(configs[name], iters)
            samples[name].append(ips)
            lengths_by[name] = lens
            dt_by[name].append(dt)
        rep_counter += 1
    retry_exhausted = [
        n for n in configs if spread_pct(samples[n]) > spread_cap
    ]
    ips_trained = float(np.median(samples["bf16"]))
    ips_worst = float(np.median(samples["worst"]))
    ips_int8 = float(np.median(samples["int8"]))
    lengths = lengths_by["bf16"]

    tokens_bf16 = np.asarray(caption_kernel(trained, images)[0])
    tokens_int8 = np.asarray(caption_kernel(trained_q, images)[0])
    int8_caption_match = float(
        np.mean(np.all(tokens_bf16 == tokens_int8, axis=1))
    )

    # physical invariant: the trained pipeline decodes ~12 steps, the
    # worst case decodes max_len — trained must NOT be slower
    invariant_violation = None
    if ips_trained < ips_worst * 0.98:
        invariant_violation = (
            f"trained bf16 ({ips_trained:.0f}) < worst-case ({ips_worst:.0f}) "
            "— physically impossible for the same workload; treat this run's "
            "numbers as noise-dominated"
        )
        print(f"WARNING: {invariant_violation}")

    # MFU: analytic FLOPs of the work actually executed. The while_loop
    # runs until the LAST sequence in the batch emits END. int8 encoder
    # GEMMs rate against the v5e int8 peak (2x bf16).
    steps_executed = int(lengths.max())
    dec_flops = batch * steps_executed * decode_flops_per_step_per_seq(mcfg.decoder)
    enc_flops = batch * encoder_flops_per_image(mcfg.vision)
    dt_bf16 = float(np.median(dt_by["bf16"]))
    dt_int8 = float(np.median(dt_by["int8"]))
    mfu = (enc_flops + dec_flops) * iters / dt_bf16 / V5E_BF16_PEAK
    steps_int8 = int(lengths_by["int8"].max())
    mfu_int8 = (
        (enc_flops / 2.0  # int8 MACs count half vs the bf16 peak scale
         + batch * steps_int8 * decode_flops_per_step_per_seq(mcfg.decoder))
        * iters / dt_int8 / V5E_BF16_PEAK
    )

    # Headline selection is an EXPLICIT knob (MIT_BENCH_HEADLINE); the
    # default "auto" picks the int8 pipeline iff its captions are
    # token-identical to bf16's on this batch — the configuration a
    # production deployment would serve — else the bf16 pipeline. All
    # configs are always reported for trend tracking.
    choice = headline_choice
    if worstcase_headline:
        choice = "worst"
    int8_faithful = int8_caption_match == 1.0
    if choice == "auto":
        choice = "int8" if int8_faithful else "bf16"
    headline, headline_cfg = {
        "bf16": (ips_trained, "bf16"),
        "int8": (ips_int8, "int8_encoder"),
        "worst": (ips_worst, "bf16_worst_case"),
    }[choice]
    baseline_per_chip = 5000.0 / 8.0
    out = {
        "metric": "caption_images_per_sec_per_chip",
        "value": round(headline, 2),
        "unit": "images/sec/chip",
        "vs_baseline": round(headline / baseline_per_chip, 3),
        "headline_config": headline_cfg,
        "bf16_pipeline_ips": round(ips_trained, 2),
        "worst_case_full_length_ips": round(ips_worst, 2),
        "int8_encoder_ips": round(ips_int8, 2),
        "int8_caption_match": round(int8_caption_match, 4),
        # the measured workload's geometry: without it a cross-round artifact
        # reader can't tell a batch-size change from a regression (the
        # worst-case 1,881 -> 1,013 reading between BENCH_r02 and r03 was the
        # 1024 -> 2048 default-batch change, not a slowdown)
        "batch": batch,
        "iters_per_rep": iters,
        # share of the timed window spent on the completion-barrier fetch
        # (one tunnel RTT per pass) — a measurement artifact, kept <1% by
        # the adaptive iters so the value reads as device throughput
        "fetch_share_pct_bf16": round(100.0 * rtt_s / dt_bf16, 2),
        "fetch_share_pct_int8": round(100.0 * rtt_s / dt_int8, 2),
        "reps": reps,
        # adaptive reps: per-config sample counts actually used (noisy
        # configs earn interleaved extras, doubling up to MIT_BENCH_MAX_REPS)
        "reps_used": {k: len(v) for k, v in samples.items()},
        # min-to-max rep spread per pipeline: how noise-dominated THIS run
        # was (the int8 one qualifies the usual headline config)
        "spread_pct_bf16": round(spread_pct(samples["bf16"]), 1),
        "spread_pct_int8": round(spread_pct(samples["int8"]), 1),
        "spread_pct_worst": round(spread_pct(samples["worst"]), 1),
        "decode_len_p50": int(np.median(lengths)),
        "decode_steps_executed": steps_executed,
        "train_loss_after_prep": round(final_loss, 4),
        "mfu_bf16_pipeline": round(mfu, 4),
        "mfu_int8_pipeline": round(mfu_int8, 4),
        # fixed-workload health probes (see comment above timed_pass):
        # rtt ≈ dispatch+fetch round trip; ref_gemm ≈ a dependent 4-GEMM
        # bf16 chain (2048^3, ~69 GFLOP ≈ 0.35 ms of MXU work at peak)
        # + one rtt — both dominated by tunnel state, which is the point
        "tunnel_rtt_ms": round(tunnel_rtt_ms, 2),
        "ref_gemm_ms": round(ref_gemm_ms, 2),
    }
    if retry_exhausted:
        out["spread_retry_exhausted"] = sorted(retry_exhausted)
    if invariant_violation:
        out["invariant_violation"] = invariant_violation
    print(json.dumps(out))


if __name__ == "__main__":
    main()
