"""Training orchestration — the equivalent of reference train.py:153-490.

Same flow, TPU-native internals:
  auto-prepare dataset → seed → wandb → (train tokenizer iff missing) →
  load tokenizer, derive special IDs + actual vocab size → dataset/split →
  model init (or resume) → [optional frozen-feature cache] → epoch loop with
  periodic validation, best-val checkpointing (orbax state + reference-layout
  safetensors) and optional HF Hub upload.
"""

from __future__ import annotations

import json
import os
import time
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from mit_tpu.config import CONFIG, Config
from mit_tpu.data.dataset import ImageTextDataset, Loader, split_indices
from mit_tpu.data.prepare import prepare_flickr30k
from mit_tpu.models.model import ModelConfig, init_model_params, split_trainable
from mit_tpu.text.tokenizer import get_tokenizer, train_tokenizer
from mit_tpu.train import checkpoint as ckpt
from mit_tpu.train.features import FeatureCache, attach_features
from mit_tpu.train.steps import (
    init_train_state,
    make_eval_step,
    make_optimizer,
    make_train_step,
)


# ----------------------------------------------------------------------
def setup_wandb(cfg: Config):
    """Initialize wandb (reference train.py:23-60); returns None when
    unavailable — training proceeds with console logging only."""
    try:
        import wandb

        run = wandb.init(
            project=cfg.WANDB_PROJECT,
            entity=cfg.WANDB_ENTITY,
            name=cfg.WANDB_RUN_NAME,
            mode=os.environ.get("WANDB_MODE", "offline"),
            config={
                "encoder_model": cfg.ENCODER_MODEL_NAME,
                "decoder_layers": cfg.DECODER_LAYERS,
                "decoder_heads": cfg.DECODER_HEADS,
                "decoder_ff_dim": cfg.DECODER_FF_DIM,
                "embedding_dim": cfg.DECODER_EMBED_DIM,
                "max_seq_len": cfg.MAX_SEQ_LEN,
                "dropout": cfg.DECODER_DROPOUT,
                "learning_rate": cfg.LEARNING_RATE,
                "epochs": cfg.NUM_EPOCHS,
                "batch_size": cfg.BATCH_SIZE,
                "vocab_size": cfg.VOCAB_SIZE,
                "warmup_steps": cfg.WARMUP_STEPS,
                "adam_beta1": cfg.ADAM_BETA1,
                "adam_beta2": cfg.ADAM_BETA2,
                "adam_eps": cfg.ADAM_EPS,
                "weight_decay": cfg.WEIGHT_DECAY,
                "grad_clip": cfg.GRAD_CLIP_VALUE,
                "projection_dim": cfg.PROJECTION_DIM,
                "compute_dtype": cfg.COMPUTE_DTYPE,
                "mesh_shape": list(cfg.MESH_SHAPE),
                "cache_encoder_features": cfg.CACHE_ENCODER_FEATURES,
            },
        )
        return run
    except Exception as e:
        print(f"wandb unavailable ({e}); continuing without experiment tracking.")
        return None


def ensure_tokenizer(cfg: Config):
    """Train the BPE tokenizer from all captions iff files are missing
    (reference train.py:189-233), then load it."""
    if not (os.path.exists(cfg.VOCAB_PATH) and os.path.exists(cfg.MERGES_PATH)):
        print("Tokenizer files missing — training from captions ...")
        with open(cfg.CAPTIONS_FILE, "r", encoding="utf-8") as f:
            captions_data = json.load(f)
        all_captions = []
        if isinstance(captions_data, dict):
            for v in captions_data.values():
                if isinstance(v, list):
                    all_captions.extend(c for c in v if isinstance(c, str))
                elif isinstance(v, str):
                    all_captions.append(v)
        if not all_captions:
            raise ValueError(
                f"No caption strings found in {cfg.CAPTIONS_FILE}; "
                "cannot train tokenizer."
            )
        train_tokenizer(
            iter(all_captions), cfg.VOCAB_SIZE, cfg.VOCAB_PATH, cfg.MERGES_PATH, cfg
        )
    return get_tokenizer(cfg, force_reload=True)


def build_model_params(cfg: Config, mcfg, key, vocab_size):
    """Model params honoring ``cfg.PRETRAINED_ENCODER`` (see config.py).

    Returns (mcfg, params); mcfg's vision geometry is replaced by the real
    checkpoint's when pretrained weights load. The reference equivalent is
    the unconditional ``AutoModel.from_pretrained`` at model.py:50.
    """
    from mit_tpu.models.model import init_model_params_pretrained

    mode = cfg.PRETRAINED_ENCODER
    if mode == "off":
        return mcfg, init_model_params(key, mcfg)
    name = None if mode in ("auto", "required") else mode
    local_only = os.environ.get("MIT_ALLOW_DOWNLOAD", "0") != "1"
    try:
        mcfg, params = init_model_params_pretrained(
            key, cfg, vocab_size, name_or_path=name,
            local_files_only=local_only,
        )
        print(f"Loaded pretrained encoder weights "
              f"({name or cfg.ENCODER_MODEL_NAME}).")
        return mcfg, params
    except Exception as e:
        if mode != "auto":
            raise
        print(f"Pretrained encoder unavailable ({e}); "
              "falling back to random encoder init.")
        return mcfg, init_model_params(key, mcfg)


# ----------------------------------------------------------------------
def train(
    cfg: Config = CONFIG,
    auto_prepare: bool = True,
    wandb_enabled: bool = True,
    hf_upload=None,                     # callable(path, name) or None
    max_steps_per_epoch: Optional[int] = None,   # for smoke tests
) -> Dict:
    """Run the full training job; returns a summary dict."""
    t_setup = time.time()
    if auto_prepare:
        prepare_flickr30k(cfg)
    os.makedirs(cfg.OUTPUT_DIR, exist_ok=True)

    rng = jax.random.PRNGKey(cfg.RANDOM_SEED)
    np.random.seed(cfg.RANDOM_SEED)

    wandb_run = setup_wandb(cfg) if wandb_enabled else None
    log = (lambda d: wandb_run.log(d)) if wandb_run else (lambda d: None)

    # Default HF Hub uploader (reference train.py:177-186, 458-474): ensure
    # the repo exists up front; failures disable uploads gracefully.
    if hf_upload is None and cfg.HF_UPLOAD_BEST_CHECKPOINTS:
        try:
            from huggingface_hub import HfApi, create_repo

            create_repo(cfg.HF_REPO_ID, repo_type="model", exist_ok=True)
            _api = HfApi()

            def hf_upload(path, name):
                _api.upload_file(
                    path_or_fileobj=path, path_in_repo=name,
                    repo_id=cfg.HF_REPO_ID, repo_type="model",
                )

            print(f"HF Hub repo '{cfg.HF_REPO_ID}' ready for uploads.")
        except Exception as e:
            print(f"HF Hub unavailable; uploads disabled. ({e})")
            hf_upload = None

    tokenizer = ensure_tokenizer(cfg)
    cfg = cfg.with_tokenizer_ids(tokenizer)
    actual_vocab_size = tokenizer.get_vocab_size()
    print(f"Tokenizer loaded; vocab size {actual_vocab_size}.")

    dataset = ImageTextDataset(
        cfg.IMAGE_DIR, cfg.CAPTIONS_FILE, cfg.MAX_SEQ_LEN, tokenizer,
        cfg.ENCODER_MODEL_NAME,
    )
    if len(dataset) == 0:
        raise ValueError("Dataset is empty — check IMAGE_DIR and CAPTIONS_FILE.")
    tr_idx, va_idx = split_indices(
        len(dataset), cfg.TRAIN_SPLIT_RATIO, cfg.RANDOM_SEED
    )
    print(f"Dataset split: {len(tr_idx)} train / {len(va_idx)} val samples.")

    # --- device mesh (BASELINE config 5: data-parallel training on a
    # v5e-8 slice; the reference is strictly single-device, reference
    # train.py:314). MESH_SHAPE=(1,1) keeps the single-device fast path;
    # anything else builds a ("data","model") mesh, shards batches over
    # "data" and (optionally) decoder matmuls over "model", and lets XLA
    # GSPMD insert the gradient psum over ICI.
    mesh = None
    use_tp = False
    if tuple(cfg.MESH_SHAPE) != (1, 1):
        from mit_tpu.parallel.mesh import create_mesh

        mesh = create_mesh(cfg.MESH_SHAPE)
        n_data = mesh.shape["data"]
        use_tp = mesh.shape["model"] > 1
        if cfg.BATCH_SIZE % n_data != 0:
            raise ValueError(
                f"BATCH_SIZE={cfg.BATCH_SIZE} must be divisible by the mesh "
                f"data axis ({n_data}) so every chip gets equal batch shards."
            )
        print(f"Device mesh: data={n_data}, model={mesh.shape['model']} "
              f"({n_data * mesh.shape['model']} devices).")

    mcfg = ModelConfig.build(cfg, vocab_size=actual_vocab_size)
    rng, k_init = jax.random.split(rng)
    mcfg, params = build_model_params(cfg, mcfg, k_init, actual_vocab_size)
    trainable, frozen = split_trainable(params)

    # Optional W8A8 quantization of the frozen encoder for the COMPUTE path
    # only — `frozen` keeps the float weights for checkpoint export.
    step_encoder = frozen
    if cfg.ENCODER_QUANT == "int8":
        from mit_tpu.models.vision import quantize_vision_params

        step_encoder = {
            "encoder": jax.jit(
                lambda p: quantize_vision_params(p, mcfg.vision)
            )(frozen["encoder"])
        }
        print("Frozen encoder quantized to int8 (W8A8) for training compute.")
    elif cfg.ENCODER_QUANT != "none":
        raise ValueError(
            f"ENCODER_QUANT must be 'none' or 'int8', got {cfg.ENCODER_QUANT!r}"
        )

    # --- frozen-feature cache (encoder leaves the train step entirely).
    # Works for CLS (fp32, ~95 MB) and full-sequence memory (bf16, bounded
    # by FEATURE_CACHE_MAX_BYTES — too large falls back to in-graph
    # encoding instead of OOMing the host).
    use_cache = cfg.CACHE_ENCODER_FEATURES
    cache = None
    compute_dtype = jnp.bfloat16 if cfg.COMPUTE_DTYPE == "bfloat16" else jnp.float32
    if use_cache:
        from mit_tpu.train.features import FeatureCacheTooLarge

        print("Building frozen-encoder feature cache ...")
        try:
            # encode with the SAME compute dtype the in-graph fallback path
            # trains with, so cached and uncached training see identical
            # encoder features (bf16 storage then rounds nothing new)
            cache = FeatureCache.build(
                dataset, step_encoder["encoder"], mcfg,
                batch_size=min(cfg.BATCH_SIZE, 64),
                num_workers=cfg.NUM_WORKERS,
                max_bytes=cfg.FEATURE_CACHE_MAX_BYTES,
                compute_dtype=compute_dtype,
            )
            print(f"Feature cache: {cache.features.shape} "
                  f"@ {cache.features.dtype}, {cache.nbytes / 1e6:.1f} MB")
        except FeatureCacheTooLarge as e:
            print(f"{e}; training with the encoder in-graph instead.")
            use_cache = False

    # With cached features the loaders skip pixel work entirely — batches
    # carry only tokens + paths; features attach from the cache (the
    # reference re-decodes and re-encodes every image every epoch,
    # reference train.py:83, model.py:133-136).
    loader_kw = dict(
        batch_size=cfg.BATCH_SIZE, num_workers=cfg.NUM_WORKERS,
        load_images=not use_cache,
        bad_paths=cache.failed_paths if cache else None,
    )
    train_loader = Loader(
        dataset, tr_idx, shuffle=True, seed=cfg.RANDOM_SEED, **loader_kw
    )
    val_loader = Loader(dataset, va_idx, shuffle=False, **loader_kw)

    steps_per_epoch = len(train_loader)
    optimizer, schedule = make_optimizer(cfg, steps_per_epoch)
    lr_at = schedule if callable(schedule) else (lambda step: schedule)
    state = init_train_state(trainable, optimizer)

    train_step = make_train_step(
        mcfg, optimizer, cfg.PAD_TOKEN_ID, compute_dtype, from_features=use_cache
    )
    eval_step = make_eval_step(
        mcfg, cfg.PAD_TOKEN_ID, compute_dtype, from_features=use_cache
    )
    step_frozen = {} if use_cache else step_encoder
    if mesh is not None and step_frozen:
        from mit_tpu.parallel.mesh import model_param_specs, replicate, shard_tree

        if use_tp and cfg.ENCODER_QUANT == "none":
            # Megatron-split the frozen encoder's attention/FFN matmuls over
            # "model"; int8-quantized trees have a different leaf layout and
            # are ~4x smaller, so they simply replicate.
            step_frozen = shard_tree(
                step_frozen,
                {"encoder": model_param_specs(params, tp=True)["encoder"]},
                mesh,
            )
        else:
            step_frozen = replicate(step_frozen, mesh)

    _frozen_host_cache = []

    def frozen_host():
        """Host copy of the frozen subtree, fetched once and reused by
        every checkpoint save (the frozen encoder never changes)."""
        if not _frozen_host_cache:
            _frozen_host_cache.append(jax.device_get(frozen))
        return _frozen_host_cache[0]

    # --- resume (reference train.py:343-375) ---
    start_epoch, best_val_loss = 0, float("inf")
    if cfg.RESUME_CHECKPOINT_PATH:
        try:
            state, start_epoch, best_val_loss = ckpt.restore_train_state(
                cfg.RESUME_CHECKPOINT_PATH, state
            )
            print(f"Resumed from {cfg.RESUME_CHECKPOINT_PATH}; "
                  f"starting at epoch {start_epoch + 1}.")
        except Exception as e:
            print(f"Error loading checkpoint: {e}. Starting from scratch.")
            start_epoch, best_val_loss = 0, float("inf")

    # shard AFTER resume so the restore template stays single-device; the
    # jitted step then keeps params/optimizer state in their sharded layout
    # (replicated for pure DP, Megatron-split over "model" for TP)
    if mesh is not None:
        from mit_tpu.parallel.mesh import shard_train_state

        state = shard_train_state(state, mesh, mcfg, tp=use_tp)

    print(f"Setup done in {time.time() - t_setup:.1f}s; training "
          f"epochs {start_epoch + 1}..{cfg.NUM_EPOCHS}.")
    rng, step_rng = jax.random.split(rng)
    summary = {"epochs": [], "best_val_loss": best_val_loss, "best_checkpoint": None}
    if mesh is not None:
        summary["mesh"] = {"data": mesh.shape["data"],
                           "model": mesh.shape["model"]}

    from mit_tpu.data.dataset import prefetch_to_device

    step_keys = ("images", "features", "decoder_input_tokens", "target_tokens")

    if mesh is not None:
        from mit_tpu.parallel.mesh import shard_batch

    def to_device(batch):
        batch = attach_features(batch, cache)
        batch = {k: v for k, v in batch.items() if k in step_keys}
        if mesh is not None:
            # batch arrays shard over "data": each chip receives only its
            # 1/n_data slice of the H2D transfer, and GSPMD derives the
            # gradient all-reduce from the sharding annotations
            return shard_batch(batch, mesh)
        return {k: jnp.asarray(v) for k, v in batch.items()}

    for epoch in range(start_epoch, cfg.NUM_EPOCHS):
        t0 = time.time()
        n_batches = 0
        loss_sum = None                 # device-side accumulator: the host
        gstep = int(state.step)         # never blocks on a step's result
        # device_put for batch i+1 is issued before step i's result is
        # consumed: host assembly + H2D transfer overlap device compute.
        # Loss stays on device (a host float() per step would serialize the
        # pipeline); it is fetched only at LOG_INTERVAL and epoch ends.
        for i, arrays in enumerate(prefetch_to_device(train_loader, to_device)):
            if max_steps_per_epoch and i >= max_steps_per_epoch:
                break
            state, loss = train_step(state, step_frozen, arrays, step_rng)
            loss_sum = loss if loss_sum is None else loss_sum + loss
            n_batches += 1
            gstep += 1
            if gstep % cfg.LOG_INTERVAL == 0:
                # per-step loss + lr, the reference's wandb surface
                # (reference train.py:115-120)
                log({"train_batch_loss": float(loss),
                     "learning_rate": float(lr_at(gstep)),
                     "global_step": gstep})
        train_loss = (
            float(loss_sum) / n_batches if n_batches else 0.0
        )
        dur = time.time() - t0
        sps = n_batches / max(dur, 1e-9)
        ips = sps * cfg.BATCH_SIZE
        print(f"Epoch {epoch + 1}/{cfg.NUM_EPOCHS} | Train loss {train_loss:.4f} "
              f"| {dur:.1f}s ({sps:.2f} steps/s, {ips:.0f} images/s)")
        log({"epoch_train_loss": train_loss, "epoch": epoch + 1,
             "epoch_duration_seconds": dur, "train_images_per_sec": ips})

        epoch_summary = {"epoch": epoch + 1, "train_loss": train_loss}

        if (epoch + 1) % cfg.VALIDATION_INTERVAL == 0 and len(va_idx) > 0:
            tv = time.time()
            nll_sum, tok_sum = None, None   # device-side accumulators
            merged = {**state.params, **step_frozen}
            for i, batch in enumerate(val_loader):
                if max_steps_per_epoch and i >= max_steps_per_epoch:
                    break
                arrays = to_device(batch)
                s, c = eval_step(merged, arrays)
                nll_sum = s if nll_sum is None else nll_sum + s
                tok_sum = c if tok_sum is None else tok_sum + c
            val_loss = (
                float(nll_sum) / max(1.0, float(tok_sum))
                if nll_sum is not None else 0.0
            )
            print(f"Epoch {epoch + 1} | Val loss {val_loss:.4f} "
                  f"| {time.time() - tv:.1f}s")
            log({"epoch_val_loss": val_loss, "epoch": epoch + 1})
            epoch_summary["val_loss"] = val_loss

            # best-val checkpointing (reference train.py:412-455)
            if val_loss < best_val_loss:
                best_val_loss = val_loss
                name = ckpt.checkpoint_filename(cfg, epoch, val_loss)
                st_path = os.path.join(cfg.OUTPUT_DIR, name + ".safetensors")
                # frozen encoder never changes: fetch its host copy ONCE
                # (it is ~80% of the bytes; re-fetching 344 MB per epoch
                # cost ~100 s/checkpoint over a tunneled device)
                full_params = {**state.params, **frozen_host()}
                ckpt.save_safetensors(st_path, full_params, mcfg)
                # resume state is NOT saved here: with the default
                # TRAIN_STATE_INTERVAL=1 the end-of-epoch autosave writes
                # the same "latest" dir this epoch (the old double save
                # cost a full extra optimizer-state fetch); with a larger
                # interval, resume granularity is the interval — weights
                # are still exported on every improvement
                print(f"Checkpoint saved: {st_path} (val loss {val_loss:.4f})")
                summary["best_checkpoint"] = st_path
                if wandb_run:  # model artifact (reference train.py:445-455)
                    try:
                        import wandb

                        art = wandb.Artifact(
                            f"{cfg.WANDB_RUN_NAME or 'model'}-epoch{epoch + 1}",
                            type="model",
                            description=(
                                f"Checkpoint at epoch {epoch + 1}, "
                                f"val loss {val_loss:.4f}"
                            ),
                        )
                        art.add_file(st_path)
                        wandb_run.log_artifact(art)
                    except Exception as e:
                        print(f"wandb artifact logging failed: {e}")
                if hf_upload and cfg.HF_UPLOAD_BEST_CHECKPOINTS:
                    try:
                        hf_upload(st_path, os.path.basename(st_path))
                    except Exception as e:
                        print(f"HF upload failed (continuing): {e}")
            else:
                print(f"Val loss {val_loss:.4f} did not improve on "
                      f"{best_val_loss:.4f}; not saving.")

        # crash recovery: checkpoint the latest completed epoch (best-val
        # checkpointing alone can lose many epochs on a failure — the
        # reference's only recovery is manual RESUME_CHECKPOINT_PATH,
        # reference config.py:104). TRAIN_STATE_INTERVAL thins the saves
        # (the optimizer state is ~4x the weight bytes); the final epoch
        # always saves so training end is always resumable.
        interval = max(1, cfg.TRAIN_STATE_INTERVAL)
        if (epoch + 1) % interval == 0 or epoch + 1 == cfg.NUM_EPOCHS:
            try:
                ckpt.save_train_state(
                    os.path.join(cfg.OUTPUT_DIR, "latest"), state, epoch,
                    best_val_loss, cfg,
                )
            except Exception as e:
                print(f"Warning: periodic train-state save failed: {e}")

        summary["epochs"].append(epoch_summary)

    summary["best_val_loss"] = best_val_loss
    if mesh is not None:
        # observability: the trained state really lives on the mesh (every
        # param leaf spans all mesh devices — replicated under pure DP,
        # Megatron-split under TP)
        leaves = jax.tree_util.tree_leaves(state.params)
        summary["param_devices"] = min(len(x.sharding.device_set) for x in leaves)
    if wandb_run:
        wandb_run.finish()
    return summary
