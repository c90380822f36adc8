"""Checkpointing: orbax train state + reference-layout safetensors weights.

Reference: train.py:343-375 (resume) and :412-455 (dual-format best-val
checkpointing: full ``.pt`` training state + weights-only ``.safetensors``).

TPU-native equivalents:
- **train state** (params, optimizer state, step/epoch/best-val) →
  orbax (sharding-aware, atomic) + a JSON sidecar for scalars/config;
- **weights interchange** → ``.safetensors`` in the *reference's exact key
  layout* (``encoder.* / projection.* / decoder.*`` torch naming), so
  checkpoints flow both directions between this framework and the reference
  implementation.
"""

from __future__ import annotations

import json
import os
import re
from typing import Optional, Tuple

import numpy as np

from mit_tpu.config import Config
from mit_tpu.models.decoder import (
    params_from_torch_state_dict,
    torch_state_dict_from_params,
)
from mit_tpu.models.model import ModelConfig
from mit_tpu.models.vision import (
    detect_hf_prefix,
    hf_vision_state_dict_from_params,
    params_from_hf_vision,
)
from mit_tpu.train.steps import TrainState


# ----------------------------------------------------------------------
# Reference-layout safetensors (weights interchange)
# ----------------------------------------------------------------------
def reference_state_dict_from_params(params: dict, mcfg: ModelConfig) -> dict:
    """Full-model numpy state dict in the reference's checkpoint naming."""
    sd = {}
    sd.update(
        hf_vision_state_dict_from_params(params["encoder"], mcfg.vision, "encoder.")
    )
    if "projection" in params:
        sd["projection.weight"] = np.asarray(params["projection"]["w"]).T.astype(
            np.float32
        )
        sd["projection.bias"] = np.asarray(params["projection"]["b"]).astype(
            np.float32
        )
    sd.update(torch_state_dict_from_params(params["decoder"], "decoder."))
    return sd


def params_from_reference_state_dict(sd: dict, mcfg: ModelConfig) -> dict:
    """Inverse: load a reference-format checkpoint into our param pytree.

    Accepts the exact layout reference inference.py:66-67 consumes.
    """
    import jax.numpy as jnp

    enc_prefix = detect_hf_prefix(sd, mcfg.vision)
    params = {
        "encoder": params_from_hf_vision(sd, mcfg.vision, enc_prefix),
        "decoder": params_from_torch_state_dict(sd, mcfg.decoder, "decoder."),
    }
    if mcfg.needs_projection:
        w = sd["projection.weight"]
        b = sd["projection.bias"]
        if hasattr(w, "detach"):
            w, b = w.detach().cpu().numpy(), b.detach().cpu().numpy()
        params["projection"] = {
            "w": jnp.asarray(np.asarray(w, np.float32).T),
            "b": jnp.asarray(np.asarray(b, np.float32)),
        }
    return params


def save_safetensors(path: str, params: dict, mcfg: ModelConfig) -> None:
    from safetensors.numpy import save_file

    sd = reference_state_dict_from_params(params, mcfg)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    save_file({k: np.ascontiguousarray(v) for k, v in sd.items()}, path)


def load_safetensors(path: str, mcfg: ModelConfig) -> dict:
    from safetensors.numpy import load_file

    return params_from_reference_state_dict(load_file(path), mcfg)


def checkpoint_filename(cfg: Config, epoch: int, val_loss: float) -> str:
    """Reference naming: prefix + sanitized encoder + epoch + val loss
    (reference train.py:416-419)."""
    safe = cfg.ENCODER_MODEL_NAME.replace("/", "_")
    return f"{cfg.CHECKPOINT_PREFIX}_{safe}_epoch_{epoch + 1}_val_loss_{val_loss:.4f}"


_CKPT_RE = re.compile(r"_epoch_(\d+)_val_loss_([\d.]+)\.safetensors$")


def parse_checkpoint_filename(name: str) -> Optional[Tuple[int, float]]:
    m = _CKPT_RE.search(name)
    if not m:
        return None
    return int(m.group(1)), float(m.group(2).rstrip("."))


# ----------------------------------------------------------------------
# Orbax train-state checkpointing (resume support)
# ----------------------------------------------------------------------
def save_train_state(
    directory: str,
    state: TrainState,
    epoch: int,
    best_val_loss: float,
    cfg: Config,
) -> str:
    """Atomic save of the full training state (reference train.py:421-435
    saves model+optimizer+epoch+best_val in one .pt)."""
    import orbax.checkpoint as ocp

    directory = os.path.abspath(directory)
    path = os.path.join(directory, "train_state")
    tree = {"step": state.step, "params": state.params, "opt_state": state.opt_state}
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, tree, force=True)
    meta = {
        "epoch": epoch,
        "best_val_loss": best_val_loss,
        "config": json.loads(cfg.to_json()),
    }
    with open(os.path.join(directory, "train_state_meta.json"), "w") as f:
        json.dump(meta, f, indent=2)
    return path


def restore_train_state(
    directory: str, template: TrainState
) -> Tuple[TrainState, int, float]:
    """Restore (state, start_epoch, best_val_loss); raises if absent.

    ``template`` provides the pytree structure (same role as constructing the
    model/optimizer before ``load_state_dict``, reference train.py:350-357).
    """
    import orbax.checkpoint as ocp

    directory = os.path.abspath(directory)
    path = os.path.join(directory, "train_state")
    tree = {
        "step": template.step,
        "params": template.params,
        "opt_state": template.opt_state,
    }
    with ocp.StandardCheckpointer() as ckptr:
        restored = ckptr.restore(path, tree)
    with open(os.path.join(directory, "train_state_meta.json")) as f:
        meta = json.load(f)
    state = TrainState(
        step=restored["step"],
        params=restored["params"],
        opt_state=restored["opt_state"],
    )
    # resume at the epoch after the last completed one (reference train.py:356)
    return state, meta["epoch"] + 1, meta["best_val_loss"]
