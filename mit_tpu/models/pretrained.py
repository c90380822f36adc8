"""Pretrained encoder ingestion: name-or-path → (VisionConfig, params).

The reference's entire premise is a *pre-trained* frozen encoder pulled with
``AutoModel.from_pretrained(ENCODER_MODEL_NAME)`` (reference model.py:50,
encoder.py:20-63). This module is the TPU-native equivalent: it resolves an
HF repo id, a local HF-layout directory, or a bare weights file
(safetensors / torch ``.bin`` / ``.pt``), slices out the vision tower, and
converts it through :func:`mit_tpu.models.vision.params_from_hf_vision` into
our pure-JAX param pytree. No torch model is ever instantiated — only the
state dict is read (torch is used solely to deserialize ``.bin``/``.pt``).

Config discovery order:
1. ``config.json`` next to the weights (parsed as a plain dict — works
   without the transformers classes);
2. otherwise geometry is inferred from tensor shapes in the state dict
   (hidden size / patch size from the patch-projection weight, depth from
   layer-key indices, image size from the positional table).

All three encoder families the reference dispatches on (vit / clip / blip,
reference model.py:34-55) are supported, including full multimodal
checkpoints where the tower nests under ``vision_model.``.
"""

from __future__ import annotations

import json
import os
import re
from typing import Optional, Tuple

from mit_tpu.models.vision import (
    PRESETS,
    VisionConfig,
    detect_hf_prefix,
    params_from_hf_vision,
)

_FAMILY_BASE = {
    "vit": PRESETS["google/vit-base-patch16-224-in21k"],
    "clip": PRESETS["openai/clip-vit-base-patch32"],
    "blip": PRESETS["Salesforce/blip-image-captioning-base"],
}

_WEIGHT_FILES = ("model.safetensors", "pytorch_model.bin", "pytorch_model.pt")


# ----------------------------------------------------------------------
# State-dict loading
# ----------------------------------------------------------------------
def load_state_dict(path: str) -> dict:
    """Load a raw state dict from safetensors or a torch pickle.

    Torch checkpoints saved by the reference's training loop nest weights
    under ``model_state_dict`` (reference train.py:421-435); that wrapper is
    unwrapped automatically.
    """
    if path.endswith(".safetensors"):
        from mit_tpu.utils.safetensors_io import load_file

        return load_file(path)
    import torch

    try:
        obj = torch.load(path, map_location="cpu", weights_only=True)
    except Exception:
        # reference-era .pt checkpoints embed python objects
        # (reference train.py:350 loads with weights_only=False)
        obj = torch.load(path, map_location="cpu", weights_only=False)
    for wrapper in ("model_state_dict", "state_dict"):
        if isinstance(obj, dict) and wrapper in obj and isinstance(
            obj[wrapper], dict
        ):
            obj = obj[wrapper]
    return obj


def detect_family(sd: dict) -> str:
    """Infer the encoder family from state-dict key shapes.

    Mirrors the reference's name-substring dispatch (model.py:34-55), but on
    the weights themselves so bare files with uninformative names still load:
    ViT uses ``patch_embeddings.projection``, BLIP packs attention into a
    single ``self_attn.qkv``, CLIP has per-projection ``self_attn.q_proj``.
    """
    has_vit = has_qkv = has_qproj = False
    for k in sd:
        if "patch_embeddings.projection" in k:
            has_vit = True
        elif "self_attn.qkv." in k:
            has_qkv = True
        elif "self_attn.q_proj" in k:
            has_qproj = True
    if has_vit:
        return "vit"
    if has_qkv:
        return "blip"
    if has_qproj:
        return "clip"
    raise ValueError(
        "Could not detect a ViT/CLIP/BLIP vision tower in the state dict "
        f"({len(sd)} keys; e.g. {sorted(sd)[:3]})."
    )


# ----------------------------------------------------------------------
# Config discovery
# ----------------------------------------------------------------------
def config_from_json_dict(d: dict, family: Optional[str] = None) -> VisionConfig:
    """Build a VisionConfig from a parsed HF ``config.json`` dict.

    Accepts vision-only configs (ViTModel / CLIPVisionModel /
    BlipVisionModel) and composite CLIP/BLIP configs, taking their nested
    ``vision_config`` — the same fallback the reference's hidden-dim
    discovery applies (reference model.py:59-66).
    """
    model_type = str(d.get("model_type", "")).lower()
    if "vision_config" in d and isinstance(d["vision_config"], dict):
        d = d["vision_config"]
        model_type = str(d.get("model_type", model_type)).lower()
    if family is None:
        src = model_type or ""
        family = "blip" if "blip" in src else "clip" if "clip" in src else "vit"
    base = _FAMILY_BASE[family]
    return base._replace(
        image_size=int(d.get("image_size", base.image_size)),
        patch_size=int(d.get("patch_size", base.patch_size)),
        hidden_size=int(d.get("hidden_size", base.hidden_size)),
        num_layers=int(d.get("num_hidden_layers", base.num_layers)),
        num_heads=int(d.get("num_attention_heads", base.num_heads)),
        intermediate_size=int(d.get("intermediate_size", base.intermediate_size)),
        hidden_act=str(d.get("hidden_act", base.hidden_act)),
        layer_norm_eps=float(d.get("layer_norm_eps", base.layer_norm_eps)),
    )


def infer_config_from_state_dict(
    sd: dict, family: str, prefix: str
) -> VisionConfig:
    """Recover the geometry from tensor shapes when no config.json exists.

    num_heads is not recoverable from shapes; head_dim=64 holds for every
    model in the reference's dispatch table (ViT-B/L, CLIP-B/L, BLIP-base),
    so ``hidden_size // 64`` is used.
    """
    base = _FAMILY_BASE[family]
    if family == "vit":
        conv = sd[prefix + "embeddings.patch_embeddings.projection.weight"]
        pos = sd[prefix + "embeddings.position_embeddings"]
        fc1 = sd[prefix + "encoder.layer.0.intermediate.dense.weight"]
        layer_re = re.compile(re.escape(prefix) + r"encoder\.layer\.(\d+)\.")
    else:
        conv = sd[prefix + "embeddings.patch_embedding.weight"]
        pos_key = (
            "embeddings.position_embedding.weight"
            if family == "clip"
            else "embeddings.position_embedding"
        )
        pos = sd[prefix + pos_key]
        fc1 = sd[prefix + "encoder.layers.0.mlp.fc1.weight"]
        layer_re = re.compile(re.escape(prefix) + r"encoder\.layers\.(\d+)\.")
    hidden = int(conv.shape[0])
    patch = int(conv.shape[2])
    seq_len = int(pos.shape[-2]) if pos.ndim > 1 else int(pos.shape[0])
    grid = int(round((seq_len - 1) ** 0.5))
    num_layers = 1 + max(
        int(m.group(1)) for k in sd if (m := layer_re.match(k)) is not None
    )
    return base._replace(
        image_size=patch * grid,
        patch_size=patch,
        hidden_size=hidden,
        num_layers=num_layers,
        num_heads=max(1, hidden // 64),
        intermediate_size=int(fc1.shape[0]),
    )


# ----------------------------------------------------------------------
# Source resolution
# ----------------------------------------------------------------------
def resolve_encoder_source(
    name_or_path: str, local_files_only: bool = False
) -> Tuple[str, Optional[str]]:
    """Resolve to (weights_path, config_json_path_or_None).

    Accepts: a weights file, an HF-layout directory, or an HF repo id. Repo
    ids check the local HF cache first; a network download is attempted only
    when ``local_files_only`` is False.
    """
    p = os.path.expanduser(name_or_path)
    if os.path.isfile(p):
        cj = os.path.join(os.path.dirname(p) or ".", "config.json")
        return p, cj if os.path.isfile(cj) else None
    if os.path.isdir(p):
        weights = None
        for cand in _WEIGHT_FILES:
            if os.path.isfile(os.path.join(p, cand)):
                weights = os.path.join(p, cand)
                break
        if weights is None:
            sts = sorted(
                f for f in os.listdir(p) if f.endswith((".safetensors", ".bin"))
            )
            if not sts:
                raise FileNotFoundError(
                    f"No weights file (*.safetensors / *.bin) in directory {p}."
                )
            weights = os.path.join(p, sts[0])
        cj = os.path.join(p, "config.json")
        return weights, cj if os.path.isfile(cj) else None

    # HF repo id: local cache first, then (optionally) the network.
    errors = []
    try:
        from huggingface_hub import hf_hub_download
    except Exception as e:  # pragma: no cover - hub is a baked-in dep
        raise ValueError(
            f"'{name_or_path}' is not a local path and huggingface_hub is "
            f"unavailable ({e})."
        )
    tries = [True] if local_files_only else [True, False]
    for local_only in tries:
        for cand in _WEIGHT_FILES:
            try:
                weights = hf_hub_download(
                    name_or_path, cand, local_files_only=local_only
                )
            except Exception as e:
                errors.append(f"{cand} (local_only={local_only}): {e}")
                continue
            try:
                cj = hf_hub_download(
                    name_or_path, "config.json", local_files_only=local_only
                )
            except Exception:
                cj = None
            return weights, cj
    raise ValueError(
        f"Could not resolve pretrained encoder '{name_or_path}': not a local "
        "file/directory, and the HF hub lookup failed.\n  "
        + "\n  ".join(errors[-4:])
    )


# ----------------------------------------------------------------------
# Public API
# ----------------------------------------------------------------------
def load_pretrained_encoder(
    name_or_path: str,
    family: Optional[str] = None,
    local_files_only: bool = False,
) -> Tuple[VisionConfig, dict]:
    """Load real pretrained vision-tower weights → (VisionConfig, params).

    The capability equivalent of the reference's
    ``AutoModel.from_pretrained(...)`` + ``.vision_model`` slicing
    (reference model.py:48-66): pass an HF repo id
    (``google/vit-base-patch16-224-in21k``), a local ``save_pretrained``
    directory, or a safetensors/torch weights file. Works for all three
    families; composite CLIP/BLIP checkpoints are sliced to their vision
    tower automatically.
    """
    weights_path, config_path = resolve_encoder_source(
        name_or_path, local_files_only
    )
    sd = load_state_dict(weights_path)
    if family is None:
        family = detect_family(sd)
    prefix = detect_hf_prefix(sd, _FAMILY_BASE[family])
    if config_path is not None:
        with open(config_path, "r", encoding="utf-8") as f:
            cfg = config_from_json_dict(json.load(f), family=family)
    else:
        cfg = infer_config_from_state_dict(sd, family, prefix)
    params = params_from_hf_vision(sd, cfg, prefix)
    return cfg, params
