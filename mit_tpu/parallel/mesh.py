"""Device mesh + sharding rules.

The reference has NO parallelism of any kind (single ``model.to(device)``,
reference train.py:314; no torch.distributed anywhere — SURVEY.md §2).
This module introduces it the TPU way: a logical ``("data", "model")``
mesh over ICI, shardings expressed as ``NamedSharding`` annotations, and
XLA GSPMD inserting the collectives (all-reduce for DP gradients,
all-gather/reduce-scatter around tensor-sharded matmuls) — no NCCL-style
explicit communication in user code.

Strategies:
- **DP** (primary, BASELINE.json config 5): batch sharded over "data",
  params replicated; gradient psum falls out of sharding propagation.
- **TP** (optional, for ViT-L + 12-layer decoder scale, config 4): decoder
  attention heads and FFN hidden dim sharded over "model"; the pattern is
  the standard Megatron split (column-parallel qkv/w1, row-parallel out/w2)
  so each layer needs a single all-reduce per sublayer, riding ICI.
"""

from __future__ import annotations

from typing import Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def create_mesh(
    mesh_shape: Tuple[int, int] = (-1, 1),
    devices=None,
) -> Mesh:
    """Build a ("data", "model") mesh. ``-1`` infers that axis from the
    device count (like a reshape)."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    d, m = mesh_shape
    if d == -1 and m == -1:
        raise ValueError("At most one mesh axis may be -1.")
    if d == -1:
        d = n // m
    if m == -1:
        m = n // d
    if d * m != n:
        raise ValueError(
            f"Mesh shape {(d, m)} does not match {n} available devices."
        )
    arr = np.asarray(devices).reshape(d, m)
    return Mesh(arr, axis_names=("data", "model"))


# ----------------------------------------------------------------------
# PartitionSpec rules
# ----------------------------------------------------------------------
def decoder_param_specs(tp: bool) -> dict:
    """Specs matching the decoder param pytree (models/decoder.py layout).

    With ``tp``: Megatron-style — qkv projections column-parallel (heads
    split over "model"), out row-parallel; FFN w1 column-, w2 row-parallel.
    Embedding/vocab projection stay replicated (vocab softmax needs full
    logits; at V=10k the matmul is small enough that sharding it buys
    nothing at this scale).
    """
    mp = "model" if tp else None
    attn = {
        "wq": P(None, None, mp), "wk": P(None, None, mp), "wv": P(None, None, mp),
        "bq": P(None, mp), "bk": P(None, mp), "bv": P(None, mp),
        "wo": P(None, mp, None), "bo": P(None, None),
    }
    ln = {"scale": P(None, None), "bias": P(None, None)}
    return {
        "token_embedding": P(None, None),
        "layers": {
            "self": dict(attn),
            "cross": dict(attn),
            "ffn": {
                "w1": P(None, None, mp), "b1": P(None, mp),
                "w2": P(None, mp, None), "b2": P(None, None),
            },
            "ln1": dict(ln), "ln2": dict(ln), "ln3": dict(ln),
        },
        "fc_out_w": P(None, None),
        "fc_out_b": P(None),
    }


def vision_param_specs(params: dict, tp: bool) -> dict:
    """Specs for the frozen encoder. TP shards attention/FFN like the
    decoder; otherwise fully replicated."""
    mp = "model" if tp else None

    def spec_for(path, leaf):
        name = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
        nd = leaf.ndim
        if tp and name in ("wq", "wk", "wv", "fc1"):
            return P(*([None] * (nd - 1)), mp)
        if tp and name in ("bq", "bk", "bv", "b1"):
            return P(*([None] * (nd - 1)), mp)
        if tp and name in ("wo", "fc2"):
            return P(*([None] * (nd - 2)), mp, None)
        return P(*([None] * nd))

    return jax.tree_util.tree_map_with_path(spec_for, params)


def model_param_specs(params: dict, tp: bool = False) -> dict:
    """Specs for the full model param pytree."""
    specs = {}
    if "encoder" in params:
        specs["encoder"] = vision_param_specs(params["encoder"], tp)
    specs["decoder"] = decoder_param_specs(tp)
    if "projection" in params:
        specs["projection"] = {"w": P(None, None), "b": P(None)}
    return specs


BATCH_SPECS = {
    "images": P("data"),
    "features": P("data"),
    "decoder_input_tokens": P("data"),
    "target_tokens": P("data"),
}


def shard_tree(tree, specs, mesh: Mesh):
    """device_put a pytree with NamedShardings built from PartitionSpecs."""
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
        tree,
        specs,
        is_leaf=lambda x: x is None,
    )


def shard_batch(batch: dict, mesh: Mesh) -> dict:
    import jax.numpy as jnp

    out = {}
    for k, v in batch.items():
        spec = BATCH_SPECS.get(k)
        if spec is None:
            out[k] = v
        else:
            out[k] = jax.device_put(jnp.asarray(v), NamedSharding(mesh, spec))
    return out


def replicate(tree, mesh: Mesh):
    return jax.tree.map(
        lambda x: jax.device_put(x, NamedSharding(mesh, P())), tree
    )


# ----------------------------------------------------------------------
def shard_train_state(state, mesh: Mesh, mcfg, tp: bool = False):
    """Shard a TrainState: params by rule, optimizer state to match.

    optax's mu/nu mirror the param tree, so the same specs apply; scalar
    counters replicate. Leaves whose structure we don't recognize (e.g.
    EmptyState) replicate.
    """
    from mit_tpu.train.steps import TrainState

    trainable_specs = {
        k: v for k, v in model_param_specs(state.params, tp).items()
        if k in state.params
    }
    params = shard_tree(state.params, trainable_specs, mesh)

    def shard_opt(os):
        # param-shaped subtrees get param specs; everything else replicates
        def go(node):
            if isinstance(node, dict) and set(node) == set(state.params):
                try:
                    return shard_tree(node, trainable_specs, mesh)
                except Exception:
                    return replicate(node, mesh)
            if isinstance(node, (list, tuple)):
                vals = [go(x) for x in node]
                return type(node)(*vals) if hasattr(node, "_fields") else type(node)(vals)
            if isinstance(node, dict):
                return {k: go(v) for k, v in node.items()}
            return jax.device_put(node, NamedSharding(mesh, P()))
        return go(os)

    return TrainState(
        step=jax.device_put(state.step, NamedSharding(mesh, P())),
        params=params,
        opt_state=shard_opt(state.opt_state),
    )
