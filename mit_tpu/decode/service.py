"""Continuously-batched captioning service.

BASELINE.json config 5: a serving loop that keeps a static batch of decode
slots full — when one caption finishes, a new image is admitted into its
slot immediately instead of waiting for the whole batch (the reference can
only caption one image per process invocation, reference inference.py).

TPU-first constraints drive the design:
- ONE jitted decode step advances every active slot by one token; shapes
  never change (static slot count, static max_len), so nothing recompiles
  across admissions/evictions;
- slots decode at *different* positions, so the step takes a per-slot
  position vector (the batch greedy loop's scalar position generalized);
- admission swaps a slot's memory/cross-attention constant and resets its
  cache rows with in-place functional updates on device; the host only
  orchestrates (submit/collect), it never touches token math.

CLS memory mode (the reference's configuration) is supported; full-sequence
memory would only change the cross precompute shape.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from mit_tpu.models.decoder import DecoderConfig
from mit_tpu.ops.attention import layer_norm
from mit_tpu.ops.masks import NEG_INF
from mit_tpu.ops.positional import sinusoid_table


@partial(jax.jit, static_argnames=("cfg", "compute_dtype"))
def service_decode_step(
    params: dict,
    cfg: DecoderConfig,
    tokens: jnp.ndarray,        # (S,) current token per slot
    pos: jnp.ndarray,           # (S,) int32 decode position per slot
    active: jnp.ndarray,        # (S,) bool
    key_pad: jnp.ndarray,       # (S, T) bool — PAD keys to mask (reference
                                # rebuilds tgt_key_padding_mask each step)
    k_cache: jnp.ndarray,       # (L, S, H, T, hd)
    v_cache: jnp.ndarray,
    cross_const: jnp.ndarray,   # (L, S, D)
    compute_dtype=jnp.float32,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """One token for every slot at its own position → (logits, k', v').

    ``params`` is the *prepared* pytree from
    :func:`mit_tpu.decode.step.prepare_decode_params` (weights pre-cast and
    qkv-fused once by the service at construction time).
    """
    cd = compute_dtype
    L, s_slots, h, t_max, hd = k_cache.shape
    d = cfg.embed_dim
    lay = params["layers"]

    x = params["emb"][tokens] * jnp.asarray(math.sqrt(d), cd)
    pos_table = sinusoid_table(cfg.max_seq_len, d, dtype=cd)
    x = x + pos_table[jnp.clip(pos, 0, cfg.max_seq_len - 1)]

    # per-slot visibility: key j visible iff j <= pos[slot] and not PAD
    visible = jnp.arange(t_max)[None, None, :] <= pos[:, None, None]  # (S,1,T)
    visible = jnp.logical_and(visible, ~key_pad[:, None, :])
    write_mask = (jnp.arange(t_max)[None, :] == pos[:, None])         # (S,T)
    scale = jnp.asarray(1.0 / math.sqrt(hd), jnp.float32)

    for l in range(L):
        qf, kf, vf = jnp.split(x @ lay["wqkv"][l] + lay["bqkv"][l], 3, -1)
        q = qf.reshape(s_slots, h, hd)
        k_t = kf.reshape(s_slots, h, hd)
        v_t = vf.reshape(s_slots, h, hd)
        # scatter at per-slot positions via a one-hot select
        wm = write_mask[:, None, :, None]                  # (S,1,T,1)
        k_cache = k_cache.at[l].set(
            jnp.where(wm, k_t[:, :, None, :], k_cache[l])
        )
        v_cache = v_cache.at[l].set(
            jnp.where(wm, v_t[:, :, None, :], v_cache[l])
        )

        scores = jnp.einsum(
            "she,shte->sht", q, k_cache[l], preferred_element_type=jnp.float32
        ) * scale
        scores = jnp.where(visible, scores, NEG_INF)
        probs = jax.nn.softmax(scores, axis=-1).astype(cd)
        ctx = jnp.einsum(
            "sht,shte->she", probs, v_cache[l],
            preferred_element_type=jnp.float32,
        ).astype(cd)
        sa = ctx.reshape(s_slots, d) @ lay["wo"][l] + lay["bo"][l]
        x = layer_norm(jax.tree.map(lambda a: a[l], lay["ln1"]), x + sa)
        x = layer_norm(
            jax.tree.map(lambda a: a[l], lay["ln2"]),
            x + cross_const[l].astype(cd),
        )
        y = jax.nn.relu(x @ lay["w1"][l] + lay["b1"][l])
        y = y @ lay["w2"][l] + lay["b2"][l]
        x = layer_norm(jax.tree.map(lambda a: a[l], lay["ln3"]), x + y)

    logits = x.astype(jnp.float32) @ params["fc_w"] + params["fc_b"]
    return logits, k_cache, v_cache


@partial(jax.jit, static_argnames=())
def _cross_const_for(params_layers_cross: dict, memory: jnp.ndarray) -> jnp.ndarray:
    """(L, B, D) per-layer constant cross-attention output for CLS memory."""
    wv = params_layers_cross["wv"]
    bv = params_layers_cross["bv"]
    wo = params_layers_cross["wo"]
    bo = params_layers_cross["bo"]
    vv = jnp.einsum("bsd,lde->lbse", memory, wv) + bv[:, None, None, :]
    out = jnp.einsum("lbse,lef->lbsf", vv, wo) + bo[:, None, None, :]
    return out[:, :, 0, :]


class CaptionService:
    """Host-side orchestration of the continuously-batched decode loop."""

    def __init__(
        self,
        captioner,                         # decode.api.Captioner
        num_slots: int = 64,
        max_len: Optional[int] = None,
        compute_dtype=jnp.float32,
        mesh=None,
    ):
        """``mesh``: an optional ``jax.sharding.Mesh`` with a "data" axis —
        decode slots (and their KV caches) shard across it, so one service
        instance drives a whole v5e-8 slice (BASELINE config 5). Weights
        replicate; the host keeps the full token/position bookkeeping and
        GSPMD runs each slot's math on its owning chip. ``num_slots`` must
        divide evenly across the "data" axis."""
        self.cap = captioner
        cfg = captioner.mcfg.decoder
        self.cfg = cfg
        self.S = num_slots
        self.T = min(max_len or cfg.max_seq_len, cfg.max_seq_len)
        self.cd = compute_dtype
        from mit_tpu.decode.step import prepare_decode_params

        self.mesh = mesh
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            n_data = mesh.shape["data"]
            if num_slots % n_data != 0:
                raise ValueError(
                    f"num_slots={num_slots} must be divisible by the mesh "
                    f"data axis ({n_data})."
                )
            self._shard = lambda x, dim: jax.device_put(
                x, NamedSharding(
                    mesh, P(*(["data" if i == dim else None
                               for i in range(x.ndim)]))
                )
            )
            self._replicate = lambda x: jax.device_put(
                x, NamedSharding(mesh, P())
            )
        else:
            self._shard = lambda x, dim: x
            self._replicate = lambda x: x

        # cast + qkv-fuse the decoder weights once for the whole service life
        self._prepared = jax.tree.map(
            self._replicate,
            jax.jit(lambda p: prepare_decode_params(p, compute_dtype))(
                captioner.params["decoder"]
            ),
        )
        L, h, hd = cfg.num_layers, cfg.num_heads, cfg.embed_dim // cfg.num_heads
        self.k_cache = self._shard(
            jnp.zeros((L, num_slots, h, self.T, hd), compute_dtype), 1
        )
        self.v_cache = self._shard(
            jnp.zeros((L, num_slots, h, self.T, hd), compute_dtype), 1
        )
        self.cross = self._shard(
            jnp.zeros((L, num_slots, cfg.embed_dim), jnp.float32), 1
        )
        self.tokens = np.full((num_slots, self.T), captioner.tokenizer.pad_id,
                              np.int32)
        self.pos = np.zeros((num_slots,), np.int32)
        self.active = np.zeros((num_slots,), bool)
        self.slot_request: List[Optional[int]] = [None] * num_slots
        self._queue: List[Tuple[int, np.ndarray]] = []   # (request_id, memory row)
        self._results: Dict[int, List[int]] = {}
        self._next_id = 0
        self.steps_run = 0

    # ------------------------------------------------------------------
    def submit(self, image) -> int:
        """Queue one PIL image; returns a request id."""
        memory = np.asarray(self.cap.memory_from_images([image]))  # (1, 1, D)
        rid = self._next_id
        self._next_id += 1
        self._queue.append((rid, memory))
        return rid

    def submit_memory(self, memory_row: np.ndarray) -> int:
        rid = self._next_id
        self._next_id += 1
        self._queue.append((rid, memory_row.reshape(1, 1, -1)))
        return rid

    def _admit(self) -> None:
        """Fill free slots from the queue (cache reset + cross swap)."""
        free = [i for i in range(self.S) if not self.active[i]]
        while free and self._queue:
            slot = free.pop()
            rid, memory = self._queue.pop(0)
            cross_row = _cross_const_for(
                self.cap.params["decoder"]["layers"]["cross"],
                jnp.asarray(memory, jnp.float32),
            )[:, 0, :]                                   # (L, D)
            self.cross = self.cross.at[:, slot, :].set(cross_row)
            self.k_cache = self.k_cache.at[:, slot].set(0.0)
            self.v_cache = self.v_cache.at[:, slot].set(0.0)
            self.tokens[slot] = self.cap.tokenizer.pad_id
            self.tokens[slot, 0] = self.cap.tokenizer.start_id
            self.pos[slot] = 0
            self.active[slot] = True
            self.slot_request[slot] = rid

    def _finish(self, slot: int) -> None:
        rid = self.slot_request[slot]
        length = int(self.pos[slot]) + 1
        self._results[rid] = self.tokens[slot, :length].tolist()
        self.active[slot] = False
        self.slot_request[slot] = None

    def step(self) -> None:
        """One decode step for all active slots + admissions/evictions."""
        self._admit()
        if not self.active.any():
            return
        cur = self.tokens[np.arange(self.S), self.pos]
        logits, self.k_cache, self.v_cache = service_decode_step(
            self._prepared, self.cfg,
            jnp.asarray(cur), jnp.asarray(self.pos), jnp.asarray(self.active),
            jnp.asarray(self.tokens == self.cap.tokenizer.pad_id),
            self.k_cache, self.v_cache, self.cross, self.cd,
        )
        nxt = np.asarray(jnp.argmax(logits, axis=-1), np.int32)
        self.steps_run += 1
        end_id = self.cap.tokenizer.end_id
        # vectorized host bookkeeping for active slots
        act = self.active
        p = self.pos + 1
        self.tokens[np.where(act)[0], p[act]] = nxt[act]
        self.pos[act] = p[act]
        done = act & ((nxt == end_id) | (p >= self.T - 1))
        for slot in np.where(done)[0]:
            self._finish(int(slot))

    # ------------------------------------------------------------------
    def run_to_completion(self, max_steps: int = 100000) -> Dict[int, List[int]]:
        steps = 0
        while (self._queue or self.active.any()) and steps < max_steps:
            self.step()
            steps += 1
        return dict(self._results)

    def caption_stream(self, images: Sequence) -> List[str]:
        """Convenience: continuous-batch a stream of images → captions in
        submission order."""
        ids = [self.submit(im) for im in images]
        results = self.run_to_completion()
        return [self.cap.postprocess(results[r]) for r in ids]

    def result(self, request_id: int) -> Optional[List[int]]:
        return self._results.get(request_id)
