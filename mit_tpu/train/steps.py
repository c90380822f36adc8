"""Jitted training/eval steps.

The reference's per-batch hot loop (reference train.py:75-120: transfer →
forward → CE → backward → clip → AdamW step → scheduler) compiles here into
ONE XLA program per step shape: forward+backward+clip+update fused, no
Python between kernels, bf16 matmuls on the MXU with fp32 params/optimizer
state.

Two step flavors:
- ``from pixels``: frozen encoder runs in-graph (reference behavior,
  model.py:133-136);
- ``from features``: consumes cached encoder output — the frozen encoder is
  pure per-image constant work the reference redoes every epoch; caching
  removes it from the step entirely (BASELINE.json config 3).
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from mit_tpu.config import Config
from mit_tpu.models.model import (
    ModelConfig,
    forward_from_features,
    merge_params,
    model_forward,
)


def masked_cross_entropy(
    logits: jnp.ndarray,       # (B, T, V) fp32
    targets: jnp.ndarray,      # (B, T) int
    pad_id: int,
) -> jnp.ndarray:
    """Mean CE over non-PAD target tokens.

    Matches ``nn.CrossEntropyLoss(ignore_index=PAD)`` on flattened logits
    (reference train.py:90, :327): sum over non-ignored positions divided by
    their count. Batch-padding rows (all-PAD) contribute nothing.
    """
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
    mask = (targets != pad_id).astype(jnp.float32)
    total = jnp.sum(nll * mask)
    count = jnp.maximum(jnp.sum(mask), 1.0)
    return total / count


def make_optimizer(cfg: Config, steps_per_epoch: Optional[int] = None):
    """AdamW + global-norm clip + (optional) linear warmup/decay schedule.

    Matches reference train.py:319-341: torch AdamW(lr, betas, eps, wd) with
    ``clip_grad_norm_`` applied to gradients before the update, and
    ``get_linear_schedule_with_warmup`` when WARMUP_STEPS > 0 (linear 0→lr
    over warmup steps, then linear decay to 0 at total steps).
    """
    if cfg.WARMUP_STEPS > 0 and steps_per_epoch:
        total = steps_per_epoch * cfg.NUM_EPOCHS
        schedule = optax.join_schedules(
            [
                optax.linear_schedule(0.0, cfg.LEARNING_RATE, cfg.WARMUP_STEPS),
                optax.linear_schedule(
                    cfg.LEARNING_RATE, 0.0, max(1, total - cfg.WARMUP_STEPS)
                ),
            ],
            [cfg.WARMUP_STEPS],
        )
    else:
        schedule = cfg.LEARNING_RATE

    chain = []
    if cfg.GRAD_CLIP_VALUE and cfg.GRAD_CLIP_VALUE > 0:
        chain.append(optax.clip_by_global_norm(cfg.GRAD_CLIP_VALUE))
    chain.append(
        optax.adamw(
            learning_rate=schedule,
            b1=cfg.ADAM_BETA1,
            b2=cfg.ADAM_BETA2,
            eps=cfg.ADAM_EPS,
            weight_decay=cfg.WEIGHT_DECAY,
        )
    )
    return optax.chain(*chain), schedule


class TrainState(NamedTuple):
    step: jnp.ndarray          # scalar int32
    params: dict               # trainable subtree (projection + decoder)
    opt_state: optax.OptState


def init_train_state(trainable_params: dict, optimizer) -> TrainState:
    state = TrainState(
        step=jnp.zeros((), jnp.int32),
        params=trainable_params,
        opt_state=optimizer.init(trainable_params),
    )
    # De-alias leaves: JAX caches small constants, so e.g. `step` and optax's
    # `count` can share one buffer — which breaks buffer donation in the
    # jitted step ("attempt to donate the same buffer twice").
    return jax.tree.map(lambda x: jnp.array(x, copy=True), state)


def _zero_pad_row_grad(grads: dict, pad_idx: int) -> dict:
    """Freeze the PAD embedding row, reproducing torch ``padding_idx``
    semantics (reference decoder.py:105: the pad row never receives
    gradient updates)."""
    emb = grads["decoder"]["token_embedding"]
    emb = emb.at[pad_idx].set(0.0)
    grads = dict(grads)
    grads["decoder"] = {**grads["decoder"], "token_embedding": emb}
    return grads


def make_train_step(
    mcfg: ModelConfig,
    optimizer,
    pad_id: int,
    compute_dtype=jnp.bfloat16,
    from_features: bool = False,
    donate: bool = True,
    remat: bool = False,
):
    """Build the jitted train step.

    Signature of the returned function:
      (state, frozen, batch, rng) -> (state', loss)
    where batch contains ``images`` (or ``features``), ``decoder_input_tokens``
    and ``target_tokens``; ``frozen`` is the encoder subtree ({} when
    training from features).
    """

    def loss_fn(trainable, frozen, batch, rng):
        params = merge_params(trainable, frozen)
        if from_features:
            logits = forward_from_features(
                params, mcfg, batch["features"], batch["decoder_input_tokens"],
                deterministic=False, rng=rng, compute_dtype=compute_dtype,
                remat=remat,
            )
        else:
            logits = model_forward(
                params, mcfg, batch["images"], batch["decoder_input_tokens"],
                deterministic=False, rng=rng, compute_dtype=compute_dtype,
                remat=remat,
            )
        return masked_cross_entropy(logits, batch["target_tokens"], pad_id)

    def step(state: TrainState, frozen: dict, batch: dict, rng) -> Tuple[TrainState, jnp.ndarray]:
        rng = jax.random.fold_in(rng, state.step)
        loss, grads = jax.value_and_grad(loss_fn)(state.params, frozen, batch, rng)
        grads = _zero_pad_row_grad(grads, mcfg.decoder.pad_idx)
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(state.step + 1, params, opt_state), loss

    donate_args = (0,) if donate else ()
    return jax.jit(step, donate_argnums=donate_args)


def make_eval_step(
    mcfg: ModelConfig,
    pad_id: int,
    compute_dtype=jnp.bfloat16,
    from_features: bool = False,
):
    """Jitted eval step → (sum_nll, token_count) for exact epoch-mean loss
    (reference train.py:125-151 averages batch means; we aggregate token-
    weighted sums so partial final batches don't skew the mean)."""

    def step(params: dict, batch: dict):
        if from_features:
            logits = forward_from_features(
                params, mcfg, batch["features"], batch["decoder_input_tokens"],
                compute_dtype=compute_dtype,
            )
        else:
            logits = model_forward(
                params, mcfg, batch["images"], batch["decoder_input_tokens"],
                compute_dtype=compute_dtype,
            )
        logp = jax.nn.log_softmax(logits, axis=-1)
        nll = -jnp.take_along_axis(
            logp, batch["target_tokens"][..., None], axis=-1
        )[..., 0]
        mask = (batch["target_tokens"] != pad_id).astype(jnp.float32)
        return jnp.sum(nll * mask), jnp.sum(mask)

    return jax.jit(step)
