"""High-level captioning API.

Mirrors the reference's two inference surfaces:
- ``ImageToTextModel.generate`` (reference model.py:171-255): PIL image in,
  token-ID list out, ``method`` ∈ {'greedy', 'beam'} — except beam search is
  real here (the reference's is a placeholder that falls back to greedy);
- ``inference.generate_caption`` post-processing (reference
  inference.py:96-126): cut at first END, strip leading START, decode with
  specials kept, strip UNK, collapse whitespace.

TPU-native: images are encoded and captions decoded in batches through
jit-compiled KV-cached loops; per-image calls are the batch=1 special case.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Union

import numpy as np
import jax
import jax.numpy as jnp

from mit_tpu.config import Config
from mit_tpu.data.preprocess import HostPreprocessor
from mit_tpu.decode.beam import beam_generate
from mit_tpu.decode.greedy import greedy_generate
from mit_tpu.models.model import ModelConfig, encode_images, project_features
from mit_tpu.text.tokenizer import Tokenizer


class Captioner:
    """Stateful wrapper owning params + tokenizer + jitted decode paths."""

    def __init__(
        self,
        params: dict,
        mcfg: ModelConfig,
        tokenizer: Tokenizer,
        cfg: Optional[Config] = None,
        compute_dtype=jnp.float32,
        encoder_quant: str = "none",
    ):
        if encoder_quant not in ("none", "int8", "int8_defect"):
            raise ValueError(
                "encoder_quant must be 'none', 'int8' or 'int8_defect', "
                f"got {encoder_quant!r}"
            )
        if encoder_quant.startswith("int8") and "patch" not in params["encoder"]:
            # W8A8 PTQ of the frozen encoder: 2x MXU peak on v5e, ~1% feature
            # error; decoder numerics are untouched.
            from mit_tpu.models.vision import quantize_vision_params

            params = dict(params)
            params["encoder"] = quantize_vision_params(
                params["encoder"], mcfg.vision
            )
            if encoder_quant == "int8_defect":
                # NEGATIVE CONTROL (quality-gate canary): a deliberate 2x
                # error on every layer's fc2 weight scale — the class of
                # bug the compositional gate exists to catch. Any path
                # serving this MUST fail the gate; never ship it.
                enc = dict(params["encoder"])
                lay = dict(enc["layers"])
                lay["fc2"] = lay["fc2"]._replace(
                    scale=lay["fc2"].scale * 2.0
                )
                enc["layers"] = lay
                params["encoder"] = enc
        self.params = params
        self.mcfg = mcfg
        self.tokenizer = tokenizer
        self.cfg = cfg or Config()
        self.compute_dtype = compute_dtype
        self.preprocessor = HostPreprocessor(
            mcfg.encoder_name, image_size=mcfg.vision.image_size
        )
        # params must be jit *arguments*, not closure constants — closing
        # over the param pytree bakes ~100M weights into the compiled
        # program as literals and stalls compilation for minutes on TPU.
        self._encode_fn = jax.jit(
            lambda p, px: project_features(
                p, mcfg, encode_images(p, mcfg, px, compute_dtype), compute_dtype
            )
        )
        self._encode = lambda px: self._encode_fn(self.params, px)

    # ------------------------------------------------------------------
    def memory_from_images(self, images: Sequence) -> jnp.ndarray:
        """PIL images → decoder memory (B, S, D)."""
        pixels = np.stack([self.preprocessor(im) for im in images])
        return self._encode(jnp.asarray(pixels))

    def memory_from_pixels(self, pixels: jnp.ndarray) -> jnp.ndarray:
        """Preprocessed NCHW pixel batch → decoder memory."""
        return self._encode(pixels)

    # ------------------------------------------------------------------
    def generate(
        self,
        image,
        start_token_id: Optional[int] = None,
        end_token_id: Optional[int] = None,
        max_len: int = 100,
        method: str = "greedy",
        beam_size: int = 3,
        **sample_kwargs,
    ) -> List[int]:
        """Single-image token generation (reference model.py:171 surface).

        Returns the ID list including START and (if produced) END, exactly
        like the reference's greedy loop output. ``method='sample'`` accepts
        temperature / top_k / top_p / rng keyword arguments.
        """
        ids = self.generate_batch(
            [image], start_token_id, end_token_id, max_len, method, beam_size,
            **sample_kwargs,
        )[0]
        return ids

    def generate_batch(
        self,
        images: Sequence,
        start_token_id: Optional[int] = None,
        end_token_id: Optional[int] = None,
        max_len: int = 100,
        method: str = "greedy",
        beam_size: int = 3,
        **sample_kwargs,
    ) -> List[List[int]]:
        memory = self.memory_from_images(images)
        return self.generate_from_memory(
            memory, start_token_id, end_token_id, max_len, method, beam_size,
            **sample_kwargs,
        )

    def generate_from_memory(
        self,
        memory: jnp.ndarray,
        start_token_id: Optional[int] = None,
        end_token_id: Optional[int] = None,
        max_len: int = 100,
        method: str = "greedy",
        beam_size: int = 3,
        temperature: float = 1.0,
        top_k: int = 0,
        top_p: float = 1.0,
        rng: Optional[jax.Array] = None,
    ) -> List[List[int]]:
        tok = self.tokenizer
        start_id = tok.start_id if start_token_id is None else start_token_id
        end_id = tok.end_id if end_token_id is None else end_token_id
        # the decoder's positional table caps generation length (the
        # reference's generate(max_len=100) default assumes MAX_SEQ_LEN=100)
        max_len = min(max_len, self.mcfg.decoder.max_seq_len)
        dec = self.params["decoder"]
        if method == "greedy":
            tokens, lengths = greedy_generate(
                dec, self.mcfg.decoder, memory, start_id, end_id, tok.pad_id,
                max_len, compute_dtype=self.compute_dtype,
            )
        elif method == "beam":
            tokens, _ = beam_generate(
                dec, self.mcfg.decoder, memory, start_id, end_id, tok.pad_id,
                max_len, beam_size, compute_dtype=self.compute_dtype,
            )
            lengths = jnp.sum(tokens != tok.pad_id, axis=1)
        elif method == "sample":
            from mit_tpu.decode.sampling import sample_generate

            tokens, lengths = sample_generate(
                dec, self.mcfg.decoder, memory,
                rng if rng is not None else jax.random.PRNGKey(0),
                start_id, end_id, tok.pad_id, max_len,
                temperature=temperature, top_k=top_k, top_p=top_p,
                compute_dtype=self.compute_dtype,
            )
        else:
            raise ValueError(
                f"Unsupported generation method: {method}. "
                "Choose 'greedy', 'beam' or 'sample'."
            )
        tokens = np.asarray(tokens)
        lengths = np.asarray(lengths)
        return [tokens[i, : lengths[i]].tolist() for i in range(tokens.shape[0])]

    # ------------------------------------------------------------------
    def postprocess(self, generated_ids: List[int]) -> str:
        """Reference inference.py:96-126 post-processing, verbatim semantics."""
        tok = self.tokenizer
        try:
            first_end = generated_ids.index(tok.end_id)
            ids = generated_ids[:first_end]
        except ValueError:
            ids = list(generated_ids)
        if ids and ids[0] == tok.start_id:
            ids = ids[1:]
        text = tok.decode(ids, skip_special_tokens=False)
        text = text.replace(self.cfg.UNK_TOKEN, "").strip()
        return " ".join(text.split())

    def caption(self, image, method: str = "greedy", max_len: Optional[int] = None,
                beam_size: Optional[int] = None) -> str:
        return self.caption_batch([image], method, max_len, beam_size)[0]

    def caption_batch(
        self,
        images: Sequence,
        method: str = "greedy",
        max_len: Optional[int] = None,
        beam_size: Optional[int] = None,
    ) -> List[str]:
        ids = self.generate_batch(
            images,
            max_len=max_len or self.cfg.MAX_SEQ_LEN,
            method=method,
            beam_size=beam_size or self.cfg.BEAM_SIZE,
        )
        return [self.postprocess(s) for s in ids]


def load_captioner(
    checkpoint_path: str, cfg: Config, compute_dtype=jnp.float32,
    encoder_quant: str = "none",
) -> Captioner:
    """Build a Captioner from a reference-layout safetensors checkpoint
    (the reference inference.py:40-68 flow: tokenizer → model from config
    hparams + actual vocab size → load weights).

    ``encoder_quant='int8'`` quantizes the frozen encoder once at load
    (W8A8 GEMMs on the MXU — serving fast path)."""
    from mit_tpu.text.tokenizer import get_tokenizer
    from mit_tpu.train.checkpoint import load_safetensors

    tokenizer = get_tokenizer(cfg, force_reload=True)
    cfg = cfg.with_tokenizer_ids(tokenizer)
    mcfg = ModelConfig.build(cfg, vocab_size=tokenizer.get_vocab_size())
    params = load_safetensors(checkpoint_path, mcfg)
    return Captioner(params, mcfg, tokenizer, cfg, compute_dtype,
                     encoder_quant=encoder_quant)


def pretrained_captioner(
    cfg: Config,
    name_or_path: Optional[str] = None,
    decoder_checkpoint: Optional[str] = None,
    compute_dtype=jnp.float32,
    local_files_only: bool = False,
    encoder_quant: str = "none",
) -> Captioner:
    """Captioner booted from REAL pretrained encoder weights.

    Resolves ``name_or_path`` (default: ``cfg.ENCODER_MODEL_NAME``) through
    :mod:`mit_tpu.models.pretrained` — the reference's
    ``AutoModel.from_pretrained`` capability (reference model.py:50). When
    ``decoder_checkpoint`` (a reference-layout safetensors file) is given,
    its trained decoder + projection weights overwrite the random init.
    """
    from mit_tpu.models.model import init_model_params_pretrained
    from mit_tpu.text.tokenizer import get_tokenizer
    from mit_tpu.train.checkpoint import load_safetensors

    tokenizer = get_tokenizer(cfg, force_reload=True)
    cfg = cfg.with_tokenizer_ids(tokenizer)
    mcfg, params = init_model_params_pretrained(
        jax.random.PRNGKey(cfg.RANDOM_SEED), cfg,
        vocab_size=tokenizer.get_vocab_size(),
        name_or_path=name_or_path, local_files_only=local_files_only,
    )
    if decoder_checkpoint is not None:
        trained = load_safetensors(decoder_checkpoint, mcfg)
        for k in ("decoder", "projection"):
            if k in trained and k in params:
                params[k] = trained[k]
    return Captioner(params, mcfg, tokenizer, cfg, compute_dtype,
                     encoder_quant=encoder_quant)
