"""mit_tpu — TPU-native multimodal image→text transformer framework.

A ground-up JAX/XLA/Pallas re-design of the capabilities of
``wazzuck/multimodal-image-transformer`` (frozen vision encoder + trainable
transformer decoder image captioning), built TPU-first:

- functional param-pytree models compiled once under ``jax.jit`` with static
  shapes (ref: model.py / decoder.py are torch nn.Modules),
- Pallas kernels for the hot attention paths (ref relies on ATen/CUDA),
- ``jax.sharding.Mesh`` + collective-aware shardings for multi-chip scale
  (ref is strictly single-process, single-device — reference config.py:10),
- KV-cached, batched autoregressive decoding (ref model.py:219-242 re-runs
  the full decoder over the growing prefix each step).

Package layout:
    config      typed config preserving every reference config.py knob name
    text        byte-level BPE tokenizer (HF-format vocab.json/merges.txt,
                bit-identical encode), C++ fast path
    ops         masks, positional encodings, attention (XLA + Pallas)
    models      decoder, vision towers (ViT/CLIP/BLIP-vision), assembly
    data        Flickr30k prepare flow, dataset flattening, batch pipeline
    train       jitted train step, loop, checkpointing, resume
    decode      KV-cached greedy, beam search, batched captioning service
    parallel    device mesh + sharding rules
    utils       safetensors IO, profiling helpers
"""

__version__ = "0.1.0"
