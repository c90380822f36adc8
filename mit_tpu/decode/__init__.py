"""Autoregressive decoding: KV-cached greedy, beam search, captioning API."""
