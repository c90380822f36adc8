"""Compute primitives: masks, positional encodings, attention (XLA + Pallas)."""
