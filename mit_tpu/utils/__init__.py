"""Utilities: safetensors IO, profiling."""
