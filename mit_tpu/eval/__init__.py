"""Evaluation: BLEU-4 caption quality (the metric the reference names as
future work — presentation_notes.txt:130-134 — and BASELINE.md requires)."""
