"""CIDEr-D scorer properties (mit_tpu/eval/cider.py)."""

import math

import pytest

from mit_tpu.eval.cider import cider_d, corpus_cider_d


REFS = [
    ["a dog runs in the park", "the dog is running outside"],
    ["a cat sits on the mat", "the cat rests on a mat"],
    ["two birds fly over the lake", "birds flying above water"],
    ["a man rides a red bicycle", "the man is on a bike"],
]


def test_exact_match_scores_highest():
    hyps = [r[0] for r in REFS]
    s_exact = cider_d(hyps, REFS)
    s_wrong = cider_d(["completely unrelated words here"] * 4, REFS)
    assert s_exact > s_wrong
    assert s_exact > 1.0          # consensus hit, 0-10 scale
    assert s_wrong < 0.5


def test_unrelated_is_near_zero():
    s = cider_d(["zebra quantum xylophone"] * 4, REFS)
    assert s < 0.05


def _score_first(hyp0: str) -> float:
    """Score with hyp0 on image 0 and exact matches elsewhere — isolates
    the effect of image 0's hypothesis inside a real multi-image corpus
    (IDF needs >1 document to be meaningful)."""
    hyps = [hyp0] + [r[0] for r in REFS[1:]]
    return cider_d(hyps, REFS)


def test_repetition_is_clipped():
    """Repeating a high-IDF word must not inflate the score (the -D fix)."""
    honest = _score_first("a dog runs in the park")
    gamed = _score_first("dog dog dog dog dog dog")
    assert gamed < honest


def test_length_penalty_hurts_wrong_length():
    short = _score_first("dog")
    full = _score_first("a dog runs in the park")
    assert short < full


def test_partial_credit_ordering():
    """More overlapping content → higher score."""
    s0 = _score_first("a dog runs in the park")
    s1 = _score_first("a dog runs in the rain")
    s2 = _score_first("a frog hops in the rain")
    assert s0 > s1 > s2


def test_single_image_corpus_degenerates_gracefully():
    """N=1 → IDF is identically 0 (log 1); the score is 0, not a crash —
    callers should evaluate over a real split."""
    one = corpus_cider_d([["a", "dog"]], [[["a", "dog"]]])
    assert one == 0.0 and math.isfinite(one)


def test_empty_hypothesis_is_zero_not_crash():
    hyps = [""] + [r[0] for r in REFS[1:]]
    per_empty = cider_d(hyps, REFS)
    assert math.isfinite(per_empty)


def test_case_insensitive():
    assert _score_first("A Dog RUNS in THE park") == pytest.approx(
        _score_first("a dog runs in the park")
    )
