"""BLEU-4 correctness tests against hand-computed values."""

import math

import pytest

from mit_tpu.eval.bleu import bleu4, corpus_bleu


def test_perfect_match_is_one():
    assert bleu4(["a cat sat on the mat"], [["a cat sat on the mat"]]) == pytest.approx(1.0)


def test_disjoint_is_zero():
    assert bleu4(["x y z w v"], [["a b c d e"]]) == 0.0


def test_case_insensitive():
    assert bleu4(["A Cat Sat On Mats"], [["a cat sat on mats"]]) == pytest.approx(1.0)


def test_hand_computed_example():
    # hyp: "the cat the cat on the mat" (7 tokens)
    # ref: "the cat is on the mat" (6 tokens)
    hyp = "the cat the cat on the mat".split()
    ref = "the cat is on the mat".split()
    # 1-gram clipped: the->min(3,2)=2 cat->min(2,1)=1 on->1 mat->1 => 5/7
    # 2-gram: "the cat"x2 -> clip 1; "cat on"0... hyp bigrams: (the,cat)x2,
    # (cat,the),(cat,on),(on,the),(the,mat) => matches: (the,cat)=1,
    # (on,the)=1,(the,mat)=1 => 3/6
    # 3-gram: hyp: (the,cat,the),(cat,the,cat),(the,cat,on),(cat,on,the),
    # (on,the,mat) => matches: (on,the,mat)=1 => 1/5
    # 4-gram: hyp 4: none match => 0 → BLEU=0 with strict zero handling
    assert corpus_bleu([hyp], [[ref]]) == 0.0
    # restrict to 3-grams to check precision math:
    b3 = corpus_bleu([hyp], [[ref]], max_n=3)
    expected = math.exp(
        (math.log(5 / 7) + math.log(3 / 6) + math.log(1 / 5)) / 3
    )  # bp = 1 since hyp longer
    assert b3 == pytest.approx(expected)


def test_brevity_penalty():
    hyp = "the cat".split()
    ref = "the cat sat on the mat".split()
    b1 = corpus_bleu([hyp], [[ref]], max_n=1)
    assert b1 == pytest.approx(1.0 * math.exp(1 - 6 / 2))


def test_multiple_references_clip():
    # clipping takes the max count over references
    hyp = ["the the the"]
    refs = [["the cat", "the the dog"]]
    b1 = corpus_bleu([h.split() for h in hyp],
                     [[r.split() for r in rs] for rs in refs], max_n=1)
    assert b1 == pytest.approx(2 / 3)


def test_closest_ref_length_used():
    # two refs of len 2 and 10; hyp len 3 → closest ref len 2 → no penalty
    hyp = [["a", "b", "c"]]
    refs = [[["a", "b"], ["a"] * 10]]
    b = corpus_bleu(hyp, refs, max_n=1)
    assert b == pytest.approx(2 / 3)  # bp=1 (hyp_len 3 > ref_len 2)


def test_corpus_pooling():
    """Corpus BLEU pools counts, not sentence averages."""
    hyps = [["a", "b"], ["c", "d"]]
    refs = [[["a", "b"]], [["x", "y"]]]
    # pooled 1-gram: 2/4; 2-gram: 1/2 (("a","b") matches, ("c","d") not)
    b = corpus_bleu(hyps, refs, max_n=2)
    assert b == pytest.approx(math.exp((math.log(0.5) + math.log(0.5)) / 2))
