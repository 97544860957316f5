"""Distributed BPE learning (operators/bpe.py) vs a sequential pure-
Python greedy reference: merge tables must match exactly (count-desc /
left / right tie-breaks), segmentation must equal greedy left-to-right
merge application, and the whole path must be partitioning-independent.
Oracle parity at sf0.001 lives in test_oracle_parity.py."""

import collections
import re

import pytest
from pyspark.sql import functions as F

from delm_spark.operators.bpe import bpe_learn, bpe_segment


def _py_bpe(texts, n):
    """Sequential reference: classical greedy BPE over word counts."""
    wc = collections.Counter()
    for t in texts:
        for w in re.sub(r"\s+", " ", t.strip().lower()).split(" "):
            if w:
                wc[w] += 1
    words = {tuple(w): c for w, c in wc.items()}
    merges = []
    for _ in range(n):
        pc = collections.Counter()
        for syms, c in words.items():
            for a, b in zip(syms, syms[1:]):
                pc[(a, b)] += c
        if not pc:
            break
        (a, b), cnt = min(pc.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        merges.append((a, b, cnt))
        new = {}
        for syms, c in words.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new[tuple(out)] = new.get(tuple(out), 0) + c
        words = new
    return merges


def _py_segment(word, merges):
    syms = list(word)
    for a, b in merges:
        out, i = [], 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


TEXTS = [
    "low low low low low",
    "lower lower newest newest",
    "newest newest newest newest widest widest widest",
]


def _docs(spark, texts=TEXTS):
    return spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )


def test_bpe_learn_matches_sequential_reference(spark):
    got = [
        (r["left"], r["right"], r["pair_count"])
        for r in bpe_learn(_docs(spark), n_merges=6).orderBy("rank").collect()
    ]
    assert got == _py_bpe(TEXTS, 6)


def test_bpe_learn_partitioning_independent(spark):
    d = _docs(spark)
    a = bpe_learn(d, 4).orderBy("rank").collect()
    b = bpe_learn(d.repartition(7), 4).orderBy("rank").collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]
    with pytest.raises(ValueError):
        bpe_learn(d, 0)


def test_bpe_learn_overlapping_adjacent_pairs(spark):
    """'a a a a' with merge (a,a): greedy pairs the 1st+2nd and 3rd+4th —
    the double-space replace must do the same, never the chained
    '(aa)a a' mis-merge."""
    d = _docs(spark, ["aaaa aaaa aaa"])
    m = bpe_learn(d, 2).orderBy("rank").collect()
    ref = _py_bpe(["aaaa aaaa aaa"], 2)
    assert [(r["left"], r["right"], r["pair_count"]) for r in m] == ref
    # pair COUNTING counts every adjacent occurrence (3 in 'aaaa', 2 in
    # 'aaa'), weighted by word counts {aaaa: 2, aaa: 1} -> 2*3 + 2 = 8;
    # only the merge APPLICATION is greedy-non-overlapping
    assert ref[0] == ("a", "a", 8)
    # round 2 must see 'aa' tokens from the greedy application:
    # 'aaaa' -> [aa, aa] (pair (aa,aa) x2), 'aaa' -> [aa, a]
    assert ref[1] == ("aa", "aa", 2)


def test_bpe_segment_matches_sequential_application(spark):
    merges_df = bpe_learn(_docs(spark), 5).orderBy("rank").collect()
    merges = [(r["left"], r["right"]) for r in merges_df]
    seg = {
        r["doc_id"]: r["tokens"]
        for r in bpe_segment(_docs(spark), merges).collect()
    }
    for i, t in enumerate(TEXTS):
        expect = []
        for w in t.split(" "):
            expect.extend(_py_segment(w, merges))
        assert seg[i] == expect, (i, seg[i], expect)


def test_bpe_single_char_corpus_exhausts(spark):
    """A corpus of 1-char words has no pairs: the merge table is empty
    and learning stops instead of erroring."""
    d = _docs(spark, ["a b c a b"])
    assert bpe_learn(d, 3).count() == 0
