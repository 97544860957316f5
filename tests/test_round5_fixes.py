"""Round-5 fixes: ADVICE r4 defects + VERDICT r4 performance-shape items
that carry a bit-identity contract."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_surface_embeddings_fast_identical_to_native(spark):
    """The Arrow-batched trigram-embedding twin must reproduce the native
    column expression exactly — including normalization (ASCII-\\s+
    collapse, space-only trim, lowercase), tail-window substr semantics
    on short strings, and UTF-8 md5 bucketing of non-ASCII trigrams."""
    from delm_spark.kg.linking import surface_embedding, surface_embeddings_fast

    surfaces = [
        "alice smith",
        "Alice  Smith",          # case + double space
        " alice\tsmith ",        # trim + tab collapse
        "a",                     # padded length 3 -> one window
        "",                      # padded length 2 -> tail window '^$'
        "ab",                    # padded length 4
        "josé garcía-lópez",     # multi-byte UTF-8 trigrams
        "ACME Corp.",
        "x" * 200,               # long run, repeated trigram
        "w00042 w10993 w05511",  # bench-shaped vocab surface
    ]
    df = spark.createDataFrame([(s,) for s in surfaces], "surface string")
    native = {
        r["surface"]: list(r["e"])
        for r in df.select(
            "surface", surface_embedding(F.col("surface"), 64).alias("e")
        ).collect()
    }
    fast = {
        r["surface"]: list(r["e"])
        for r in surface_embeddings_fast(df, "surface", "e", 64).collect()
    }
    assert fast == native


def test_hashed_linear_score_null_and_empty_text(spark):
    """ADVICE r4: null-text docs must not vanish from hashed_linear_score
    output, and empty-string text must not score a phantom '' token."""
    from delm_spark.operators.curation import (
        hashed_linear_score,
        nb_logodds_weights,
    )

    df = spark.createDataFrame(
        [(1, "good text here", True), (2, None, False), (3, "", False),
         (4, "bad stuff", False)],
        "doc_id long, text string, y boolean",
    )
    w = nb_logodds_weights(df, F.col("y"), dim=64)
    # training never sees a phantom '' feature from the null/empty docs
    feats = {r["feature"] for r in w.collect()}
    assert len(feats) == 5  # good/text/here/bad/stuff only
    out = hashed_linear_score(df, w, dim=64).collect()
    by_id = {r["doc_id"]: r for r in out}
    assert set(by_id) == {1, 2, 3, 4}  # every input doc has exactly one row
    for d in (2, 3):
        assert by_id[d]["n_tokens"] == 0
        assert by_id[d]["sum_weight_micro"] == 0
        assert by_id[d]["avg_weight_micro"] == 0
    assert by_id[1]["n_tokens"] == 3 and by_id[1]["sum_weight_micro"] > 0
    assert by_id[4]["n_tokens"] == 2 and by_id[4]["sum_weight_micro"] < 0


def test_near_dup_canonical_transitive_chain(spark):
    """A~B and B~C verified near-dups with A,C below the Jaccard
    threshold of each other must still share one canonical id (the
    component walk), and every doc gets exactly one row."""
    from delm_spark.operators.dedup import near_dup_canonical

    base = "the quick brown fox jumps over the lazy dog again and again " * 3
    a = base + "alpha beta gamma delta"
    b = base + "alpha beta gamma epsilon"   # near a
    c = base + "alpha zeta gamma epsilon"   # near b, farther from a
    rows = [(1, a), (2, b), (3, c), (4, "completely unrelated text about spark plans")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in near_dup_canonical(
        df, "text", "doc_id", k=16, bands=8, n=3, threshold=0.6
    ).collect()}
    assert set(out) == {1, 2, 3, 4}
    assert out[1]["canonical_id"] == out[2]["canonical_id"] == out[3]["canonical_id"] == 1
    assert out[1]["is_kept"] and not out[2]["is_kept"] and not out[3]["is_kept"]
    assert out[4]["canonical_id"] == 4 and out[4]["is_kept"]


def _lcs_dp(a: str, b: str) -> int:
    """O(n·m) LCS oracle for validating the bit-parallel kernel."""
    n = len(b)
    dp = [0] * (n + 1)
    for ch in a:
        prev = 0
        for j in range(n):
            cur = dp[j + 1]
            dp[j + 1] = prev + 1 if ch == b[j] else max(dp[j + 1], dp[j])
            prev = cur
    return dp[n]


def test_bitparallel_lcs_matches_dp():
    """Allison–Dix bit-parallel LCS == textbook DP, including patterns
    past 64 chars (Python-int bit vectors have no word-size ceiling)."""
    import random

    from delm_spark.operators.scoring import _lcs_len

    rng = random.Random(13)
    alpha = "abcd"
    for _ in range(500):
        a = "".join(rng.choice(alpha) for _ in range(rng.randint(0, 80)))
        b = "".join(rng.choice(alpha) for _ in range(rng.randint(0, 80)))
        pm: dict = {}
        for j, c in enumerate(a):
            pm[c] = pm.get(c, 0) | (1 << j)
        if not a:
            continue
        assert _lcs_len(pm, len(a), b) == _lcs_dp(a, b), (a, b)


def test_partial_ratio_exact_rapidfuzz_semantics():
    """_partial_ratio == the brute-force statement of rapidfuzz's
    partial_ratio (normalized Indel similarity maximized over every
    full-length window plus the edge prefixes/suffixes of the longer
    string), proving the boundary-character skip is lossless and the
    scoring matches the reference's rapidfuzz contract
    (scoring_strategies.py:106-111)."""
    import random

    from delm_spark.operators.scoring import _partial_ratio

    def brute(text: str, kw: str) -> float:
        if not kw or not text:
            return 0.0
        short, long_ = (kw, text) if len(kw) <= len(text) else (text, kw)
        l1, l2 = len(short), len(long_)
        cands = (
            [long_[:i] for i in range(1, l1)]
            + [long_[i : i + l1] for i in range(0, l2 - l1 + 1)]
            + [long_[i:] for i in range(l2 - l1 + 1, l2)]
        )
        return max(2.0 * _lcs_dp(short, w) / (l1 + len(w)) for w in cands)

    rng = random.Random(29)
    alpha = "abcde "
    for _ in range(800):
        t = "".join(rng.choice(alpha) for _ in range(rng.randint(1, 40)))
        k = "".join(rng.choice(alpha) for _ in range(rng.randint(1, 15)))
        assert abs(_partial_ratio(t, k) - brute(t, k)) < 1e-12, (t, k)
    # exact substring ==> perfect score; needle longer than haystack swaps
    assert _partial_ratio("hello spark table world", "spark table") == 1.0
    assert _partial_ratio("spark", "sparkling water") == _partial_ratio(
        "sparkling water", "spark"
    )
    assert _partial_ratio("", "x") == 0.0
