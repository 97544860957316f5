"""Relevance scoring operators.

Reference strategies (/root/reference/src/delm/strategies/scoring_strategies.py):
  * KeywordScorer (:59-88): 1.0 if ANY lowercase keyword is a substring
    of the lowercase chunk, else 0.0 — fully native here (exists+contains,
    whole-stage codegen; no UDF).
  * FuzzyScorer (:91-124): max over keywords of
    rapidfuzz.fuzz.partial_ratio(lower(text), kw)/100 — the rapidfuzz
    LIBRARY is not available in this environment (the reference itself
    raises ImportError without it, scoring_strategies.py:96-98), but its
    partial_ratio ALGORITHM is public and small, so _partial_ratio below
    reimplements it exactly from first principles: normalized Indel
    similarity (2·LCS/(|a|+|b|), LCS via the Allison–Dix bit-parallel
    recurrence) maximized over the algorithm's window set — every
    length-|short| window of the longer string plus every shorter
    prefix/suffix window touching its edges. Same 0-1 range, same
    keyword-max shape, same scores rapidfuzz would produce.
"""

from __future__ import annotations

from typing import Sequence

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType


def keyword_score_expr(col: Column, keywords: Sequence[str]) -> Column:
    """Native KeywordScorer.score (scoring_strategies.py:70-75).

    Flat OR-chain of `contains` over the lowered text (r6): the previous
    `exists(array<kw>, ...)` higher-order function evaluates its lambda
    INTERPRETED — measured ~2x the chunk-stage cost at 5.6M turns — while
    the OR-chain compiles into whole-stage codegen with the shared
    `lower(col)` subexpression hoisted. Null text stays null (OR of
    nulls), exactly like `exists` over an all-null lambda result."""
    if not keywords:
        raise ValueError("KeywordScorer requires a non-empty keyword list")
    lowered = F.lower(col)
    hit = lowered.contains(F.lit(keywords[0].lower()))
    for k in keywords[1:]:
        hit = hit | lowered.contains(F.lit(k.lower()))
    return hit.cast("double")


def _lcs_len(pm: dict, len1: int, window: str) -> int:
    """Length of the longest common subsequence between the pattern whose
    per-character position bitmasks are `pm` (len1 bits) and `window`,
    via the Allison–Dix bit-parallel recurrence. Python ints are
    arbitrary-precision, so there is no 64-bit pattern-length ceiling;
    the mask keeps the carry-discard semantics of the fixed-width form.
    Validated against the O(n·m) DP in tests/test_round5_fixes.py."""
    mask = (1 << len1) - 1
    v = mask
    for c in window:
        m = pm.get(c, 0)
        u = v & m
        v = ((v + u) & mask) | (v - u)
    # zero bits of v within len1 positions == LCS length
    return len1 - bin(v).count("1")


def _partial_ratio(text: str, keyword: str) -> float:
    """Exact rapidfuzz fuzz.partial_ratio semantics (0-1 range), rebuilt
    from the published algorithm: let `short` be the shorter of the two
    strings; score every candidate window of the longer string with the
    normalized Indel similarity 2·LCS(short, w)/(len(short)+len(w)) and
    return the max. The candidate windows are exactly rapidfuzz's — all
    length-len(short) windows, plus the shorter prefixes and suffixes of
    the longer string (windows hanging off its edges).

    Windows whose boundary character does not occur in `short` are
    skipped, which is lossless: dropping a character that cannot match
    leaves the LCS unchanged while another candidate window contains the
    same remaining characters with an equal-or-smaller denominator, so
    the skipped window can never be the unique maximum."""
    if not keyword or not text:
        return 0.0
    short, long_ = (keyword, text) if len(keyword) <= len(text) else (text, keyword)
    len1, len2 = len(short), len(long_)
    pm: dict = {}
    for j, c in enumerate(short):
        pm[c] = pm.get(c, 0) | (1 << j)
    charset = pm.keys()

    best = 0.0
    # prefix windows long_[:i], i < len1
    for i in range(1, len1):
        if long_[i - 1] not in charset:
            continue
        sim = 2.0 * _lcs_len(pm, len1, long_[:i]) / (len1 + i)
        if sim > best:
            best = sim
    # full-length windows long_[i:i+len1]
    for i in range(0, len2 - len1 + 1):
        if long_[i + len1 - 1] not in charset:
            continue
        sim = _lcs_len(pm, len1, long_[i : i + len1]) / len1
        if sim > best:
            best = sim
            if best >= 1.0:
                return best
    # suffix windows long_[i:], shorter than len1
    for i in range(len2 - len1 + 1, len2):
        if long_[i] not in charset:
            continue
        sim = 2.0 * _lcs_len(pm, len1, long_[i:]) / (len1 + len2 - i)
        if sim > best:
            best = sim
    return best


def fuzzy_score_text(text, keywords: Sequence[str]) -> float:
    """Pure per-row FuzzyScorer kernel (scoring_strategies.py:106-111): max
    over keywords of the partial ratio against the lowered text. Shared by
    the pandas UDF and the committed oracle fixture
    (tests/fixtures/make_fixtures.py) so both are bit-identical."""
    if text is None:
        return 0.0
    lowered = text.lower()
    return max(_partial_ratio(lowered, kw.lower()) for kw in keywords)


def fuzzy_score_udf(keywords: Sequence[str]):
    """Arrow-batched pandas UDF: Series[str] -> Series[double], the
    vectorized analog of FuzzyScorer.score (scoring_strategies.py:106-111)."""
    if not keywords:
        raise ValueError("FuzzyScorer requires a non-empty keyword list")
    kws = [k.lower() for k in keywords]

    @F.pandas_udf(DoubleType())
    def _score(texts: pd.Series) -> pd.Series:
        return texts.map(lambda t: fuzzy_score_text(t, kws))

    return _score


def score_strategy_expr(strategy: dict, col: Column) -> Column:
    """Config-driven dispatch mirroring SCORER_REGISTRY
    (scoring_strategies.py:128-131)."""
    typ = strategy.get("type", "KeywordScorer")
    if typ == "KeywordScorer":
        return keyword_score_expr(col, strategy["keywords"])
    if typ == "FuzzyScorer":
        return fuzzy_score_udf(strategy["keywords"])(col)
    raise ValueError(f"Unknown scorer type: {typ}")


def validate_score_filter(filter_expr: str) -> str:
    """Validate a score-filter predicate (reference accepts pandas-query
    strings like "delm_score >= 0.7", config.py:315-328; the comparison
    subset coincides with SQL). Whitelisted shape only — never eval'd."""
    import re

    if not re.fullmatch(
        r"\s*delm_score\s*(>=|<=|>|<|==|!=)\s*[0-9]*\.?[0-9]+\s*", filter_expr
    ):
        raise ValueError(
            f"Unsupported score filter {filter_expr!r}; expected "
            "'delm_score <op> <number>'"
        )
    return filter_expr.replace("==", "=")


def parse_score_filter(filter_expr: str) -> tuple[str, float]:
    """(operator, threshold) from a validated score filter — the reference
    applies the predicate verbatim via df.query (data_processor.py), so the
    operator must survive the trip into the pipeline (a '>' filter is NOT
    '>=', and '<' inverts it entirely)."""
    import re

    m = re.fullmatch(
        r"\s*delm_score\s*(>=|<=|>|<|==|!=)\s*([0-9]*\.?[0-9]+)\s*", filter_expr
    )
    if m is None:
        validate_score_filter(filter_expr)  # raises with the standard message
        raise AssertionError("unreachable")
    op = "=" if m.group(1) == "==" else m.group(1)
    return op, float(m.group(2))


#: SQL comparison op -> Column predicate builder (whitelist; never eval'd)
SCORE_OPS = {
    ">=": lambda c, t: c >= t,
    "<=": lambda c, t: c <= t,
    ">": lambda c, t: c > t,
    "<": lambda c, t: c < t,
    "=": lambda c, t: c == t,
    "!=": lambda c, t: c != t,
}
