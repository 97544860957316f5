"""Relevance scoring operators.

Reference strategies (/root/reference/src/delm/strategies/scoring_strategies.py):
  * KeywordScorer (:59-88): 1.0 if ANY lowercase keyword is a substring
    of the lowercase chunk, else 0.0 — fully native here (exists+contains,
    whole-stage codegen; no UDF).
  * FuzzyScorer (:91-124): max over keywords of
    rapidfuzz.fuzz.partial_ratio(lower(text), kw)/100 — rapidfuzz is not
    available in this environment (the reference itself raises ImportError
    without it, scoring_strategies.py:96-98), so the pandas UDF below
    implements the CLASSIC partial_ratio algorithm (the fuzzywuzzy
    matching-block alignment rapidfuzz reimplements) on stdlib difflib:
    same 0-1 range, same keyword-max shape, optimal-window alignment by
    construction. Residual divergence vs rapidfuzz is limited to its
    Indel-distance scoring of a window vs difflib's ratio, not to window
    selection.
"""

from __future__ import annotations

from difflib import SequenceMatcher
from typing import Sequence

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType


def keyword_score_expr(col: Column, keywords: Sequence[str]) -> Column:
    """Native KeywordScorer.score (scoring_strategies.py:70-75)."""
    if not keywords:
        raise ValueError("KeywordScorer requires a non-empty keyword list")
    kw_arr = F.array(*[F.lit(k.lower()) for k in keywords])
    lowered = F.lower(col)
    return F.exists(kw_arr, lambda kw: lowered.contains(kw)).cast("double")


def _partial_ratio(text: str, keyword: str) -> float:
    """Classic partial_ratio (the fuzzywuzzy algorithm rapidfuzz
    reimplements): align the shorter string against the longer via
    SequenceMatcher matching blocks — each block proposes the window of
    the longer string that lines the block up — and return the best
    window ratio. Block-derived alignment finds the optimal window by
    construction (no stride sampling that could skip the best offset)."""
    if not keyword or not text:
        return 0.0
    short, long_ = (keyword, text) if len(keyword) <= len(text) else (text, keyword)
    m = len(short)
    aligner = SequenceMatcher(a=short, b=long_, autojunk=False)
    best = 0.0
    scorer = SequenceMatcher(a=short, autojunk=False)
    tried: set[int] = set()
    for a, b, _size in aligner.get_matching_blocks():
        start = max(0, b - a)
        if start in tried:
            continue
        tried.add(start)
        # slice truncates at the end like the classic implementation
        scorer.set_seq2(long_[start : start + m])
        r = scorer.ratio()
        if r > best:
            best = r
            if best >= 0.995:
                return best
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
