"""KG consistency checks — the publish gate of a graph-materialization
pipeline.

Not a reference operator (DELM stops at extraction); required in practice
before a triple table is served: a KG built from 10^12 turns WILL contain
contradictions, and downstream consumers (link prediction, retrieval)
want them quantified per build. Every check is a single aggregation or
one self-equi-join — map-side combinable, no driver-side iteration, and
the whole report is one DataFrame so a scheduler can alert on it.

Checks over a linked triple table (subj_id, pred, obj_id):

* ``self_loop``          — subj_id == obj_id (extraction echo artifacts)
* ``duplicate_triple``   — extra copies of an identical (s, p, o) beyond
                           the first (idempotency regressions upstream)
* ``unresolved_subj`` /
  ``unresolved_obj``     — endpoints still carrying the ``mention:``
                           prefix (linking residue that needs dictionary
                           growth or a lower embedding threshold)
* ``functional_violation``— for predicates declared functional (an entity
                           works_at ONE org), subjects asserting >1
                           distinct object; counted as the number of
                           excess objects, i.e. distinct_obj - 1 summed
                           over violating subjects (floored at 0 per
                           group: an all-null-object group is a
                           null_endpoint problem, not negative credit
                           against real violations)
* ``null_endpoint``       — triples with a NULL subject or object
                           (malformed rows no other check would surface)

At 100 TB: self_loop/unresolved are map-only filters folded into one
scan-level aggregate; duplicate_triple and functional_violation are each
one hash aggregation on (s,p,o) / (p,s) — partial-aggregated map-side,
skew-tolerant because hot predicates spread over their subjects.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: fixture-schema predicates where a subject may assert only one object
DEFAULT_FUNCTIONAL_PREDS = ["works_at", "reports_to", "located_in"]

MENTION_PREFIX = "mention:"


def consistency_report(
    triples: DataFrame,
    subj_col: str = "subj_id",
    pred_col: str = "pred",
    obj_col: str = "obj_id",
    functional_preds: list[str] | None = None,
) -> DataFrame:
    """One (check_name, n_violations) row per check, always all checks (a
    clean build reports explicit zeros — absence of a row is not
    evidence of absence of a check)."""
    if functional_preds is None:
        functional_preds = DEFAULT_FUNCTIONAL_PREDS
    s, p, o = F.col(subj_col), F.col(pred_col), F.col(obj_col)

    # one scan: the three row-local checks as conditional counts
    row_local = triples.select(
        F.sum((s == o).cast("long")).alias("self_loop"),
        F.sum((s.isNull() | o.isNull()).cast("long")).alias("null_endpoint"),
        F.sum(F.startswith(s, F.lit(MENTION_PREFIX)).cast("long")).alias(
            "unresolved_subj"
        ),
        F.sum(F.startswith(o, F.lit(MENTION_PREFIX)).cast("long")).alias(
            "unresolved_obj"
        ),
    )

    dup = (
        triples.groupBy(s.alias("s"), p.alias("p"), o.alias("o"))
        .agg((F.count(F.lit(1)) - 1).alias("extra"))
        .agg(F.sum("extra").alias("duplicate_triple"))
    )

    func = (
        triples.filter(p.isin(functional_preds))
        .groupBy(p.alias("p"), s.alias("s"))
        .agg(
            F.greatest(F.count_distinct(o) - 1, F.lit(0)).alias("excess")
        )
        .agg(F.sum("excess").alias("functional_violation"))
    )

    wide = row_local.crossJoin(dup).crossJoin(func)  # three 1-row frames
    checks = [
        "self_loop",
        "duplicate_triple",
        "unresolved_subj",
        "unresolved_obj",
        "functional_violation",
        "null_endpoint",
    ]
    stacked = wide.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("check_name"),
                        F.coalesce(F.col(c), F.lit(0)).cast("long").alias(
                            "n_violations"
                        ),
                    )
                    for c in checks
                ]
            )
        ).alias("r")
    )
    return stacked.select("r.check_name", "r.n_violations")


def functional_violations(
    triples: DataFrame,
    subj_col: str = "subj_id",
    pred_col: str = "pred",
    obj_col: str = "obj_id",
    functional_preds: list[str] | None = None,
) -> DataFrame:
    """The violating (pred, subj) groups themselves, with their distinct
    object count — the drill-down a data steward triages from."""
    if functional_preds is None:
        functional_preds = DEFAULT_FUNCTIONAL_PREDS
    return (
        triples.filter(F.col(pred_col).isin(functional_preds))
        .groupBy(
            F.col(pred_col).alias("pred"), F.col(subj_col).alias("subj_id")
        )
        .agg(F.count_distinct(F.col(obj_col)).alias("n_objects"))
        .filter(F.col("n_objects") > 1)
    )
