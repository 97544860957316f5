"""Regenerate the committed oracle fixtures.

The KG-chain CORRECTNESS queries (explode_extracted_triples,
kg_triples_pipeline, kg_nodes_canonical) and their DuckDB oracle SQL must
see the SAME input rows. The synthetic corpus is generated with Spark
xxhash64 expressions (delm_spark/data/synthetic.py) which DuckDB cannot
reproduce, so the corpus is materialized ONCE here and committed as a test
asset (like the reference's tests/assets CSVs); the oracle SQL
read_parquet()s it. `tests/test_operators.py::test_fixture_determinism`
asserts a regeneration matches the committed files.

Run: python tests/fixtures/make_fixtures.py
"""

from __future__ import annotations

import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[2]
sys.path.insert(0, str(REPO))

FIXTURE_DIR = Path(__file__).resolve().parent
N_CONVS = 200
N_HOT = 2


#: inputs of the fuzzy-score oracle fixture — must match fuzzy_score_docs
#: in __spark_entry__.py
FUZZY_KEYWORDS = ["spark table", "vector join"]
FUZZY_DOC_LIMIT = 50
TESTDATA_SFS = ["sf0.001", "sf0.01", "sf0.1"]


def make_fuzzy_fixture() -> "object":
    """Expected FuzzyScorer output as a pure lookup table keyed by md5(text).

    DuckDB cannot run SequenceMatcher, so the oracle for fuzzy_score_docs
    joins the documents table against this committed table on md5(text)
    (the same committed-fixture pattern the KG-chain oracles use). Keying
    by text hash instead of (sf, doc_id) makes ONE fixture valid at every
    scale factor the driver or the local parity suite picks: it covers the
    union of doc_id < FUZZY_DOC_LIMIT texts across all testdata sfs."""
    import hashlib

    import duckdb
    import pyarrow as pa

    from delm_spark.operators.scoring import fuzzy_score_text

    con = duckdb.connect()
    texts = set()
    for sf in TESTDATA_SFS:
        p = f"/root/testdata/{sf}/documents.parquet"
        rows = con.sql(
            f"SELECT text FROM read_parquet('{p}') WHERE doc_id < {FUZZY_DOC_LIMIT}"
        ).fetchall()
        texts.update(r[0] for r in rows)
    entries = sorted(
        (hashlib.md5(t.encode("utf-8")).hexdigest(), fuzzy_score_text(t, FUZZY_KEYWORDS))
        for t in texts
    )
    return pa.table(
        {
            "text_md5": [e[0] for e in entries],
            "delm_score": pa.array([e[1] for e in entries], type=pa.float64()),
        }
    )


def main() -> None:
    import pyarrow.parquet as pq

    from delm_spark.data.synthetic import entity_dictionary, generate_transcripts
    from delm_spark.session import get_spark

    spark = get_spark(cores=4)
    t = generate_transcripts(spark, n_convs=N_CONVS, n_hot=N_HOT)
    t.coalesce(1).write.mode("overwrite").parquet(
        str(FIXTURE_DIR / "transcripts.parquet")
    )
    d = entity_dictionary(spark)
    d.coalesce(1).write.mode("overwrite").parquet(
        str(FIXTURE_DIR / "dictionary.parquet")
    )
    pq.write_table(make_fuzzy_fixture(), FIXTURE_DIR / "fuzzy_scores.parquet")
    print("rows:", spark.read.parquet(str(FIXTURE_DIR / "transcripts.parquet")).count())
    print("fuzzy rows:", len(make_fuzzy_fixture()))


if __name__ == "__main__":
    main()
