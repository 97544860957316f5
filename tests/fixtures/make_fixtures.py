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


def main() -> None:
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
    print("rows:", spark.read.parquet(str(FIXTURE_DIR / "transcripts.parquet")).count())


if __name__ == "__main__":
    main()
