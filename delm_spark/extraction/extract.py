"""The extraction stage: one `mapInPandas` over Arrow batches.

Replaces the reference's batch loop + ThreadPool fan-out
(/root/reference/src/delm/core/extraction_manager.py:78-242,
utils/concurrent_processing.py:25-117): a Spark partition's Arrow batch
plays the role of a DELM batch (`spark.sql.execution.arrow.maxRecordsPerBatch`
≙ batch_size), task parallelism replaces threads, and per-chunk error
safety (extraction_manager.py:244-269) is a try/except inside the UDF that
emits a `delm_errors` column instead of throwing.

Cache-style dedup: identical chunk texts are extracted once
(`dropDuplicates` on a sha2 cache key, reference semantic_cache.py:81-103)
and fanned back out with a join — dedup-before-work is strictly better
than the reference's per-call cache lookup at scale.
"""

from __future__ import annotations

import json
from typing import Iterator, Optional

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

from delm_spark.constants import (
    CACHE_KEY_COL,
    CHUNK_COL,
    ERRORS_COL,
    EXTRACTED_JSON_COL,
    PART_ID_COL,
)
from delm_spark.extraction.backend import ExtractorBackend
from delm_spark.schemas.clean import clean_response
from delm_spark.schemas.spec import SchemaSpec

#: columns appended by the extraction stage
IN_TOKENS_COL = "delm_input_tokens"
OUT_TOKENS_COL = "delm_output_tokens"


def _token_estimate(s: str) -> int:
    """Documented tiktoken stand-in: ~4 chars/token (reference counts real
    tokens via tiktoken cl100k_base, cost_tracker.py:59-62; unavailable
    here)."""
    return (len(s) + 3) // 4


def extract_chunks(
    df: DataFrame,
    spec: SchemaSpec,
    backend: ExtractorBackend,
    text_col: str = CHUNK_COL,
    dedup: bool = True,
    max_retries: int = 0,
) -> DataFrame:
    """Run schema-guided extraction over `df[text_col]`.

    Returns `df` plus columns:
      delm_extracted_data_json (string, cleaned JSON),
      delm_errors (string or null),
      delm_input_tokens / delm_output_tokens (long),
      delm_part_id (lineage: which task produced the row).

    With `dedup=True`, distinct texts are extracted once and re-joined on a
    sha2 cache key — the run-internal equivalent of the reference's
    exact-match semantic cache (semantic_cache.py:81-103).
    """
    out_fields = StructType(
        [
            StructField(CACHE_KEY_COL, StringType()),
            StructField(EXTRACTED_JSON_COL, StringType()),
            StructField(ERRORS_COL, StringType()),
            StructField(IN_TOKENS_COL, LongType()),
            StructField(OUT_TOKENS_COL, LongType()),
            StructField(PART_ID_COL, LongType()),
        ]
    )

    def run_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        part_id = TaskContext.get().partitionId() if TaskContext.get() else -1
        for pdf in batches:
            texts = pdf["__text"]
            keys = pdf[CACHE_KEY_COL]
            jsons: list[Optional[str]] = []
            errors: list[Optional[str]] = []
            in_toks: list[int] = []
            out_toks: list[int] = []
            for text in texts:
                text = text or ""
                raw, err = None, None
                for attempt in range(max_retries + 1):
                    try:
                        raw = backend.extract_raw(text)
                        err = None
                        break
                    except Exception as e:  # error-safe per chunk
                        err = f"{type(e).__name__}: {e}"
                if err is not None:
                    jsons.append(None)
                    errors.append(json.dumps({"error": err}))
                    in_toks.append(_token_estimate(text))
                    out_toks.append(0)
                    continue
                cleaned = clean_response(raw, spec, text)
                j = json.dumps(cleaned, sort_keys=False)
                jsons.append(j)
                errors.append(None)
                in_toks.append(_token_estimate(text))
                out_toks.append(_token_estimate(j))
            yield pd.DataFrame(
                {
                    CACHE_KEY_COL: keys,
                    EXTRACTED_JSON_COL: jsons,
                    ERRORS_COL: errors,
                    IN_TOKENS_COL: in_toks,
                    OUT_TOKENS_COL: out_toks,
                    PART_ID_COL: part_id,
                }
            )

    if PART_ID_COL in df.columns:
        # upstream stage lineage was materialized already; this stage emits
        # its own task lineage
        df = df.drop(PART_ID_COL)
    keyed = df.withColumn(CACHE_KEY_COL, F.sha2(F.coalesce(F.col(text_col), F.lit("")), 256))
    if dedup:
        unique = keyed.select(F.col(CACHE_KEY_COL), F.col(text_col).alias("__text")) \
            .dropDuplicates([CACHE_KEY_COL])
    else:
        unique = keyed.select(F.col(CACHE_KEY_COL), F.col(text_col).alias("__text"))

    extracted = unique.mapInPandas(run_batches, schema=out_fields)
    joined = keyed.join(extracted, on=CACHE_KEY_COL, how="left")
    if not dedup:
        # without dedup the join would fan out on duplicate keys; dedup the
        # extraction side defensively
        joined = keyed.join(
            extracted.dropDuplicates([CACHE_KEY_COL]), on=CACHE_KEY_COL, how="left"
        )
    return joined
