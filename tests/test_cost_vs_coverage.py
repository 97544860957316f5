"""Reference-example parity demo (examples/cost_vs_coverage): drive
DelmSpark with the example's config shape over a synthetic earnings-like
corpus and reproduce the coverage/cost-saving table
(cost_vs_coverage_results.csv columns: total_paragraphs,
paragraphs_with_extractions, paragraphs_processed,
selected_with_extractions, coverage, cost_savings, filtered_cost,
keywords, keyword_size).

The reference-measured facts this mirrors: the baseline row is
coverage=1.0 / savings=0.0 by construction, a 1-keyword filter prunes the
overwhelming majority of cost (reference: ['oil'] -> 98.2% saving at 5.8%
coverage), and coverage grows monotonically with keyword-set size."""

from __future__ import annotations

import json
import random

from pyspark.sql import functions as F

from delm_spark.constants import CHUNK_COL, CHUNK_ID_COL, EXTRACTED_JSON_COL
from delm_spark.data.synthetic import TRIPLE_SCHEMA_CFG
from delm_spark.delm import DelmSpark
from delm_spark.extraction.cost import estimate_input_cost

#: keyword ladder over the rule-extractor's predicate phrases — the
#: example's TF-IDF-ranked commodity keywords play this role there
KEYWORD_SETS = [
    ["works at"],
    ["works at", "uses the"],
    ["works at", "uses the", "is located in"],
]

FACTS = [
    ("Alice Smith works at Acme Corp.", 0.05),
    ("Bob Jones uses the Sparkql Engine.", 0.03),
    ("Carol Wu is located in Berlin.", 0.02),
]

FILLER = [
    "the quarterly results were broadly in line with what management had "
    "guided during the previous call and no segment showed surprises",
    "we continue to monitor operating expenses closely while investing in "
    "the initiatives that the board approved earlier in the fiscal year",
    "headcount remained roughly flat quarter over quarter as attrition "
    "offset the hiring we completed across the regional support teams",
    "free cash flow conversion stayed healthy and the balance sheet gives "
    "us ample flexibility heading into the back half of the year",
]


def _corpus(spark, n_docs: int = 300, paras_per_doc: int = 6):
    rng = random.Random(42)
    rows = []
    for i in range(n_docs):
        paras = []
        for _ in range(paras_per_doc):
            r = rng.random()
            acc = 0.0
            chosen = None
            for fact, p in FACTS:
                acc += p
                if r < acc:
                    chosen = fact
                    break
            paras.append(chosen if chosen else rng.choice(FILLER))
        rows.append((f"doc{i:04d}", "\n\n".join(paras)))
    return spark.createDataFrame(rows, "doc_id string, text string")


def _config(keywords=None):
    """The examples/cost_vs_coverage/config.yaml shape, verbatim fields."""
    cfg = {
        "llm_extraction": {
            "provider": "openai",
            "name": "gpt-4o-mini",
            "temperature": 0.0,
            "max_retries": 3,
            "batch_size": 10,
            "max_workers": 4,
            "base_delay": 1.0,
            "track_cost": True,
            "max_budget": 50.0,
        },
        "data_preprocessing": {
            "target_column": "text",
            "drop_target_column": False,
            "splitting": {"type": "ParagraphSplit"},
        },
        "schema": {"spec": TRIPLE_SCHEMA_CFG},
    }
    if keywords is not None:
        cfg["data_preprocessing"]["scoring"] = {
            "type": "KeywordScorer",
            "keywords": list(keywords),
        }
        cfg["data_preprocessing"]["pandas_score_filter"] = "delm_score >= 1.0"
    return cfg


def test_cost_vs_coverage_table(spark):
    corpus = _corpus(spark)
    model = "gpt-4o-mini"

    # ground truth: unfiltered run through the facade — which paragraphs
    # yield extractions (the example reads this off labeled data)
    base = DelmSpark.from_dict(_config(None), spark)
    base_prep = base.prep_data(corpus)
    extracted = base.process_via_llm()
    from delm_spark.schemas.compile import spark_schema_for
    from delm_spark.schemas.spec import spec_from_dict

    container = TRIPLE_SCHEMA_CFG["container_name"]
    schema = spark_schema_for(spec_from_dict(TRIPLE_SCHEMA_CFG))
    truth = extracted.select(
        CHUNK_ID_COL,
        (
            F.size(F.from_json(F.col(EXTRACTED_JSON_COL), schema)[container]) > 0
        ).alias("has_extraction"),
    ).cache()
    total_paragraphs = base_prep.count()
    with_extractions = truth.filter("has_extraction").count()
    assert 0 < with_extractions < total_paragraphs

    baseline_cost = estimate_input_cost(base_prep, CHUNK_COL, model)
    rows = [
        {
            "total_paragraphs": total_paragraphs,
            "paragraphs_with_extractions": with_extractions,
            "paragraphs_processed": total_paragraphs,
            "selected_with_extractions": with_extractions,
            "coverage": 1.0,
            "cost_savings": 0.0,
            "filtered_cost": baseline_cost,
            "keywords": [],
            "keyword_size": 0,
        }
    ]

    for kw in KEYWORD_SETS:
        d = DelmSpark.from_dict(_config(kw), spark)
        selected = d.prep_data(corpus)
        processed = selected.count()
        sel_with = (
            selected.select(CHUNK_ID_COL)
            .join(truth.filter("has_extraction"), CHUNK_ID_COL, "left_semi")
            .count()
        )
        cost = estimate_input_cost(selected, CHUNK_COL, model)
        rows.append(
            {
                "total_paragraphs": total_paragraphs,
                "paragraphs_with_extractions": with_extractions,
                "paragraphs_processed": processed,
                "selected_with_extractions": sel_with,
                "coverage": sel_with / with_extractions,
                "cost_savings": (baseline_cost - cost) / baseline_cost,
                "filtered_cost": cost,
                "keywords": kw,
                "keyword_size": len(kw),
            }
        )

    print("\ncost_vs_coverage table:")
    for r in rows:
        print(json.dumps(r))

    # reference-measured shape assertions
    assert rows[0]["coverage"] == 1.0 and rows[0]["cost_savings"] == 0.0
    # the 1-keyword filter prunes >90% of cost (reference: 98.2%)
    assert rows[1]["cost_savings"] > 0.9, rows[1]
    # coverage grows monotonically with keyword-set size ...
    covs = [r["coverage"] for r in rows[1:]]
    assert covs == sorted(covs)
    # ... and the full phrase set recovers every extracting paragraph
    assert covs[-1] == 1.0
    # the keyword filter never selects a paragraph the phrase can't extract
    # from in this corpus, so selected == selected_with for each ladder step
    for r in rows[1:]:
        assert r["paragraphs_processed"] == r["selected_with_extractions"]
    # savings shrink as keywords are added (more paragraphs survive)
    saves = [r["cost_savings"] for r in rows[1:]]
    assert saves == sorted(saves, reverse=True)
