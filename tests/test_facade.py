"""One-call facade e2e: YAML config -> prep_data -> process_via_llm ->
cost + P/R dict, mirroring the reference's example flow
(/root/reference/src/delm/delm.py:43-280) with zero other imports."""

from __future__ import annotations

import json

import pytest

from delm_spark.delm import DelmSpark

CONFIG_YAML = """
llm_extraction:
  name: deterministic-rules
  temperature: 0.0
  max_retries: 1
  base_delay: 0.0
data_preprocessing:
  target_column: delm_raw_data
  splitting: {type: ParagraphSplit}
  scoring:
    type: KeywordScorer
    keywords: ["works at", "created", "uses the"]
  pandas_score_filter: "delm_score >= 1.0"
schema:
  spec:
    schema_type: nested
    container_name: triples
    variables:
      - {name: subj, description: subject, data_type: string,
         required: true, validate_in_text: true}
      - {name: pred, description: relation, data_type: string,
         required: true,
         allowed_values: [works_at, uses_tool, located_in, reports_to, created]}
      - {name: obj, description: object, data_type: string,
         required: true, validate_in_text: true}
"""

DOCS = {
    "a.txt": "Alice Smith works at Acme Corp. She is happy.\n\nBob Jones created Widgetizer.",
    "b.txt": "Carol White uses the Fooly Tool. Unrelated filler text.",
    "c.txt": "Nothing relevant here at all.",
}


@pytest.fixture()
def corpus(tmp_path):
    d = tmp_path / "corpus"
    d.mkdir()
    for name, text in DOCS.items():
        (d / name).write_text(text)
    cfg = tmp_path / "config.yaml"
    cfg.write_text(CONFIG_YAML)
    return d, cfg


def test_yaml_to_triples_and_prf(spark, corpus, tmp_path):
    corpus_dir, cfg_path = corpus
    delm = DelmSpark.from_yaml(
        cfg_path, spark,
        experiment_name="e2e", experiment_directory=str(tmp_path / "exp"),
    )

    prepped = delm.prep_data(str(corpus_dir))
    rows = prepped.collect()
    # c.txt has no keyword hit -> filtered; a.txt splits into 2 paragraphs
    assert {r["delm_file_name"].split("/")[-1] for r in rows} == {"a.txt", "b.txt"}
    assert all(r["delm_score"] >= 1.0 for r in rows)
    assert len({r["delm_chunk_id"] for r in rows}) == len(rows)

    extracted = delm.process_via_llm()
    got = {
        (t["subj"], t["pred"], t["obj"])
        for r in extracted.collect()
        if r["delm_extracted_data_json"]
        for t in json.loads(r["delm_extracted_data_json"])["triples"]
    }
    assert ("Alice Smith", "works_at", "Acme Corp") in got
    assert ("Bob Jones", "created", "Widgetizer") in got
    assert ("Carol White", "uses_tool", "Fooly Tool") in got

    cost = delm.get_cost_summary()
    assert cost["input_tokens"] > 0 and cost["cost_usd"] == 0.0  # free model

    # golden = what a perfect extractor returns for these chunks -> P=R=1
    expected = delm.get_extraction_results().selectExpr(
        "delm_chunk_id", "delm_extracted_data_json AS expected_json"
    )
    prf = delm.evaluate_json(expected, key="delm_chunk_id")
    assert prf, "no fields scored"
    for field, m in prf.items():
        assert m["precision"] == 1.0 and m["recall"] == 1.0, (field, m)

    # a second facade over the same experiment dir sees the artifacts
    # without recomputation (reference get_extraction_results surface)
    again = DelmSpark.from_yaml(
        cfg_path, spark,
        experiment_name="e2e", experiment_directory=str(tmp_path / "exp"),
    )
    assert again.get_extraction_results().count() == extracted.count()


def test_prep_data_accepts_dataframe_and_samples(spark, tmp_path):
    cfg = {
        "data_preprocessing": {
            "target_column": "text",
            "splitting": {"type": None},
        },
        "schema": {"spec": {
            "schema_type": "nested", "container_name": "triples",
            "variables": [
                {"name": "subj", "description": "s", "data_type": "string"},
            ],
        }},
    }
    delm = DelmSpark.from_dict(cfg, spark)
    df = spark.range(50).selectExpr("concat('Doc ', id) AS text")
    out = delm.prep_data(df, sample_size=10)
    assert out.count() == 10
    assert {"delm_record_id", "delm_chunk_id", "delm_text_chunk"} <= set(out.columns)
