"""Deterministic synthetic transcript corpus (seed-free: pure hash-derived).

Generates the canonical input table of BASELINE.json `input_hint`:
    conv_id:string, turn_idx:int32, role:string, text:string,
    tool:string, ts:timestamp

Everything is derived from `xxhash64` of (conv_id, turn_idx, salt) inside
native Catalyst expressions, so the corpus is:
  * deterministic across runs/partitionings (no RNG state),
  * generated distributed from `spark.range` (no driver materialization —
    the same generator shape works at 10^12 turns),
  * skewed: a configurable head of "hot" conversations with 100-400 turns
    (Zipf-ish tail of 2-20) to exercise salting/AQE skew handling.

Turn text embeds extractable facts from closed vocabularies (entities,
predicates) so the deterministic rule extractor and the reference DELM
pure-function oracle agree on expected triples; ~1/11 sentences carry
cleaning noise (null-word objects, disallowed predicates) to exercise the
validation rules, and multi-sentence turns use \\n\\n joins ~25% of the
time to exercise ParagraphSplit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

# --- Closed vocabularies ----------------------------------------------------
# Canonical entities with alias surfaces (multiple surfaces per canonical id
# exercise dictionary linking + connected components). No '.' in surfaces so
# sentence boundaries stay unambiguous.

PEOPLE: dict[str, list[str]] = {
    "person:alice_smith": ["Alice Smith", "Dr Alice Smith", "A Smith"],
    "person:bob_jones": ["Bob Jones", "Mr Bob Jones", "B Jones"],
    "person:carol_wu": ["Carol Wu", "Dr Carol Wu", "C Wu"],
    "person:dan_brown": ["Dan Brown", "Daniel Brown", "D Brown"],
    "person:eve_adams": ["Eve Adams", "E Adams"],
    "person:frank_mueller": ["Frank Mueller", "F Mueller"],
    "person:grace_kim": ["Grace Kim", "G Kim"],
    "person:hassan_ali": ["Hassan Ali", "H Ali"],
}

ORGS: dict[str, list[str]] = {
    "org:acme": ["Acme Corp", "Acme Corporation", "ACME"],
    "org:globex": ["Globex", "Globex Inc", "Globex Incorporated"],
    "org:initech": ["Initech", "Initech LLC"],
    "org:umbrella": ["Umbrella Co", "Umbrella Company"],
    "org:stark": ["Stark Industries", "Stark Ind"],
    "org:wayne": ["Wayne Enterprises", "Wayne Ent"],
}

TOOLS: dict[str, list[str]] = {
    "tool:sparkql": ["Sparkql", "The Sparkql Engine"],
    "tool:duckbill": ["Duckbill", "Duckbill DB"],
    "tool:airlift": ["Airlift", "Airlift Scheduler"],
    "tool:kafkaesque": ["Kafkaesque", "Kafkaesque Bus"],
    "tool:prestissimo": ["Prestissimo"],
    "tool:flinker": ["Flinker"],
}

PLACES: dict[str, list[str]] = {
    "place:berlin": ["Berlin"],
    "place:paris": ["Paris"],
    "place:london": ["London"],
    "place:tokyo": ["Tokyo"],
    "place:oslo": ["Oslo"],
}

PREDICATES = ["works_at", "uses_tool", "located_in", "reports_to", "created"]

DISTRACTORS = [
    "the weather was nice that day",
    "let me check the logs for more details",
    "that sounds good, thanks for the update",
    "please rerun the job and report back",
    "we should sync about this tomorrow morning",
    "the deployment finished without incident",
]

ROLES = ["user", "assistant", "assistant", "user", "tool", "assistant"]

TRIPLE_SCHEMA_CFG = {
    "schema_type": "nested",
    "container_name": "triples",
    "variables": [
        {"name": "subj", "description": "subject entity mention", "data_type": "string",
         "required": True, "validate_in_text": True},
        {"name": "pred", "description": "relation", "data_type": "string",
         "required": True, "allowed_values": PREDICATES},
        {"name": "obj", "description": "object entity mention", "data_type": "string",
         "required": True, "validate_in_text": True},
    ],
}

#: keyword filter that keeps every fact-bearing chunk (incl. noise templates,
#: so the cleaning rules actually see dirty input downstream)
FACT_KEYWORDS = ["works at", "uses the", "located in", "reports to",
                 "created", "dislikes"]


def _surfaces(d: dict[str, list[str]]) -> list[str]:
    return [s for surfs in d.values() for s in surfs]


PERSON_SURFACES = _surfaces(PEOPLE)
ORG_SURFACES = _surfaces(ORGS)
TOOL_SURFACES = _surfaces(TOOLS)
PLACE_SURFACES = _surfaces(PLACES)


def _h(*cols, salt: str) -> Column:
    """Deterministic non-negative hash of key columns + salt."""
    return F.abs(F.xxhash64(F.lit(salt), *cols))


def _field(h: Column, shift: int, size: int) -> Column:
    """Derive an index field from distinct bits of ONE hash — a single
    xxhash64 per sentence instead of one per argument keeps the expression
    tree (and per-row eval cost) ~7x smaller."""
    return F.shiftrightunsigned(h, shift) % size


def _pick_at(surfaces: list[str], h: Column, shift: int) -> Column:
    arr = F.array(*[F.lit(s) for s in surfaces])
    return F.element_at(arr, (_field(h, shift, len(surfaces)) + 1).cast("int"))


def _sentence(conv: Column, turn: Column, k: int) -> Column:
    """One deterministic sentence. Template mix: 6 fact, 1 null-word noise,
    1 disallowed-predicate noise, 4 distractor (weights via modulus)."""
    h = F.xxhash64(F.lit("sent"), conv, turn, F.lit(k))
    t = F.abs(h) % 12
    p1 = _pick_at(PERSON_SURFACES, h, 4)
    p2 = _pick_at(PERSON_SURFACES, h, 9)
    org = _pick_at(ORG_SURFACES, h, 14)
    tool = _pick_at(TOOL_SURFACES, h, 19)
    place = _pick_at(PLACE_SURFACES, h, 24)
    distractor = _pick_at(DISTRACTORS, h, 29)
    c = F.concat
    lit = F.lit
    return (
        F.when(t == 0, c(p1, lit(" works at "), org, lit(".")))
        .when(t == 1, c(p1, lit(" uses the "), tool, lit(" tool.")))
        .when(t == 2, c(org, lit(" is located in "), place, lit(".")))
        .when(t == 3, c(p1, lit(" reports to "), p2, lit(".")))
        .when(t == 4, c(p1, lit(" created "), tool, lit(".")))
        .when(t == 5, c(p2, lit(" works at "), org, lit(".")))
        # noise: null-word object -> dropped by cleaning rule 2
        .when(t == 6, c(p1, lit(" works at Unknown.")))
        # noise: predicate outside allowed_values -> dropped by rule 3
        .when(t == 7, c(p1, lit(" dislikes "), org, lit(".")))
        .otherwise(c(distractor, lit(".")))
    )


def generate_transcripts(
    spark: SparkSession,
    n_convs: int = 200,
    n_hot: int = 2,
    partitions: int | None = None,
) -> DataFrame:
    """Build the transcript table distributed; ~9 turns/conv on average
    plus `n_hot` hot conversations with 100-400 turns each."""
    convs = spark.range(0, n_convs, 1, partitions or spark.sparkContext.defaultParallelism)
    conv_id = F.format_string("conv_%08d", F.col("id"))
    n_turns = (
        F.when(F.col("id") < n_hot, (_h(F.col("id"), salt="hot") % 300 + 100))
        .otherwise(_h(F.col("id"), salt="len") % 19 + 2)
        .cast("int")
    )
    df = convs.select(
        conv_id.alias("conv_id"),
        F.col("id").alias("_conv_no"),
        F.explode(F.sequence(F.lit(0), n_turns - 1)).alias("turn_idx"),
    ).withColumn("turn_idx", F.col("turn_idx").cast("int"))

    conv, turn = F.col("conv_id"), F.col("turn_idx")
    ht = F.xxhash64(F.lit("turn"), conv, turn)
    n_sents = (F.abs(ht) % 3 + 1).cast("int")
    sents = F.slice(
        F.array(*[_sentence(conv, turn, k) for k in range(3)]), 1, n_sents
    )
    # ~25% of multi-sentence turns use paragraph breaks
    para = _field(ht, 2, 4) == 0
    text = F.when(para, F.array_join(sents, "\n\n")).otherwise(
        F.array_join(sents, " ")
    )
    role = _pick_at(ROLES, ht, 5)
    tool = F.when(role == "tool", _pick_at(TOOL_SURFACES, ht, 9))
    ts = F.timestamp_seconds(
        F.lit(1704067200) + F.col("_conv_no") * 3600 + turn.cast("long")
    )
    return df.select(
        conv,
        turn,
        role.alias("role"),
        text.alias("text"),
        tool.alias("tool"),
        ts.alias("ts"),
    )


def entity_dictionary(spark: SparkSession) -> DataFrame:
    """Canonical entity dictionary: (surface, canonical_id, weight).

    Broadcast-sized by design (the north rule's canonical dictionary is
    broadcast-joined). Multiple surfaces per canonical id exercise
    connected-component canonicalization.
    """
    import pandas as pd

    rows = []
    for d in (PEOPLE, ORGS, TOOLS, PLACES):
        for cid, surfs in d.items():
            for s in surfs:
                rows.append((s.lower(), cid, 1.0))
    # Arrow-backed local frame (pandas input): materializes as a JVM-side
    # LocalTableScan. The plain-rows createDataFrame path is Python-RDD
    # backed — EVERY downstream action (each broadcast build, each CC
    # iteration, each checkpoint) re-runs Python deserializer tasks, and
    # at 32 cores that measured ~6 s per action for this 50-row table vs
    # ~0.5 s through Arrow.
    pdf = pd.DataFrame(rows, columns=["surface", "canonical_id", "weight"])
    return spark.createDataFrame(
        pdf, "surface string, canonical_id string, weight double"
    ).coalesce(1)
