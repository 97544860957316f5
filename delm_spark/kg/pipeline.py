"""The staged KG-construction pipeline (north-rule stages 1-8).

    transcripts -> chunk -> score/filter -> extract -> triples
               -> link -> canonicalize -> nodes/edges

Each stage can be checkpointed to a staging parquet directory with
per-partition lineage (`delm_part_id`); a rerun reuses every committed
stage (atomic via Spark's _SUCCESS marker), which replaces the reference's
feather-batch checkpoint/resume with corruption repair
(/root/reference/src/delm/core/extraction_manager.py:109-167,
experiment_manager.py:385-484): a partially-written stage has no _SUCCESS
file and is rebuilt from the previous committed stage, so restarts are
idempotent by construction.
"""

from __future__ import annotations

import shutil
from dataclasses import dataclass, field
from pathlib import Path
from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from delm_spark.constants import (
    CHUNK_COL,
    CHUNK_POS_COL,
    ERRORS_COL,
    EXTRACTED_JSON_COL,
    PART_ID_COL,
    SCORE_COL,
)
from delm_spark.data.synthetic import FACT_KEYWORDS, TRIPLE_SCHEMA_CFG
from delm_spark.extraction.backend import ExtractorBackend, RuleTripleExtractor
from delm_spark.extraction.extract import extract_chunks
from delm_spark.kg.canonicalize import canonical_map
from delm_spark.kg.linking import link_mentions
from delm_spark.operators.scoring import keyword_score_expr
from delm_spark.operators.splitting import paragraph_split_expr
from delm_spark.schemas.compile import spark_schema_for
from delm_spark.schemas.spec import NestedSpec, SchemaSpec, spec_from_dict


class StageRunner:
    """Checkpointed stage execution with resume.

    `stage(name, build)` returns the committed staging table if present,
    else builds, writes (adding `delm_part_id` lineage if missing), and
    re-reads it. Without a checkpoint dir it is a passthrough (pure lazy
    plan; Catalyst fuses stages).

    `fingerprint` guards resume against config drift, like the reference's
    verify_resume_config (experiment_manager.py): each committed stage
    stores the config fingerprint it was built with (a `_`-prefixed sidecar
    file, invisible to the parquet reader); resuming with a different
    fingerprint refuses by default (`on_config_change="error"`) or rebuilds
    the stale stage (`"rebuild"`).
    """

    def __init__(
        self,
        spark: SparkSession,
        checkpoint_dir: Optional[str] = None,
        fingerprint: Optional[str] = None,
        on_config_change: str = "error",
        storage: Optional[str] = None,
        iceberg_namespace: str = "delm.stages",
    ):
        self.spark = spark
        self.dir = Path(checkpoint_dir) if checkpoint_dir else None
        self.fingerprint = fingerprint
        self.on_config_change = on_config_change
        # stage-table format: 'parquet' (default in-sandbox) or 'iceberg'
        # (auto-selected when the runtime jar + a SparkCatalog are present;
        # the north star names Iceberg tables — delm_spark/io/iceberg.py).
        # Sidecars (fingerprint, _delm_state.json) stay files under
        # checkpoint_dir in both modes.
        if storage is None:
            from delm_spark.io.iceberg import configured_catalog, iceberg_available

            storage = (
                "iceberg"
                if iceberg_available(spark) and configured_catalog(spark)
                else "parquet"
            )
        if storage not in ("parquet", "iceberg"):
            raise ValueError(f"unknown stage storage {storage!r}")
        self.storage = storage
        self.iceberg_namespace = iceberg_namespace
        self.resumed: list[str] = []
        self.built: list[str] = []
        #: per-stage named metrics (rows, errors, token sums — the
        #: reference's batch-progress counters + cost state,
        #: extraction_manager.py:130-141, experiment_manager.py:487-513),
        #: collected via DataFrame.observe at write time and persisted to
        #: _delm_state.json so they survive restarts (resumed stages
        #: report the stored values).
        self.metrics: dict[str, dict] = {}
        if self.dir is not None and self._state_path().exists():
            import json as _json

            self.metrics = _json.loads(self._state_path().read_text())

    def _state_path(self) -> Path:
        assert self.dir is not None
        return self.dir / "_delm_state.json"

    def _save_state(self) -> None:
        import json as _json

        self.dir.mkdir(parents=True, exist_ok=True)
        self._state_path().write_text(_json.dumps(self.metrics, indent=1, sort_keys=True))

    def _path(self, name: str) -> Path:
        assert self.dir is not None
        return self.dir / name

    def _fp_path(self, name: str) -> Path:
        return self._path(name) / "_delm_config_fingerprint"

    def _ident(self, name: str) -> str:
        return f"{self.iceberg_namespace}.{name}"

    def _write_stage(
        self, df: DataFrame, name: str, partition_by=None, sort_by=None
    ) -> None:
        """`partition_by`: low-cardinality value partitioning (Hive dirs /
        Iceberg identity partitions — partition pruning for readers).
        `sort_by`: within-partition clustering so parquet row-group
        min/max stats prune point/range lookups on that column."""
        if sort_by:
            df = df.sortWithinPartitions(*sort_by)
        if self.storage == "iceberg":
            from delm_spark.io import iceberg

            iceberg.write_stage(df, self._ident(name), partition_by=partition_by)
        else:
            w = df.write.mode("overwrite")
            if partition_by:
                w = w.partitionBy(*partition_by)
            w.parquet(str(self._path(name)))

    def _read_stage(self, name: str) -> DataFrame:
        if self.storage == "iceberg":
            from delm_spark.io import iceberg

            return iceberg.read_stage(self.spark, self._ident(name))
        return self.spark.read.parquet(str(self._path(name)))

    def is_committed(self, name: str) -> bool:
        if self.dir is None:
            return False
        if self.storage == "iceberg":
            from delm_spark.io import iceberg

            return iceberg.stage_exists(self.spark, self._ident(name))
        return (self._path(name) / "_SUCCESS").exists()

    def _fingerprint_ok(self, name: str) -> bool:
        if self.fingerprint is None:
            return True
        fp = self._fp_path(name)
        return fp.exists() and fp.read_text() == self.fingerprint

    def invalidate(self, name: str) -> None:
        if self.dir is None:
            return
        if self.storage == "iceberg":
            self.spark.sql(f"DROP TABLE IF EXISTS {self._ident(name)}")
        if self._path(name).exists():
            shutil.rmtree(self._path(name))

    def stage(
        self,
        name: str,
        build: Callable[[], DataFrame],
        partition_by=None,
        sort_by=None,
    ) -> DataFrame:
        # Without a checkpoint dir the pipeline is ONE lazy linear DAG —
        # no persist, no eager counts. Measured on this box: in-memory
        # cache writes convoy badly above ~16 concurrent tasks (single-JVM
        # MemoryStore contention), and persisted-stage plans tempt AQE
        # into materializing independent branches concurrently over a cold
        # cache (duplicating the Python extraction). The restructured plan
        # consumes every stage exactly once, so neither mechanism is needed.
        if self.dir is None:
            return build()
        p = self._path(name)
        if self.is_committed(name):
            if self._fingerprint_ok(name):
                self.resumed.append(name)
                return self._read_stage(name)
            if self.on_config_change == "rebuild":
                self.invalidate(name)
            else:
                raise RuntimeError(
                    f"checkpointed stage {name!r} at {p} was built with a "
                    "different pipeline config/schema; refusing to resume "
                    "(reference experiment_manager.verify_resume_config "
                    "semantics). Pass on_config_change='rebuild' or use a "
                    "fresh checkpoint_dir."
                )
        if self.storage == "parquet" and p.exists():
            # partial write from a killed run — rebuild atomically (the
            # iceberg path needs no repair: an uncommitted snapshot is
            # invisible by construction)
            shutil.rmtree(p)
        df = build()
        if PART_ID_COL not in df.columns:
            df = df.withColumn(PART_ID_COL, F.spark_partition_id().cast("long"))
        from pyspark.sql import Observation

        obs = Observation()
        exprs = [F.count(F.lit(1)).alias("rows")]
        if ERRORS_COL in df.columns:
            exprs.append(
                F.coalesce(
                    F.sum(F.col(ERRORS_COL).isNotNull().cast("long")), F.lit(0)
                ).alias("errors")
            )
        for tok_col, alias in (
            ("delm_input_tokens", "input_tokens"),
            ("delm_output_tokens", "output_tokens"),
        ):
            if tok_col in df.columns:
                exprs.append(F.coalesce(F.sum(tok_col), F.lit(0)).alias(alias))
        df = df.observe(obs, *exprs)
        self._write_stage(df, name, partition_by=partition_by, sort_by=sort_by)
        self.metrics[name] = {k: int(v) for k, v in obs.get.items()}
        self._save_state()
        if self.fingerprint is not None:
            p.mkdir(parents=True, exist_ok=True)
            self._fp_path(name).write_text(self.fingerprint)
        self.built.append(name)
        return self._read_stage(name)


@dataclass
class PipelineConfig:
    schema_cfg: dict = field(default_factory=lambda: TRIPLE_SCHEMA_CFG)
    keywords: list = field(default_factory=lambda: list(FACT_KEYWORDS))
    score_threshold: float = 1.0
    #: comparison operator of the score filter (reference pandas-query
    #: predicates keep their operator, config.py:315-328) — one of
    #: operators.scoring.SCORE_OPS
    score_op: str = ">="
    checkpoint_dir: Optional[str] = None
    #: False = inline extraction (zero-shuffle map-only pipeline; right for
    #: cheap deterministic backends). True = sha2-dedup each distinct text
    #: before extraction and join back — right when the backend is a paid
    #: LLM call and the corpus repeats text (the reference's exact-match
    #: cache, semantic_cache.py:81-103).
    dedup_extraction: bool = False
    #: repartition width for the extraction stage; None = leave to AQE.
    #: Salting hot conversations: chunk rows already carry (conv_id,
    #: turn_idx, chunk_pos) composite keys, so a round-robin repartition
    #: spreads hot conversations across all tasks without key skew.
    extract_partitions: Optional[int] = None
    #: persistent semantic-cache parquet table (reference
    #: semantic_cache.py); implies dedup_extraction. A warm rerun performs
    #: zero backend calls.
    cache_dir: Optional[str] = None
    #: sample exactly this many conversations (seed 42, reference
    #: delm.py:237-240) before chunking; None = full corpus.
    sample_size: Optional[int] = None
    #: retry policy for I/O backends (reference retry_handler.py:38-58);
    #: the deterministic rule backend never retries.
    max_retries: int = 0
    base_delay: float = 0.0
    #: north-star 'dictionary + embedding blocking': after exact dictionary
    #: linking, resolve the `mention:*` residue via trigram-embedding
    #: sign-LSH candidates (kg/linking.py) so typo'd / truncated surfaces
    #: recover their canonical entity. Off by default: it adds a candidate
    #: search stage, and exact-only linking is the reference-parity shape.
    embedding_link: bool = False
    #: bind first-person pronoun subjects ("I works at Acme" from a user
    #: turn) to per-conversation speaker:<conv_id>:<role> entities BEFORE
    #: dictionary linking (kg/ground.py) — grounded subjects take their
    #: speaker string as subj_id directly, bypassing mention minting and
    #: the embedding residue pass (a speaker entity must never fuzzy-match
    #: a dictionary surface). Off by default: the reference emits the
    #: verbatim extraction.
    ground_pronouns: bool = False
    #: also bind second-person subjects to the ADDRESSEE role — only in
    #: conversations whose role census is exactly two (kg/ground.py);
    #: requires ground_pronouns
    ground_second_person: bool = False
    embedding_link_threshold: float = 0.5
    embedding_dim: int = 64
    embedding_planes: int = 8
    embedding_probe_radius: int = 2
    #: admission gate (kg/trajectory.transcript_integrity): quarantine
    #: conversations with duplicated/missing turn indices, timestamp
    #: regressions, stuck roles, or blank turns BEFORE chunking — a
    #: malformed conversation produces garbage triples, and at 10^12
    #: turns it is cheaper to gate than to clean downstream. Off by
    #: default: the fixture corpus is gate-clean only for structural
    #: rules a given deployment opts into.
    integrity_gate: bool = False
    #: which rules quarantine (severity order fixed in
    #: trajectory.INTEGRITY_RULES). Default = structural only: agent
    #: transcripts legitimately repeat roles and may carry blank turns,
    #: so those counters report but don't drop unless opted in.
    integrity_rules: tuple = ("dup_turn_idx", "gap_turn_idx", "ts_regression")


def config_fingerprint(config: "PipelineConfig", backend) -> str:
    """Stable hash of everything a committed stage's contents depend on —
    resuming under a different config must not silently return stale
    results (reference experiment_manager.verify_resume_config)."""
    import hashlib
    import json as _json

    material = {
        "schema_cfg": config.schema_cfg,
        "keywords": list(config.keywords),
        "score_threshold": config.score_threshold,
        "score_op": config.score_op,
        "dedup_extraction": config.dedup_extraction,
        "sample_size": config.sample_size,
        "backend": type(backend).__name__,
        "embedding_link": [
            config.embedding_link,
            config.embedding_link_threshold,
            config.embedding_dim,
            config.embedding_planes,
            config.embedding_probe_radius,
        ],
        # gated vs ungated corpora differ from stage s1 on — a resumed
        # checkpoint must not silently mix them; rule set matters too
        "integrity_gate": config.integrity_gate,
        "integrity_rules": list(config.integrity_rules),
        # grounding flags change the checkpointed s3_triples contents
        # (ADVICE r5): resuming after toggling either must not silently
        # return stale (un)grounded triples
        "ground": [config.ground_pronouns, config.ground_second_person],
    }
    # a PromptedApiBackend with a changed model/temperature/template produces
    # different extractions — the class name alone must not pass the resume
    # guard (the semantic cache keys on these; the stage checkpoint must too)
    call = getattr(backend, "call_spec", None)
    if call is not None:
        material["backend_call_spec"] = {
            "model_name": call.model_name,
            "temperature": call.temperature,
            "system_prompt": call.system_prompt,
            "prompt_template": call.prompt_template,
        }
    return hashlib.sha256(
        _json.dumps(material, sort_keys=True, default=str).encode("utf-8")
    ).hexdigest()


@dataclass
class PipelineResult:
    chunks: DataFrame
    extracted: DataFrame
    triples: DataFrame
    nodes: DataFrame
    edges: DataFrame
    runner: StageRunner
    #: per-conversation integrity report (only when
    #: config.integrity_gate) — the quarantine ledger
    integrity: Optional[DataFrame] = None


def chunk_transcripts(transcripts: DataFrame) -> DataFrame:
    """Stages 1-2: stable per-turn ordering keys + paragraph chunking.

    The per-row invariant (per-turn text equality under (conv_id, turn_idx))
    is carried as explicit columns; `posexplode` makes chunk position an
    explicit key (reference's positional chunk id, data_processor.py:126,133).
    """
    return transcripts.select(
        "conv_id",
        "turn_idx",
        "role",
        "ts",
        F.posexplode(paragraph_split_expr(F.col("text"))).alias(
            CHUNK_POS_COL, CHUNK_COL
        ),
    )


def score_and_filter(
    chunks: DataFrame, keywords: list, threshold: float, op: str = ">="
) -> DataFrame:
    """Stage 3: native keyword relevance scoring + filter (reference
    data_processor.py:144-151). The configured comparison operator is
    applied verbatim (the reference runs the pandas-query predicate as
    written — 'delm_score > 1.0' excludes score==1.0 chunks). Prunes LLM
    work before the expensive stage; predicate stays in whole-stage
    codegen."""
    from delm_spark.operators.scoring import SCORE_OPS

    if op not in SCORE_OPS:
        raise ValueError(f"Unsupported score-filter operator {op!r}")
    scored = chunks.withColumn(SCORE_COL, keyword_score_expr(F.col(CHUNK_COL), keywords))
    return scored.filter(SCORE_OPS[op](F.col(SCORE_COL), threshold))


def triples_from_extracted(extracted: DataFrame, spec: SchemaSpec) -> DataFrame:
    """Stage 5: JSON -> typed rows, natively (from_json + posexplode)."""
    assert isinstance(spec, NestedSpec)
    schema: StructType = spark_schema_for(spec)
    parsed = extracted.withColumn(
        "__parsed", F.from_json(F.col(EXTRACTED_JSON_COL), schema)
    )
    return parsed.select(
        "conv_id",
        "turn_idx",
        CHUNK_POS_COL,
        F.posexplode(F.col(f"__parsed.{spec.container_name}")).alias(
            "item_pos", "__item"
        ),
    ).select(
        "conv_id",
        "turn_idx",
        CHUNK_POS_COL,
        "item_pos",
        F.col("__item.subj").alias("subj"),
        F.col("__item.pred").alias("pred"),
        F.col("__item.obj").alias("obj"),
    )


def run_pipeline(
    spark: SparkSession,
    transcripts: DataFrame,
    dictionary: DataFrame,
    config: Optional[PipelineConfig] = None,
    backend: Optional[ExtractorBackend] = None,
) -> PipelineResult:
    config = config or PipelineConfig()
    if config.ground_second_person and not config.ground_pronouns:
        # (ADVICE r5): the second-person pass rides the grounding stage;
        # without it the flag silently no-ops, which reads as "grounded"
        raise ValueError(
            "ground_second_person requires ground_pronouns=True "
            "(second-person grounding rides the pronoun-grounding stage)"
        )
    spec = spec_from_dict(config.schema_cfg)
    backend = backend or RuleTripleExtractor(spec)
    runner = StageRunner(
        spark, config.checkpoint_dir, fingerprint=config_fingerprint(config, backend)
    )

    # canonical map from the dictionary's alias graph alone (driver-side
    # union-find for broadcast-sized dictionaries, ONE collect job) — no
    # triples dependency, so the main DAG below stays strictly linear with
    # every stage consumed exactly once. The result is a LocalTableScan,
    # so repeated broadcast builds don't recompute anything: no eager
    # checkpoints (each one costs a dedicated ~0.5 s job in local mode).
    labels = canonical_map(dictionary)

    integrity = None
    if config.integrity_gate:
        from .trajectory import transcript_integrity

        integrity = runner.stage(
            "s0_integrity",
            lambda: transcript_integrity(
                transcripts, rules=tuple(config.integrity_rules)
            ),
        )
        # semi join, not broadcast: the ok list is corpus-scale (most
        # conversations pass), and conv_id is the key every downstream
        # stage already hashes on
        transcripts = transcripts.join(
            integrity.filter(F.col("disposition") == "ok").select("conv_id"),
            "conv_id",
            "left_semi",
        )

    if config.sample_size:
        from delm_spark.operators.sample import seeded_sample_records

        transcripts = seeded_sample_records(
            transcripts, config.sample_size, "conv_id"
        )

    chunks = runner.stage(
        "s1_chunks",
        lambda: score_and_filter(
            chunk_transcripts(transcripts),
            config.keywords,
            config.score_threshold,
            config.score_op,
        ),
    )

    def build_extracted():
        # only the composite key + text cross the Arrow boundary; role/ts
        # stay out of the Python stage (column pruning by hand — the UDF is
        # a black box to Catalyst)
        df = chunks.select("conv_id", "turn_idx", CHUNK_POS_COL, CHUNK_COL)
        if config.extract_partitions:
            # round-robin spread of the Python-heavy stage; composite keys
            # make this safe (no per-partition ordering assumptions)
            df = df.repartition(config.extract_partitions)
        return extract_chunks(
            df,
            spec,
            backend,
            dedup=config.dedup_extraction,
            cache_dir=config.cache_dir,
            max_retries=config.max_retries,
            base_delay=config.base_delay,
        )

    extracted = runner.stage("s2_extracted", build_extracted)

    def build_triples():
        raw = None
        if runner.dir is None and not config.dedup_extraction and not config.cache_dir:
            # r6 fast path: with no checkpointed extracted stage to share,
            # build triples from the backend's NATIVE typed items — the
            # JSON string is never serialized and from_json never runs
            # (element-for-element parity with the JSON round-trip is
            # pinned in tests/test_round6_opt.py). PipelineResult.extracted
            # still exposes the lazy JSON frame for direct consumers.
            native_items = getattr(backend, "native_extract_items", None)
            items_col = (
                native_items(spec, F.col(CHUNK_COL))
                if native_items is not None
                else None
            )
            if items_col is not None:
                raw = (
                    chunks.select(
                        "conv_id", "turn_idx", CHUNK_POS_COL, items_col.alias("__items")
                    )
                    .select(
                        "conv_id",
                        "turn_idx",
                        CHUNK_POS_COL,
                        F.posexplode("__items").alias("item_pos", "__item"),
                    )
                    .select(
                        "conv_id",
                        "turn_idx",
                        CHUNK_POS_COL,
                        "item_pos",
                        *[
                            F.col(f"__item.{v.name}").alias(v.name)
                            for v in spec.variables
                        ],
                    )
                )
        if raw is None:
            raw = triples_from_extracted(extracted, spec)
        if config.ground_pronouns:
            from delm_spark.kg.ground import SECOND_PERSON, ground_pronouns

            # transcripts here is the post-integrity-gate frame, so a
            # quarantined conversation can never donate a speaker role
            raw = ground_pronouns(
                raw,
                transcripts,
                second_person=(
                    SECOND_PERSON if config.ground_second_person else ()
                ),
            )
        linked = link_mentions(raw, dictionary)
        if config.ground_pronouns:
            # a grounded speaker string IS its entity id — skip mention
            # minting so the residue resolver below never sees it
            linked = linked.withColumn(
                "subj_id",
                F.when(F.col("grounded") == 1, F.col("subj")).otherwise(
                    F.col("subj_id")
                ),
            ).drop("grounded")
        if config.embedding_link:
            from delm_spark.kg.linking import resolve_mention_residue

            # cut the DAG once: the residue resolver consumes the linked
            # frame three times (subj mentions, obj mentions, the rewrite
            # joins) — without a materialization each consumer would
            # recompute the whole upstream extraction (measured 2.6x the
            # exact pipeline's wall at sf0.1; eager avoids the AQE
            # concurrent-branch duplication a lazy persist invites)
            linked = linked.localCheckpoint(eager=True)
            linked = resolve_mention_residue(
                linked,
                dictionary,
                dim=config.embedding_dim,
                n_planes=config.embedding_planes,
                probe_radius=config.embedding_probe_radius,
                threshold=config.embedding_link_threshold,
            )
        return linked

    triples = runner.stage("s3_triples", build_triples)

    def build_edges():
        l_s = labels.select(
            F.col("node").alias("subj_id"), F.col("canonical_id").alias("subj_canonical")
        )
        l_o = labels.select(
            F.col("node").alias("obj_id"), F.col("canonical_id").alias("obj_canonical")
        )
        # canonical map is broadcast-sized by design; unmapped entities are
        # singleton components (coalesce to their own id)
        return (
            triples.join(F.broadcast(l_s), "subj_id", "left")
            .join(F.broadcast(l_o), "obj_id", "left")
            .select(
                "conv_id",
                "turn_idx",
                CHUNK_POS_COL,
                "item_pos",
                "subj",
                "pred",
                "obj",
                "subj_id",
                "obj_id",
                F.coalesce("subj_canonical", F.col("subj_id")).alias("subj_canonical"),
                F.coalesce("obj_canonical", F.col("obj_id")).alias("obj_canonical"),
            )
        )

    # graph materialization (north star: PARTITIONED edge/node tables):
    # edges partition by predicate — bounded cardinality (the schema's
    # allowed_values) — so per-relation readers prune whole directories /
    # Iceberg partitions; nodes cluster by entity_id so row-group min/max
    # stats prune point lookups without a high-cardinality partition key.
    edges = runner.stage("s4_edges", build_edges, partition_by=["pred"])

    def build_nodes():
        # node table derived from the edge output (one scan of the final
        # table, not a recompute of the triples DAG): every entity id
        # observed in the graph plus its canonical component
        return (
            edges.select(
                F.col("subj_id").alias("entity_id"),
                F.col("subj_canonical").alias("canonical_id"),
            )
            .unionByName(
                edges.select(
                    F.col("obj_id").alias("entity_id"),
                    F.col("obj_canonical").alias("canonical_id"),
                )
            )
            .dropDuplicates(["entity_id"])
        )

    nodes = runner.stage("s5_nodes", build_nodes, sort_by=["entity_id"])

    return PipelineResult(
        chunks=chunks,
        extracted=extracted,
        triples=triples,
        nodes=nodes,
        edges=edges,
        runner=runner,
        integrity=integrity,
    )
