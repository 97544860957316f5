"""First-person pronoun grounding: bind deictic triple subjects to
per-conversation speaker entities.

Agent/conversation transcripts routinely yield triples whose subject is
a first-person pronoun — "I work at Acme" extracted from a user turn
means (THE SPEAKER, works_at, acme), not ("I", works_at, acme). Left
ungrounded, every conversation's "I" collides into one meaningless node
that entity linking then welds into a giant false component. The
reference (Center-for-Applied-AI/delm) stops at emitting the raw
extraction (`src/delm/core/extraction_manager.py` keeps the schema's
verbatim strings); speaker grounding is a transcript-KG extension this
engine adds on top.

The grounding rule is deterministic and purely structural: a triple
whose subject (case-insensitive) is in the pronoun set, and whose
(conv_id, turn_idx) lineage resolves to a transcript turn, gets the
synthetic speaker entity ``speaker:<conv_id>:<role>`` as its subject —
per-conversation, per-role, so two conversations (or the user and the
assistant within one) never collide. Triples whose lineage does not
resolve (orphan extraction, transcript retention lapsed) keep their
subject and are flagged ungrounded rather than guessed.

Scale shape (100 TB framing): the pronoun slice is filtered FIRST, so
the role join's left side is bounded by pronoun frequency (<<1% of
triples in practice), not corpus size; the transcript side is cut to
exactly the needed (conv_id, turn_idx) keys by a semi-join before the
role lookup, so no full-corpus row survives to the join. All three
exchanges hash on (conv_id, turn_idx) — the pipeline's native
partitioning — and the non-pronoun complement never shuffles at all.
Roles are min-aggregated per key, making the result deterministic even
if an upstream feed violated the (conv_id, turn_idx) uniqueness
invariant (the transcript integrity gate flags that separately).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, functions as F

#: default deictic subject set — first-person singular and plural,
#: subject/object/possessive forms, matched case-insensitively
FIRST_PERSON: tuple[str, ...] = (
    "i", "me", "my", "mine", "myself", "we", "us", "our", "ours",
)


def ground_pronouns(
    triples: DataFrame,
    transcripts: DataFrame,
    pronouns: Sequence[str] = FIRST_PERSON,
    subj_col: str = "subj",
    conv_col: str = "conv_id",
    turn_col: str = "turn_idx",
    role_col: str = "role",
    speaker_prefix: str = "speaker:",
) -> DataFrame:
    """Rewrite pronoun subjects to ``speaker:<conv_id>:<role>`` entities.

    Returns ``triples`` with the same columns plus an int ``grounded``
    flag: 1 = subject was a pronoun and was rewritten, 0 = either not a
    pronoun (passed through untouched) or a pronoun whose (conv_id,
    turn_idx) has no transcript row (subject kept verbatim — never
    guessed). Row count and non-subject columns are preserved exactly.
    """
    pron_set = [p.lower() for p in pronouns]
    is_pron = F.lower(F.col(subj_col)).isin(pron_set)

    rest = triples.filter(~is_pron).withColumn("grounded", F.lit(0))
    pron = triples.filter(is_pron)

    # cut the transcript table to exactly the keys the pronoun slice
    # needs, THEN resolve one deterministic role per key
    keys = pron.select(conv_col, turn_col).distinct()
    roles = (
        transcripts.join(keys, [conv_col, turn_col], "left_semi")
        .groupBy(conv_col, turn_col)
        .agg(F.min(role_col).alias("__role"))
    )
    grounded = (
        pron.join(roles, [conv_col, turn_col], "left")
        .withColumn(
            subj_col,
            F.when(
                F.col("__role").isNotNull(),
                F.concat(
                    F.lit(speaker_prefix),
                    F.col(conv_col),
                    F.lit(":"),
                    F.col("__role"),
                ),
            ).otherwise(F.col(subj_col)),
        )
        .withColumn(
            "grounded",
            F.when(F.col("__role").isNotNull(), F.lit(1)).otherwise(F.lit(0)),
        )
        .drop("__role")
    )
    return rest.unionByName(grounded)
