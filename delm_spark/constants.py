"""Engine-wide constants.

Semantics mirrored from the reference implementation
(/root/reference/src/delm/constants.py:96-165) so that cleaning and
column naming behave identically; values are re-declared here, not imported.
"""

# System column names (reference: constants.py:97-107)
FILE_NAME_COL = "delm_file_name"
RAW_DATA_COL = "delm_raw_data"
RECORD_ID_COL = "delm_record_id"
CHUNK_COL = "delm_text_chunk"
CHUNK_ID_COL = "delm_chunk_id"
SCORE_COL = "delm_score"
BATCH_ID_COL = "delm_batch_id"
ERRORS_COL = "delm_errors"
EXTRACTED_JSON_COL = "delm_extracted_data_json"

# Lineage / ordering columns added by the Spark rebuild (not in reference;
# they make the reference's implicit positional ordering explicit).
CONV_ID_COL = "conv_id"
TURN_IDX_COL = "turn_idx"
CHUNK_POS_COL = "chunk_pos"
PART_ID_COL = "delm_part_id"
CACHE_KEY_COL = "delm_cache_key"
#: true on rows served from the persistent semantic cache (no backend call
#: this run; the reference's cache hits add no cost, cost_tracker.py:43-57)
CACHE_HIT_COL = "delm_cache_hit"
#: partition column of the persistent cache table: the run that extracted
#: the row. Each run appends into its own `delm_run_id=<id>/` partition, so
#: the table stays one-success-row-per-key by construction (misses are
#: anti-joined against prior successes before extraction).
RUN_ID_COL = "delm_run_id"

# Values an LLM emits to mean "no value"; filtered from string-typed
# variables during cleaning (reference: constants.py:159-165).
LLM_NULL_WORDS_LOWERCASE = ["none", "null", "unknown", "n/a", ""]

# Reproducibility seed (reference: constants.py:110)
RANDOM_SEED = 42

# Splitting defaults (reference: constants.py:41-44)
DEFAULT_FIXED_WINDOW_SIZE = 5
DEFAULT_FIXED_WINDOW_STRIDE = 5
PARAGRAPH_SPLIT_REGEX = r"\r?\n\s*\r?\n"  # reference: splitting_strategies.py:59
SENTENCE_SPLIT_REGEX = r"(?<=[.!?])\s+"  # reference: splitting_strategies.py:87
