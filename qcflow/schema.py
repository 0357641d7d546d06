"""Fixed schemas (schema-on-write — the opposite of the reference's
inferred ``pd.read_csv``, Home.py:98; see SURVEY.md §1.3)."""

from __future__ import annotations

from pyspark.sql import types as T

# BASELINE.json input_hint: the flagship input table.
CLIPS_SCHEMA = T.StructType(
    [
        T.StructField("clip_id", T.StringType(), False),
        T.StructField("bytes", T.BinaryType(), True),
        T.StructField("sr_hz", T.IntegerType(), True),
        T.StructField("dur_ms", T.IntegerType(), True),
        T.StructField("codec", T.StringType(), True),
        T.StructField("transcript", T.StringType(), True),
    ]
)

# Companion truth table written by the generator (never read by the
# pipeline; used only to evaluate planted-defect recall in tests).
CLIPS_META_SCHEMA = T.StructType(
    [
        T.StructField("clip_id", T.StringType(), False),
        T.StructField("true_lang", T.StringType(), True),
        T.StructField("planted", T.StringType(), True),  # csv of planted defects
    ]
)

LABELS_SCHEMA = T.StructType(
    [
        T.StructField("clip_id", T.StringType(), False),
        T.StructField("keep", T.BooleanType(), False),
        T.StructField("drop_reasons", T.StringType(), False),  # csv, fixed rule order
        T.StructField("lang", T.StringType(), False),
        T.StructField("lang_conf", T.DoubleType(), False),
        T.StructField("perplexity", T.DoubleType(), False),
        T.StructField("scrubbed_transcript", T.StringType(), True),
    ]
)
