"""qcflow — a PySpark-native data quality-control engine.

Built from scratch with the capabilities of the reference app
``hongbin-xu/txIAC-QC`` (a pandas/Streamlit pavement-QC tool), re-expressed
Spark-first and re-targeted as a language-ID + quality-filter + PII/toxicity
scrub stage over tables of audio clip + transcript pairs (see SURVEY.md).

Layout
------
- ``session``   — SparkSession factory tuned for local[N] and cluster use
- ``synth``     — deterministic synthetic clip-table generator (fixtures)
- ``audio``     — dependency-free PCM16 / G.711 u-law codecs (numpy)
- ``models``    — broadcastable model artifacts: hashed n-gram langid,
                  char n-gram LM (perplexity), compiled regex scrub tables
- ``udfs``      — the only pandas UDFs: langid, perplexity, PCM decode/SNR
- ``features``  — per-row features as pure Spark column expressions
- ``rules``     — percentile threshold derivation + the keep/drop rule engine
- ``scrub``     — ordered regexp_replace PII/toxicity scrub chain
- ``summary``   — parameterized breakdown/pivot/histogram/ECDF summaries
- ``pipeline``  — end-to-end composition with persist points + lineage
- ``checkpoint``— snapshot/resume over parquet manifests (Iceberg-style)
- ``reference_labeler`` — independent pandas oracle for F1 parity
- ``parity``    — operator-parity queries over the driver test tables,
                  each with a DuckDB-runnable ANSI-SQL oracle
"""

__version__ = "0.1.0"
