"""Operator-parity layer.

Every operator from SURVEY.md §2 (the reference's full dataflow surface)
plus the training-data-pipeline extensions (dedup / similarity / text
analysis / multimodal) is registered here as a named query over the driver
test tables, together with an ANSI-SQL oracle that DuckDB runs on the same
parquet files. Importing this package populates the registry.
"""

from qcflow.parity.registry import ORACLES, QUERIES, load_tables  # noqa: F401

# Import for registration side effects.
from qcflow.parity import tpch  # noqa: F401, E402
from qcflow.parity import tpch2  # noqa: F401, E402
from qcflow.parity import tpch3  # noqa: F401, E402
from qcflow.parity import reference_ops  # noqa: F401, E402
from qcflow.parity import dedup  # noqa: F401, E402
from qcflow.parity import similarity  # noqa: F401, E402
from qcflow.parity import text  # noqa: F401, E402
from qcflow.parity import docqc  # noqa: F401, E402
from qcflow.parity import multimodal_q  # noqa: F401, E402
from qcflow.parity import advanced_ops  # noqa: F401, E402
from qcflow.parity import pmis_q  # noqa: F401, E402
from qcflow.parity import functions_q  # noqa: F401, E402
from qcflow.parity import audio_q  # noqa: F401, E402
from qcflow.parity import sources_q  # noqa: F401, E402
from qcflow.parity import streaming_q  # noqa: F401, E402
