"""Generic operator layer: driver-contract queries + DuckDB oracles.

Importing this package populates the QUERIES/ORACLES registries from all
operator modules (relational + training-data-pipeline functions).
"""

from .registry import ORACLES, QUERIES, query  # noqa: F401
from . import relational  # noqa: F401  (registers relational queries)
from . import advanced  # noqa: F401  (range join, sessionize, UDAF, UDTF)

# Registration order matters: the driver runs queries in this order with a
# finite budget (round 2 stopped after 50) — multimodal + similarity go
# BEFORE the docs long tail so they can never fall off the end again, and
# the registry is capped at 50 entries total (tests/test_queries.py pins it).
from ..functions import multimodal, similarity  # noqa: F401  (register theirs)
from . import cdc  # noqa: F401  (registers CDC replay queries)
from ..functions import text, dedup  # noqa: F401  (register theirs)
