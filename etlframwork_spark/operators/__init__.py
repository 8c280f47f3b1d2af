"""Generic operator layer: driver-contract queries + DuckDB oracles.

Importing this package populates the QUERIES/ORACLES registries from all
operator modules (relational + training-data-pipeline functions).
"""

from .registry import ORACLES, QUERIES, query  # noqa: F401
from . import relational  # noqa: F401  (registers relational queries)
from . import advanced  # noqa: F401  (range join, sessionize, UDAF, UDTF)
from . import cdc  # noqa: F401  (registers CDC replay queries)
from ..functions import text, dedup, similarity, multimodal  # noqa: F401  (register theirs)
