"""Aggregated query registry: importing this module registers every
declared query (core relational + operator extensions) into
libcolumnfile_spark.queries.REGISTRY.
"""

from __future__ import annotations

import libcolumnfile_spark.queries as _q

# Import for registration side effects (each module's @query decorators).
from libcolumnfile_spark.operators import aggregates as _aggregates  # noqa: F401
from libcolumnfile_spark.operators import dedup as _dedup  # noqa: F401
from libcolumnfile_spark.operators import similarity as _similarity  # noqa: F401
from libcolumnfile_spark.operators import text as _text  # noqa: F401
from libcolumnfile_spark.operators import relational as _relational  # noqa: F401
from libcolumnfile_spark.operators import udfs as _udfs  # noqa: F401
from libcolumnfile_spark.operators import multimodal as _multimodal  # noqa: F401
from libcolumnfile_spark.operators import pipeline as _pipeline  # noqa: F401
from libcolumnfile_spark.sources.columnfile import queries as _colq  # noqa: F401
from libcolumnfile_spark.sources import stock as _stock  # noqa: F401
from libcolumnfile_spark.streaming import queries as _streamq  # noqa: F401

REGISTRY = _q.REGISTRY
Query = _q.Query


def all_queries():
    return dict(REGISTRY)
