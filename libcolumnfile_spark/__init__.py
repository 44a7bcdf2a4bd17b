"""libcolumnfile_spark — a PySpark-native analytics engine with the
capabilities of mortehu/libcolumnfile (reference: /root/reference).

Two layers (SURVEY.md):

1. Format layer (`sources.columnfile`): read/write the reference's
   column-major `.col` format (magic/varint/RLE/prefix-coding/5 codecs,
   reference src/columnfile-internal.h, src/columnfile-writer.cc,
   src/columnfile-reader.cc) as a PySpark DataSource with column pruning
   and filter pushdown.

2. Query layer (`queries`, `operators`): the full query surface —
   scan/project/filter/sort/join/agg/window/set-ops plus LLM-pipeline
   operators (dedup, similarity search, text analysis) — expressed with
   stock DataFrame/SQL operators so Catalyst/Tungsten/AQE plan them.
"""

__version__ = "0.1.0"

from libcolumnfile_spark.session import get_spark  # noqa: F401
from libcolumnfile_spark.tables import TABLE_NAMES, load_table, load_tables  # noqa: F401
