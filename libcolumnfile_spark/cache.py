"""Shared fixture/index cache root.

Everything the engine materializes OUTSIDE the user's dataset —
format-conversion fixtures (sources/stock.py), bucketed table copies
(operators/joins.py), IVF index tables (operators/similarity.py), the
x10 scale-probe replicas (tools/scale_probe.py) — lives under ONE root
so a cluster deployment redirects all of it with a single setting:

    SPARK_GRAFT_CACHE_DIR=hdfs://nn/shared/libcolumnfile_cache

Default is the local /tmp path the single-node bench contract uses.
Existence checks route through the columnfile fs layer, so a remote
(Spark-readable) root works for the parquet-based caches unmodified.
"""

from __future__ import annotations

import os

from libcolumnfile_spark.sources.columnfile.fs import fs_exists, fs_join

DEFAULT_ROOT = "/tmp/libcolumnfile_spark"


def cache_root() -> str:
    return os.environ.get("SPARK_GRAFT_CACHE_DIR", DEFAULT_ROOT)


def cache_path(*parts: str) -> str:
    return fs_join(cache_root(), *parts)


def cache_has(*parts: str) -> bool:
    return fs_exists(cache_path(*parts))
