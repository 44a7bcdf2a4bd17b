"""Declared queries through Spark's stock file sources (csv/json/orc):
the engine's non-columnfile ingest surface (SURVEY.md §2.2 "Scans/
sources"). Fixtures are parquet; each query converts once to the target
format (cached under /tmp, manifest = _SUCCESS from the Spark writer)
and reads back through the stock reader — the DuckDB oracle runs on the
ORIGINAL parquet, so the conversion + read cycle is what's validated.

Scale note: these are Spark-native readers (JVM, vectorized, splittable
except single-line JSON/CSV with multiline enabled) — format choice is
an ingest concern; everything downstream is format-agnostic DataFrames.
"""

from __future__ import annotations

import hashlib
import os

from pyspark.sql import DataFrame, SparkSession

from libcolumnfile_spark.queries import query
from libcolumnfile_spark.tables import load_table

_CACHE_ROOT = "/tmp/libcolumnfile_spark/stockcache"


def _converted(spark: SparkSession, sf_dir: str, table: str, fmt: str, **writer_opts):
    key = hashlib.sha1(sf_dir.encode()).hexdigest()[:12]
    path = os.path.join(_CACHE_ROOT, key, f"{table}_{fmt}")
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        w = load_table(spark, sf_dir, table).write.format(fmt)
        for k, v in writer_opts.items():
            w = w.option(k, v)
        w.mode("overwrite").save(path)
    return path


@query(
    "q_csv_scan",
    oracle="SELECT s_suppkey, s_name, s_acctbal FROM supplier",
    doc=(
        "CSV ingest cycle: parquet -> csv (header, explicit schema on "
        "read — schema inference would double the I/O at scale) -> "
        "DataFrame, oracle-checked against the original parquet."
    ),
    tags=("source", "csv"),
)
def q_csv_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    path = _converted(spark, sf_dir, "supplier", "csv", header="true")
    schema = load_table(spark, sf_dir, "supplier").schema
    return (
        spark.read.format("csv")
        .option("header", "true")
        .schema(schema)
        .load(path)
        .select("s_suppkey", "s_name", "s_acctbal")
    )


@query(
    "q_json_scan",
    oracle="SELECT r_regionkey, r_name FROM region",
    doc=(
        "JSON-lines ingest cycle: parquet -> json -> DataFrame with an "
        "explicit schema (no inference pass), oracle-checked against the "
        "original parquet."
    ),
    tags=("source", "json"),
)
def q_json_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    path = _converted(spark, sf_dir, "region", "json")
    schema = load_table(spark, sf_dir, "region").schema
    return spark.read.format("json").schema(schema).load(path).select("r_regionkey", "r_name")


@query(
    "q_orc_scan",
    oracle="SELECT p_partkey, p_brand, p_retailprice FROM part WHERE p_size >= 25",
    doc=(
        "ORC ingest cycle with predicate pushdown: parquet -> orc -> "
        "filtered read (ORC row-group stats skipping, same model as "
        "parquet/columnfile), oracle-checked against the original parquet."
    ),
    tags=("source", "orc", "pushdown"),
)
def q_orc_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    path = _converted(spark, sf_dir, "part", "orc")
    return (
        spark.read.format("orc")
        .load(path)
        .filter(F.col("p_size") >= 25)
        .select("p_partkey", "p_brand", "p_retailprice")
    )


@query(
    "q_text_scan",
    # fixture text is newline-free (verified), so line <-> row is exact
    oracle="SELECT text AS value FROM documents",
    doc=(
        "Plain-text ingest cycle: documents.text -> line-per-doc .txt "
        "files -> spark.read.text (one 'value' column — the raw-corpus "
        "ingest shape: splittable, schemaless, the first step of every "
        "crawl pipeline), oracle-checked against the original parquet."
    ),
    tags=("source", "text"),
)
def q_text_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    key = hashlib.sha1(sf_dir.encode()).hexdigest()[:12]
    path = os.path.join(_CACHE_ROOT, key, "documents_text")
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        load_table(spark, sf_dir, "documents").select("text").write.mode(
            "overwrite"
        ).text(path)
    return spark.read.text(path)
