"""Declared queries through Spark's stock file sources (csv/json/orc):
the engine's non-columnfile ingest surface (SURVEY.md §2.2 "Scans/
sources"). Fixtures are parquet; each query converts once to the target
format (cached under SPARK_GRAFT_CACHE_DIR, manifest = _SUCCESS from the Spark writer)
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
from pyspark.sql import functions as F

from libcolumnfile_spark.sources.columnfile.fs import fs_exists, fs_join
from libcolumnfile_spark.cache import cache_has, cache_path
from libcolumnfile_spark.queries import query
from libcolumnfile_spark.tables import load_table


def _converted(spark: SparkSession, sf_dir: str, table: str, fmt: str, **writer_opts):
    key = hashlib.sha1(sf_dir.encode()).hexdigest()[:12]
    path = cache_path("stockcache", key, f"{table}_{fmt}")
    if not cache_has("stockcache", key, f"{table}_{fmt}", "_SUCCESS"):
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
    path = cache_path("stockcache", key, "documents_text")
    if not fs_exists(fs_join(path, "_SUCCESS")):
        load_table(spark, sf_dir, "documents").select("text").write.mode(
            "overwrite"
        ).text(path)
    return spark.read.text(path)


def _partitioned_orders(spark: SparkSession, sf_dir: str) -> str:
    """Hive-partitioned copy of orders (partition column o_orderpriority)
    — the physical layout that makes partition pruning possible. One-time
    conversion, cached like every other fixture derivation."""
    key = hashlib.sha1(sf_dir.encode()).hexdigest()[:12]
    path = cache_path("stockcache", key, "orders_partitioned")
    if not fs_exists(fs_join(path, "_SUCCESS")):
        load_table(spark, sf_dir, "orders").write.mode("overwrite").partitionBy(
            "o_orderpriority"
        ).parquet(path)
    return path


@query(
    "q_partition_pruned",
    oracle=(
        "SELECT o_orderstatus, count(*) AS n_orders, "
        "CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,2))), 2) AS DOUBLE) AS total "
        "FROM orders WHERE o_orderpriority = '1-URGENT' GROUP BY o_orderstatus"
    ),
    doc=(
        "Static partition pruning: a filter on the partition column of a "
        "hive-partitioned table is resolved at PLANNING time — only the "
        "1-URGENT directory is listed and scanned; the plan's "
        "PartitionFilters carries the predicate and the other four "
        "partitions contribute zero I/O (tests/test_plans.py audits "
        "this). At 100 TB, partition-layout + pruning is the difference "
        "between scanning 20 TB and 100 TB."
    ),
    tags=("source", "pruning"),
)
def q_partition_pruned(spark: SparkSession, sf_dir: str) -> DataFrame:
    path = _partitioned_orders(spark, sf_dir)
    o = spark.read.parquet(path)
    return (
        o.filter(F.col("o_orderpriority") == "1-URGENT")
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum(F.col("o_totalprice").cast("decimal(18,2)")), 2)
            .cast("double")
            .alias("total"),
        )
    )


@query(
    "q_partition_pruned_dynamic",
    # dim = the distinct priorities that contain 'URGENT' (2 of 5);
    # only those partitions of the fact are scanned, but the pruning
    # values are only known at RUNTIME (join side), not parse time
    oracle=(
        "SELECT o_orderpriority, count(*) AS n_orders "
        "FROM orders WHERE o_orderpriority LIKE '%URGENT%' "
        "GROUP BY o_orderpriority"
    ),
    doc=(
        "Dynamic partition pruning: the fact's partition filter comes "
        "from a JOIN to a filtered dimension, so Catalyst injects a "
        "runtime subquery that prunes fact partitions with the dim's "
        "build-side values (plan shows dynamicpruning#N). The "
        "declarative join is all it takes — no manual pushdown."
    ),
    tags=("source", "pruning", "join"),
)
def q_partition_pruned_dynamic(spark: SparkSession, sf_dir: str) -> DataFrame:
    path = _partitioned_orders(spark, sf_dir)
    o = spark.read.parquet(path)
    dim = (
        load_table(spark, sf_dir, "orders")
        .select("o_orderpriority")
        .distinct()
        .filter(F.col("o_orderpriority").contains("URGENT"))
        .withColumnRenamed("o_orderpriority", "p")
    )
    return (
        o.join(dim, o.o_orderpriority == dim.p)
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )


@query(
    "q_xml_scan",
    oracle="SELECT n_nationkey, n_name, n_regionkey FROM nation",
    doc=(
        "XML ingest cycle (Spark 4 built-in XML source): parquet -> "
        "row-tagged XML -> DataFrame with an explicit schema (no "
        "inference pass), oracle-checked against the original parquet. "
        "The reader is splittable on row tags, so at scale this is a "
        "parallel scan like csv/json — XML feeds (sitemaps, news "
        "syndication, Wikipedia dumps) are a standard crawl-corpus "
        "ingest shape."
    ),
    tags=("source", "xml"),
)
def q_xml_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    path = _converted(
        spark, sf_dir, "nation", "xml", rootTag="nations", rowTag="nation"
    )
    schema = load_table(spark, sf_dir, "nation").schema
    return (
        spark.read.format("xml")
        .option("rowTag", "nation")
        .schema(schema)
        .load(path)
        .select("n_nationkey", "n_name", "n_regionkey")
    )


# ---------------------------------------------------------------------------
# binaryFile source: Spark's standard ingest path for raw multimodal
# corpora (image/audio dumps as one file per asset). The fixture has no
# binary dump, so a deterministic one is derived from documents — each
# doc becomes one file whose bytes are the utf-8 of
# "DOC|<doc_id>|<text>" — and the oracle recomputes the same md5/length
# from the same construction in SQL, so the SOURCE (path/length/content
# schema, per-file partitioning) is what's actually under test; the
# codec layer has its own queries (q_media_decode).
# ---------------------------------------------------------------------------

_BIN_N_DOCS = 64


def _binary_fixture(spark: SparkSession, sf_dir: str) -> str:
    key = hashlib.sha1(sf_dir.encode()).hexdigest()[:12]
    path = cache_path("stockcache", key, "documents_bin")
    if not cache_has("stockcache", key, "documents_bin", "_DONE"):
        import os

        os.makedirs(path, exist_ok=True)
        rows = (
            load_table(spark, sf_dir, "documents")
            .filter(F.col("doc_id") < _BIN_N_DOCS)
            .select("doc_id", "text")
        )

        # one file per row, written from the executors (foreachPartition
        # — the fixture conversion is itself distributed, like every
        # other stockcache conversion; local-fs only, same contract as
        # the csv/json caches)
        def write_part(it):
            for r in it:
                p = os.path.join(path, f"{r['doc_id']:06d}.bin")
                tmp = p + ".tmp"
                with open(tmp, "wb") as f:
                    f.write(f"DOC|{r['doc_id']}|{r['text']}".encode("utf-8"))
                os.replace(tmp, p)

        rows.foreachPartition(write_part)
        with open(os.path.join(path, "_DONE"), "w") as f:
            f.write("ok")
    return path


@query(
    "q_binary_ingest",
    oracle=(
        f"SELECT doc_id, strlen('DOC|' || CAST(doc_id AS VARCHAR) || '|' "
        f"|| text) AS n_bytes, "
        "md5('DOC|' || CAST(doc_id AS VARCHAR) || '|' || text) AS "
        f"content_md5 FROM documents WHERE doc_id < {_BIN_N_DOCS}"
    ),
    # plan_cache off: the memo would freeze the one-time fixture check
    # into a plan built before the files existed on a cold cache
    plan_cache=False,
    doc=(
        "Raw-asset ingest through Spark's binaryFile source (one file "
        "per document, path/length/content schema): doc id parsed from "
        "the file path, byte length and content md5 verified against "
        "the same deterministic construction in SQL."
    ),
    tags=("source", "multimodal"),
)
def q_binary_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    path = _binary_fixture(spark, sf_dir)
    return (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.bin")
        .load(path)
        .select(
            F.regexp_extract(F.col("path"), r"(\d+)\.bin$", 1)
            .cast("bigint")
            .alias("doc_id"),
            F.col("length").alias("n_bytes"),
            F.md5(F.col("content")).alias("content_md5"),
        )
    )
