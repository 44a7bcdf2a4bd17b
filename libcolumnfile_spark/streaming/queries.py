"""Oracle-checked batch equivalents of the streaming pipelines.

Each declared query runs the SAME transform function the streaming side
uses (pipelines.py) on the batch events table — the watermark is a
no-op on batch frames, everything else is identical. The genuinely
streaming behaviors (micro-batches, checkpoints, incremental offsets,
watermark-dropped late data, stateful updates) are exercised in
tests/test_streaming.py where a driver oracle can't reach.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from libcolumnfile_spark.queries import T, query
from libcolumnfile_spark.streaming import pipelines as P

# DuckDB: make_timestamp takes micros; epoch() returns (fractional)
# seconds. Window start for a grid offset by `off` seconds with period
# `per` = floor((epoch - off)/per)*per + off, epoch-aligned like Spark's
# F.window.
_GRID = (
    "make_timestamp(CAST((floor((epoch(ts) - {off})/{per})*{per} + {off}) "
    "AS BIGINT) * 1000000)"
)


@query(
    "q_stream_sliding",
    oracle=(
        "SELECT "
        + _GRID.format(off=0, per=3600)
        + " AS window_start, event_type, count(*) AS n_events "
        "FROM events GROUP BY 1, 2 "
        "UNION ALL "
        "SELECT "
        + _GRID.format(off=1800, per=3600)
        + " AS window_start, event_type, count(*) AS n_events "
        "FROM events GROUP BY 1, 2"
    ),
    doc=(
        "Sliding 1h/30m windows (each event lands in 2 windows). Oracle "
        "= union of the two 30-minute-offset hourly grids; Spark side is "
        "the streaming sliding_counts transform run on the batch frame."
    ),
    tags=("streaming", "window"),
)
def q_stream_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    return P.sliding_counts(T(spark, sf_dir, "events"))


@query(
    "q_stream_session",
    # Session semantics: a new session starts when the gap from the
    # previous event reaches the timeout (Spark session_window end is
    # exclusive: last_ts + gap). lag+cumsum reproduces that exactly.
    oracle=(
        "WITH gaps AS ("
        "  SELECT user_id, ts, value, CASE WHEN ts - lag(ts) OVER "
        "    (PARTITION BY user_id ORDER BY ts) >= INTERVAL 10 MINUTE "
        "    THEN 1 ELSE 0 END AS new_session FROM events), "
        "sess AS ("
        "  SELECT user_id, ts, value, sum(new_session) OVER "
        "    (PARTITION BY user_id ORDER BY ts "
        "     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid "
        "  FROM gaps) "
        "SELECT min(ts) AS session_start, user_id, count(*) AS n_events, "
        "CAST(round(sum(CAST(value AS DECIMAL(18,2))), 2) AS DOUBLE) AS total_value "
        "FROM sess GROUP BY user_id, sid"
    ),
    doc=(
        "Session windows (10-minute gap) per user: dynamic-length "
        "windows, the one window type with merge-on-arrival state. "
        "Spark side is the streaming session_counts transform on batch."
    ),
    tags=("streaming", "window", "session"),
)
def q_stream_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    d = T(spark, sf_dir, "events")
    return (
        d.groupBy(F.session_window("ts", "10 minutes").alias("w"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(F.col("value").cast("decimal(18,2)")), 2)
            .cast("double")
            .alias("total_value"),
        )
        .select(
            F.col("w.start").alias("session_start"),
            "user_id",
            "n_events",
            "total_value",
        )
    )


@query(
    "q_stream_join",
    oracle=(
        "SELECT c.event_id AS click_id, c.user_id, "
        "p.event_id AS purchase_id, p.value "
        "FROM events c JOIN events p ON c.user_id = p.user_id "
        "AND c.event_type = 'click' AND p.event_type = 'purchase' "
        "AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 30 MINUTE"
    ),
    doc=(
        "Stream-stream interval join (clicks x purchases within 30 min "
        "per user), batch face of pipelines.click_purchase_join — the "
        "same function runs watermarked on streams, where the time bound "
        "is what makes join state evictable (tests/test_streaming.py "
        "runs the genuinely streaming side)."
    ),
    tags=("streaming", "join"),
)
def q_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    return P.click_purchase_join(T(spark, sf_dir, "events"))


@query(
    "q_stream_dedup",
    # Deterministic batch face: keep the EARLIEST event per key (ts,
    # then event_id) — the batch-queryable semantic of streaming
    # first-arrival dedup, and unlike dropDuplicates' arbitrary-row
    # pick it value-hash-checks against the oracle.
    oracle=(
        "SELECT event_id, user_id, event_type, ts, value FROM ("
        "  SELECT event_id, user_id, event_type, ts, value, "
        "  row_number() OVER (PARTITION BY user_id, event_type "
        "    ORDER BY ts, event_id) AS rn FROM events) WHERE rn = 1"
    ),
    doc=(
        "Batch face of dropDuplicatesWithinWatermark: dedup on "
        "(user_id, event_type) keeping the earliest event (ts, event_id "
        "tie-break). The genuinely-streaming side "
        "(dropDuplicatesWithinWatermark, arrival order, bounded state) "
        "runs in tests/test_streaming.py::test_dedup_within_watermark."
    ),
    tags=("streaming", "dedup"),
)
def q_stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    d = T(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    return (
        d.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("event_id", "user_id", "event_type", "ts", "value")
    )


@query(
    "q_stream_static_join",
    oracle=(
        "SELECT c_mktsegment AS segment, event_type, "
        "count(*) AS n_events, "
        "CAST(round(sum(CAST(value AS DECIMAL(18,2))), 2) AS DOUBLE) AS total_value "
        "FROM events JOIN customer ON user_id = c_custkey "
        "GROUP BY 1, 2"
    ),
    doc=(
        "Stream-static broadcast join + aggregation, batch face of "
        "pipelines.static_enrich_counts: the event stream enriched with "
        "the customer dimension. Stateless on the stream side (static "
        "side complete every micro-batch); the genuinely streaming run "
        "is tests/test_streaming.py::test_stream_static_join."
    ),
    tags=("streaming", "join"),
)
def q_stream_static_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    return P.static_enrich_counts(
        T(spark, sf_dir, "events"), T(spark, sf_dir, "customer")
    )


def _fuzzy_dedup_oracle() -> str:
    from libcolumnfile_spark.operators.dedup import md5_sig_key_sql

    key = md5_sig_key_sql("toks", "doc_id")
    return (
        "WITH t AS (SELECT doc_id, "
        "string_split_regex(lower(trim(text)), '\\s+') AS toks FROM documents), "
        f"k AS (SELECT doc_id, {key} AS sig_key FROM t) "
        "SELECT min(doc_id) AS doc_id, count(*) AS dup_count "
        "FROM k GROUP BY sig_key"
    )


@query(
    "q_stream_dedup_fuzzy",
    oracle=_fuzzy_dedup_oracle(),
    doc=(
        "Batch face of streaming NEAR-dup suppression "
        "(pipelines.fuzzy_dedup_within_watermark): every document keyed "
        "by its row-local MinHash signature (md5 family, "
        "dedup.md5_minhash_sig_key — deterministic across engines), "
        "earliest doc_id per signature survives with its duplicate "
        "count. The genuinely streaming side "
        "(dropDuplicatesWithinWatermark on the signature, bounded "
        "state, arrival order) runs in "
        "tests/test_streaming.py::test_fuzzy_dedup_within_watermark. "
        "Scale: signature is a per-row projection; the groupBy carries "
        "(sig_key, id) only, never document bodies."
    ),
    tags=("streaming", "dedup", "llm-pipeline"),
)
def q_stream_dedup_fuzzy(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from libcolumnfile_spark.operators.dedup import (
        md5_sig_key_kernel,
        minhash_tokens,
    )
    from libcolumnfile_spark.tables import spread

    # signature kernel is compute-heavy per row (md5 per gram): spread
    # the map stage to core width even when the scan plans few splits.
    # Tokens materialize in Catalyst; the Arrow kernel does md5 grams +
    # affine minima batch-at-a-time (value-identical to the Catalyst
    # expression — pinned by test; this oracle value-checks it too).
    d = spread(T(spark, sf_dir, "documents"))
    toks = d.select("doc_id", minhash_tokens(F.col("text")).alias("__toks"))
    keyed = toks.select(
        "doc_id",
        md5_sig_key_kernel()(
            F.col("__toks"), F.col("doc_id").cast("string")
        ).alias("sig_key"),
    )
    return keyed.groupBy("sig_key").agg(
        F.min("doc_id").alias("doc_id"), F.count(F.lit(1)).alias("dup_count")
    ).select("doc_id", "dup_count")


@query(
    "q_stream_topk",
    oracle=(
        "WITH a AS (SELECT "
        + _GRID.format(off=0, per=3600)
        + " AS window_start, event_type, count(*) AS n_events "
        "FROM events GROUP BY 1, 2), "
        "r AS (SELECT *, CAST(row_number() OVER (PARTITION BY window_start "
        "ORDER BY n_events DESC, event_type) AS INT) AS rank FROM a) "
        "SELECT window_start, event_type, n_events, rank FROM r "
        "WHERE rank <= 3"
    ),
    doc=(
        "Per-hour top-3 event types (trending-now board), batch face of "
        "pipelines.windowed_topk: incremental tumbling aggregate under "
        "the watermark + a window-partitioned rank on the aggregated "
        "(window x key) table — on a stream the rank applies at the "
        "sink (complete mode / foreachBatch), exercised in "
        "tests/test_streaming.py."
    ),
    tags=("streaming", "window", "topk"),
)
def q_stream_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return P.windowed_topk(T(spark, sf_dir, "events"))
