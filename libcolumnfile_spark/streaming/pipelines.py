"""Streaming transformations: watermarked tumbling/sliding/session
windows, watermark-bounded dedup, and custom stateful processing.

Every transform here takes a DataFrame and returns a DataFrame — the
SAME function works on a batch frame (where watermarks are no-ops) and
on a streaming frame. That is the engine's batch/stream unification
claim, and it's what the oracle-checked batch-equivalent queries in
queries.py pin down; tests/test_streaming.py runs the genuinely
streaming side (micro-batches, checkpoints, incremental offsets, late
data) over the same functions.

Scale notes (100 TB/day stream):
- windowed aggregations keep O(open windows x groups) state, bounded by
  the watermark — late data past the delay is dropped, state is evicted;
- dropDuplicatesWithinWatermark state is likewise watermark-bounded
  (exact dedup over an unbounded stream is unbounded state);
- applyInPandasWithState shuffles once on the grouping key; state lives
  in the state store (RocksDB on a real cluster), not executor memory.
"""

from __future__ import annotations

from typing import Iterable

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from libcolumnfile_spark.tables import maybe_broadcast as _mb
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)


def with_event_time_watermark(df: DataFrame, ts_col: str = "ts", delay: str = "10 minutes") -> DataFrame:
    """Watermark wrapper; on a batch DataFrame this is a no-op marker."""
    if df.isStreaming:
        return df.withWatermark(ts_col, delay)
    return df


def tumbling_counts(
    df: DataFrame,
    ts_col: str = "ts",
    window: str = "1 hour",
    key_col: str = "event_type",
    delay: str = "10 minutes",
) -> DataFrame:
    """Tumbling-window count + sum(value) per key."""
    d = with_event_time_watermark(df, ts_col, delay)
    return (
        d.groupBy(F.window(ts_col, window).alias("w"), key_col)
        .agg(F.count(F.lit(1)).alias("n_events"), F.round(F.sum("value"), 2).alias("total_value"))
        .select(F.col("w.start").alias("window_start"), key_col, "n_events", "total_value")
    )


def sliding_counts(
    df: DataFrame,
    ts_col: str = "ts",
    window: str = "1 hour",
    slide: str = "30 minutes",
    key_col: str = "event_type",
    delay: str = "10 minutes",
) -> DataFrame:
    """Sliding-window counts: each event lands in window/slide windows."""
    d = with_event_time_watermark(df, ts_col, delay)
    return (
        d.groupBy(F.window(ts_col, window, slide).alias("w"), key_col)
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("w.start").alias("window_start"), key_col, "n_events")
    )


def session_counts(
    df: DataFrame,
    ts_col: str = "ts",
    gap: str = "10 minutes",
    key_col: str = "user_id",
    delay: str = "10 minutes",
) -> DataFrame:
    """Session windows: a session extends while events arrive within
    ``gap`` of the previous one (dynamic-length windows — state merges
    adjacent sessions as events arrive)."""
    d = with_event_time_watermark(df, ts_col, delay)
    return (
        d.groupBy(F.session_window(ts_col, gap).alias("w"), key_col)
        .agg(F.count(F.lit(1)).alias("n_events"), F.round(F.sum("value"), 2).alias("total_value"))
        .select(
            F.col("w.start").alias("session_start"),
            key_col,
            "n_events",
            "total_value",
        )
    )


def static_enrich_counts(events: DataFrame, dim: DataFrame) -> DataFrame:
    """Stream-static join + aggregation: enrich the event stream with a
    static dimension (broadcast — the dim re-reads per micro-batch but
    never shuffles the stream side), then count per segment.

    Stream-static inner joins are STATELESS: no watermark is required
    because the static side is complete at every micro-batch — contrast
    click_purchase_join, whose stream-stream state needs time bounds.
    On a batch frame the same function is a plain broadcast-hash join.
    """
    seg = dim.select(
        F.col("c_custkey").alias("user_id"),
        F.col("c_mktsegment").alias("segment"),
    )
    return (
        events.join(_mb(seg), "user_id")
        .groupBy("segment", "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(F.col("value").cast("decimal(18,2)")), 2)
            .cast("double")
            .alias("total_value"),
        )
    )


def dedup_within_watermark(
    df: DataFrame,
    keys: Iterable[str] = ("user_id", "event_type"),
    ts_col: str = "ts",
    delay: str = "10 minutes",
) -> DataFrame:
    """Streaming dedup with watermark-bounded state; exact dedup on a
    batch frame."""
    if df.isStreaming:
        return df.withWatermark(ts_col, delay).dropDuplicatesWithinWatermark(list(keys))
    return df.dropDuplicates(list(keys))


def fuzzy_dedup_within_watermark(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    ts_col: str = "ts",
    delay: str = "10 minutes",
    n_hashes: int = 4,
    shingle_n: int = 3,
    seed: int = 42,
) -> DataFrame:
    """Streaming NEAR-duplicate suppression: key each document by its
    row-local MinHash signature (md5 family, one band spanning the
    signature — operators.dedup.md5_minhash_sig_key) and keep the first
    arrival per key within the watermark window. Near-identical
    re-crawls and mirrored documents share a signature and collapse in
    flight; state is bounded by the watermark exactly like exact
    streaming dedup.

    Scale: the signature is a per-row projection (no shuffle before the
    dedup state store); state size is O(distinct signatures inside the
    watermark), the same bound dropDuplicatesWithinWatermark already
    manages. On a batch frame this degrades to exact groupBy semantics
    (first id per signature) — the oracle-checked face is
    streaming/queries.q_stream_dedup_fuzzy.
    """
    from pyspark.sql import functions as F

    from libcolumnfile_spark.operators.dedup import (
        md5_sig_key_kernel,
        minhash_tokens,
    )

    # tokens materialize in Catalyst (codegen split), then the Arrow
    # kernel computes md5 grams + affine minima batch-at-a-time — the
    # interpreted-HOF Catalyst form was the throughput floor (~2 ms/doc,
    # stream_probe 0.4k rows/s; kernel ~5x). Value-identical by pinned
    # test; q_stream_dedup_fuzzy's oracle checks it end to end.
    keyed = (
        df.withColumn("__toks", minhash_tokens(F.col(text_col)))
        .withColumn(
            "sig_key",
            md5_sig_key_kernel(n_hashes, shingle_n, seed)(
                F.col("__toks"), F.col(id_col).cast("string")
            ),
        )
        .drop("__toks")
    )
    if keyed.isStreaming:
        return keyed.withWatermark(ts_col, delay).dropDuplicatesWithinWatermark(
            ["sig_key"]
        )
    # batch face: dropDuplicates keeps an ARBITRARY row per key (plan-
    # order dependent) — pick the earliest id deterministically so the
    # batch face reproduces q_stream_dedup_fuzzy's min(doc_id) contract
    from pyspark.sql import Window

    w = Window.partitionBy("sig_key").orderBy(F.col(id_col).asc_nulls_last())
    return (
        keyed.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def click_purchase_join(df: DataFrame, within: str = "30 minutes", delay: str = "10 minutes") -> DataFrame:
    """Stream-stream inner join with a time bound: each click pairs with
    the same user's purchases within ``within`` after the click.

    On streaming frames both sides carry watermarks and the interval
    condition bounds the join state: a buffered click can be evicted once
    the purchase-side watermark passes click_ts + within (Spark derives
    the state-cleanup predicate from the time-bound condition — an
    UNBOUNDED stream-stream join would otherwise keep every row forever).
    On batch frames the same function is a plain interval join; the
    user_id equality carries the shuffle, the time bound is the residual.
    """
    clicks = with_event_time_watermark(
        df.filter(F.col("event_type") == "click").select(
            F.col("event_id").alias("click_id"),
            "user_id",
            F.col("ts").alias("click_ts"),
        ),
        "click_ts",
        delay,
    )
    purchases = with_event_time_watermark(
        df.filter(F.col("event_type") == "purchase").select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user_id"),
            F.col("ts").alias("purchase_ts"),
            "value",
        ),
        "purchase_ts",
        delay,
    )
    return clicks.join(
        purchases,
        (F.col("user_id") == F.col("p_user_id"))
        & (F.col("purchase_ts") >= F.col("click_ts"))
        & (F.col("purchase_ts") <= F.col("click_ts") + F.expr(f"INTERVAL {within}")),
        "inner",
    ).select("click_id", "user_id", "purchase_id", "value")


RUNNING_TOTALS_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
        StructField("last_ts", TimestampType()),
    ]
)

_STATE_SCHEMA = StructType(
    [
        StructField("n", LongType()),
        StructField("total", DoubleType()),
    ]
)


def running_totals_stateful(df: DataFrame, timeout_ms: int | None = None) -> DataFrame:
    """Custom stateful operator via applyInPandasWithState: per-user
    running event count + value total that survives across micro-batches
    (the canonical arbitrary-state pattern; the reference has no
    streaming state at all).
    """

    def update(key, pdfs, state: GroupState):
        n, total = state.get if state.exists else (0, 0.0)
        last_ts = None
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
            mx = pdf["ts"].max()
            last_ts = mx if last_ts is None else max(last_ts, mx)
        state.update((n, total))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "total_value": [round(total, 2)],
                "last_ts": [last_ts],
            }
        )

    return (
        df.groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType=RUNNING_TOTALS_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def upsert_stream(
    stream_df,
    target_dir: str,
    checkpoint_dir: str,
    key_col: str = "doc_id",
    ord_col: str | None = None,
):
    """Streaming keyed upsert: each micro-batch MERGEs into a parquet
    target (updates replace matching keys, new keys append) — the
    foreachBatch form of operators/pipeline.py::q_upsert_merge.

    Within a batch, the winner per key is the row with the greatest
    ``ord_col`` (ties broken arbitrarily) when one is given; without an
    ordering column, WHICH duplicate survives is arbitrary —
    dropDuplicates keeps an unspecified row per key, and no sort can
    change that (pass ord_col for deterministic last-write-wins). The
    merge is the rewrite pattern: batch UNION (target ANTI-JOIN batch),
    written to a fresh directory then swapped in via rename-away /
    rename-in (a crash between the two renames leaves a recoverable
    ``.__bak``; the next retry restores it) — on a real deployment the
    swap is a table-format transaction (Delta/Iceberg commit) and the
    anti-join co-partitions with a bucketed target; exactly-once comes
    from the checkpoint (foreachBatch may retry a batch, and the merge
    is idempotent per key, so retries converge).
    """
    import os
    import shutil

    from pyspark.sql import Window

    bak_dir = f"{target_dir}.__bak"

    def merge_batch(batch_df, batch_id: int):
        spark = batch_df.sparkSession
        if ord_col is not None:
            w = Window.partitionBy(key_col).orderBy(F.col(ord_col).desc())
            batch_df = (
                batch_df.withColumn("__rn", F.row_number().over(w))
                .filter(F.col("__rn") == 1)
                .drop("__rn")
            )
        else:
            batch_df = batch_df.dropDuplicates([key_col])
        # crash recovery: a previous attempt may have renamed the target
        # away (to .__bak) and died before renaming the new one in
        read_dir = target_dir if os.path.isdir(target_dir) else bak_dir
        if os.path.isdir(read_dir) and any(
            f.endswith(".parquet") for f in os.listdir(read_dir)
        ):
            target = spark.read.parquet(read_dir)
            merged = batch_df.unionByName(
                target.join(batch_df.select(key_col), key_col, "left_anti")
            )
        else:
            merged = batch_df
        tmp = f"{target_dir}.__stage_{batch_id}"
        merged.write.mode("overwrite").parquet(tmp)
        # swap via rename, never rmtree-then-rename: the prior state stays
        # recoverable at every instant of the swap
        if os.path.isdir(target_dir):
            if os.path.isdir(bak_dir):
                shutil.rmtree(bak_dir)
            os.replace(target_dir, bak_dir)
        os.replace(tmp, target_dir)
        if os.path.isdir(bak_dir):
            shutil.rmtree(bak_dir)

    return (
        stream_df.writeStream.foreachBatch(merge_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
    )


def windowed_topk(
    df: DataFrame,
    ts_col: str = "ts",
    window: str = "1 hour",
    key_col: str = "event_type",
    k: int = 3,
    delay: str = "10 minutes",
) -> DataFrame:
    """Per-tumbling-window top-k keys by count (ties by key) — the
    trending-now monitor. On a stream, the windowed aggregate runs
    incrementally under the watermark and the RANK step applies at the
    sink (complete/foreachBatch — ranking over an aggregate isn't
    append-mode-expressible by definition, because a late row can
    reorder the board); on a batch frame the two steps fuse into one
    plan. The rank window partitions by window start — parallelism is
    window-count, operating on the already-aggregated (window x key)
    table, never the raw stream.
    """
    from pyspark.sql.window import Window

    d = with_event_time_watermark(df, ts_col, delay)
    agg = (
        d.groupBy(F.window(ts_col, window).alias("w"), key_col)
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("w.start").alias("window_start"), key_col, "n_events")
    )
    if agg.isStreaming:
        return agg  # rank applies at the sink (see docstring)
    w = Window.partitionBy("window_start").orderBy(
        F.col("n_events").desc(), F.col(key_col).asc()
    )
    return (
        agg.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
    )
