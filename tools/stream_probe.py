"""Structured-Streaming throughput probe: drive the streaming pipelines
over the sf0.1 events/documents fixtures in micro-batches (one file per
trigger) and report rows/second end-to-end.

Complements tests/test_streaming.py (which pins batch-equivalence and
recovery): this measures the thing a stream operator is FOR — sustained
throughput through the state store. Usage:

    python tools/stream_probe.py [sf_dir] [n_batches]

Writes one JSON line per pipeline: {"pipeline", "rows", "batches",
"wall_s", "rows_per_s"}.
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from libcolumnfile_spark.session import get_spark
from libcolumnfile_spark.streaming import pipelines as P
from libcolumnfile_spark.tables import load_table

EVENTS_DDL = (
    "event_id bigint, ts timestamp, user_id bigint, event_type string, "
    "value double, props string"
)
DOCS_DDL = "doc_id bigint, text string, lang string, source string, n_chars bigint"


def _sliced_source(df, path: str, n: int) -> int:
    """Write df as n files so maxFilesPerTrigger=1 yields n micro-batches."""
    df.repartition(n).write.mode("overwrite").parquet(path)
    return df.count()


def _drain(stream_df, ckpt: str) -> None:
    sq = (
        stream_df.writeStream.outputMode("append")
        .format("noop")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    sq.awaitTermination(600)


def _drain_complete(stream_df, ckpt: str) -> None:
    sq = (
        stream_df.writeStream.outputMode("update")
        .format("noop")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    sq.awaitTermination(600)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n_batches = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    spark = get_spark("stream-probe")
    spark.sparkContext.setLogLevel("ERROR")
    work = tempfile.mkdtemp(prefix="streamprobe-")

    events = load_table(spark, sf_dir, "events")
    docs = load_table(spark, sf_dir, "documents")
    ev_src = f"{work}/events_src"
    doc_src = f"{work}/docs_src"
    n_events = _sliced_source(
        events.select("event_id", "ts", "user_id", "event_type", "value", "props"),
        ev_src,
        n_batches,
    )
    n_docs = _sliced_source(
        docs.select("doc_id", "text", "lang", "source", "n_chars"), doc_src, n_batches
    )

    def ev_stream():
        return (
            spark.readStream.schema(EVENTS_DDL)
            .option("maxFilesPerTrigger", 1)
            .parquet(ev_src)
        )

    def doc_stream():
        s = (
            spark.readStream.schema(DOCS_DDL)
            .option("maxFilesPerTrigger", 1)
            .parquet(doc_src)
        )
        # fuzzy dedup needs an event-time column for the watermark
        return s.withColumn(
            "ts", F.timestamp_seconds(F.col("doc_id") % 3600 + 1_700_000_000)
        )

    # fuzzy dedup gets a second, x10-corpus run: at sf0.1's 312-doc
    # micro-batches, the per-batch scheduling floor (~0.6 s — measured
    # on exact dedup, whose map work is trivial) bounds ANY signature
    # kernel to ~550 rows/s. 3,125-doc batches amortize the floor and
    # expose the actual per-row cost the kernel sets (each micro-batch
    # is ONE file = one map task, so the signature runs single-core —
    # the worst case; production batches span many files/partitions).
    from tools.scale_probe import ensure_scaled

    docs10 = load_table(spark, ensure_scaled(spark, 10), "documents")
    doc10_src = f"{work}/docs10_src"
    n_docs10 = _sliced_source(
        docs10.select("doc_id", "text", "lang", "source", "n_chars"),
        doc10_src,
        n_batches,
    )

    def doc10_stream():
        s = (
            spark.readStream.schema(DOCS_DDL)
            .option("maxFilesPerTrigger", 1)
            .parquet(doc10_src)
        )
        return s.withColumn(
            "ts", F.timestamp_seconds(F.col("doc_id") % 3600 + 1_700_000_000)
        )

    probes = [
        ("tumbling_counts", n_events, lambda: _drain_complete(
            P.tumbling_counts(ev_stream()), f"{work}/ck_tumbling")),
        ("dedup_within_watermark", n_events, lambda: _drain(
            P.dedup_within_watermark(ev_stream()), f"{work}/ck_d")),
        ("fuzzy_dedup_within_watermark", n_docs, lambda: _drain(
            P.fuzzy_dedup_within_watermark(doc_stream()), f"{work}/ck_f")),
        ("fuzzy_dedup_within_watermark_x10", n_docs10, lambda: _drain(
            P.fuzzy_dedup_within_watermark(doc10_stream()), f"{work}/ck_f10")),
        ("stateful_running_totals", n_events, lambda: _drain_complete(
            P.running_totals_stateful(ev_stream()), f"{work}/ck_s")),
    ]
    try:
        for name, rows, run in probes:
            t0 = time.perf_counter()
            run()
            wall = time.perf_counter() - t0
            print(json.dumps({
                "pipeline": name, "rows": rows, "batches": n_batches,
                "wall_s": round(wall, 2), "rows_per_s": int(rows / wall),
            }))
    finally:
        # two full table copies + checkpoints: never leak them on error
        shutil.rmtree(work, ignore_errors=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
