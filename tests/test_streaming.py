"""Genuinely-streaming tests: micro-batches, checkpoints, incremental
offset discovery, watermark dedup, and custom state — the behaviors the
batch oracle can't check.

All queries run with trigger(availableNow=True) so they process what
exists and stop; incremental behavior is tested by running the SAME
checkpointed query again after appending input.
"""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from libcolumnfile_spark.sources.columnfile import register
from libcolumnfile_spark.streaming import pipelines as P

SF = "/root/testdata/sf0.001"

EVENTS_DDL = (
    "event_id bigint, ts timestamp, user_id bigint, event_type string, "
    "value double, props string"
)


@pytest.fixture(scope="module")
def events(spark):
    from libcolumnfile_spark.tables import load_table

    return load_table(spark, SF, "events").cache()


def _run_stream(sq):
    sq.awaitTermination(120)


def _write_parquet_source(events, path, parts=2):
    n = events.count()
    half = n // parts
    slices = []
    for i in range(parts):
        lo, hi = i * half, (i + 1) * half if i < parts - 1 else n
        slices.append(
            events.filter((F.col("event_id") >= lo) & (F.col("event_id") < hi))
        )
    return slices


def test_tumbling_stream_equals_batch(spark, events, tmp_path):
    src = str(tmp_path / "src")
    events.write.parquet(src)
    stream = spark.readStream.schema(EVENTS_DDL).parquet(src)
    out = P.tumbling_counts(stream)
    sq = (
        out.writeStream.format("memory")
        .queryName("tumbling_t")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    _run_stream(sq)
    got = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["total_value"])
        for r in spark.sql("SELECT * FROM tumbling_t").collect()
    }
    want = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["total_value"])
        for r in P.tumbling_counts(events).collect()
    }
    assert got == want


def test_sliding_stream_equals_batch(spark, events, tmp_path):
    src = str(tmp_path / "src")
    events.write.parquet(src)
    stream = spark.readStream.schema(EVENTS_DDL).parquet(src)
    sq = (
        P.sliding_counts(stream)
        .writeStream.format("memory")
        .queryName("sliding_t")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    _run_stream(sq)
    got = {
        (r["window_start"], r["event_type"]): r["n_events"]
        for r in spark.sql("SELECT * FROM sliding_t").collect()
    }
    want = {
        (r["window_start"], r["event_type"]): r["n_events"]
        for r in P.sliding_counts(events).collect()
    }
    assert got == want


def test_session_stream_equals_batch(spark, events, tmp_path):
    src = str(tmp_path / "src")
    events.write.parquet(src)
    stream = spark.readStream.schema(EVENTS_DDL).parquet(src)
    sq = (
        P.session_counts(stream)
        .writeStream.format("memory")
        .queryName("session_t")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    _run_stream(sq)
    got = {
        (r["session_start"], r["user_id"]): r["n_events"]
        for r in spark.sql("SELECT * FROM session_t").collect()
    }
    want = {
        (r["session_start"], r["user_id"]): r["n_events"]
        for r in P.session_counts(events).collect()
    }
    assert got == want


def test_stream_stream_join_equals_batch(spark, events, tmp_path):
    """Watermarked stream-stream interval join (clicks x purchases) over
    micro-batches produces exactly the batch join's pairs."""
    src = str(tmp_path / "src")
    events.write.parquet(src)
    stream = spark.readStream.schema(EVENTS_DDL).parquet(src)
    sq = (
        P.click_purchase_join(stream)
        .writeStream.format("memory")
        .queryName("ssjoin_t")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    _run_stream(sq)
    got = {
        (r["click_id"], r["purchase_id"])
        for r in spark.sql("SELECT * FROM ssjoin_t").collect()
    }
    want = {
        (r["click_id"], r["purchase_id"])
        for r in P.click_purchase_join(events).collect()
    }
    assert got == want
    assert len(want) > 0


def test_incremental_file_discovery(spark, events, tmp_path):
    """Second availableNow run on the same checkpoint must process ONLY
    the newly-appended files (no reprocessing, no loss)."""
    src = str(tmp_path / "src")
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    first, second = _write_parquet_source(events, src + "_stage", parts=2)
    os.makedirs(src, exist_ok=True)
    first.write.mode("append").parquet(src)

    def run_once():
        stream = spark.readStream.schema(EVENTS_DDL).parquet(src)
        sq = (
            stream.select("event_id", "user_id", "value")
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        _run_stream(sq)

    run_once()
    n1 = spark.read.parquet(sink).count()
    assert n1 == first.count()

    second.write.mode("append").parquet(src)
    run_once()
    out = spark.read.parquet(sink)
    assert out.count() == events.count()
    # exactly-once: no event_id appears twice
    assert out.select("event_id").distinct().count() == events.count()


def test_columnfile_stream_source_incremental(spark, events, tmp_path):
    """Streaming read of a columnfile directory: newly appended part
    files are discovered as new offsets (reference O23: appendable
    self-contained segments)."""
    register(spark)
    src = str(tmp_path / "colsrc")
    sink = str(tmp_path / "colsink")
    ckpt = str(tmp_path / "colckpt")
    first, second = _write_parquet_source(events, src + "_stage", parts=2)
    first.write.format("columnfile").mode("overwrite").save(src)

    def run_once():
        stream = spark.readStream.format("columnfile").schema(EVENTS_DDL).load(src)
        sq = (
            stream.select("event_id", "user_id", "value")
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        _run_stream(sq)

    run_once()
    assert spark.read.parquet(sink).count() == first.count()

    second.write.format("columnfile").mode("append").save(src)
    run_once()
    out = spark.read.parquet(sink)
    assert out.count() == events.count()
    assert out.select("event_id").distinct().count() == events.count()


def test_columnfile_stream_sink(spark, events, tmp_path):
    """writeStream into the columnfile format; batch read returns
    exactly the streamed rows."""
    register(spark)
    src = str(tmp_path / "src")
    out_dir = str(tmp_path / "colout")
    ckpt = str(tmp_path / "ckpt")
    events.write.parquet(src)
    stream = spark.readStream.schema(EVENTS_DDL).parquet(src)
    sq = (
        stream.select("event_id", "user_id", "event_type", "value")
        .writeStream.format("columnfile")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    _run_stream(sq)
    back = spark.read.format("columnfile").load(out_dir)
    assert back.count() == events.count()
    assert back.select("event_id").distinct().count() == events.count()


def test_dedup_within_watermark(spark, tmp_path):
    """Duplicate (user_id, event_type) rows arriving within the
    watermark window must be emitted once."""
    src = str(tmp_path / "src")
    rows = [
        (1, "2024-01-01 00:00:01", 10, "click", 1.0, "{}"),
        (2, "2024-01-01 00:00:02", 10, "click", 2.0, "{}"),  # dup key
        (3, "2024-01-01 00:00:03", 10, "view", 3.0, "{}"),
        (4, "2024-01-01 00:00:04", 11, "click", 4.0, "{}"),
        (5, "2024-01-01 00:00:05", 11, "click", 5.0, "{}"),  # dup key
    ]
    df = spark.createDataFrame(rows, EVENTS_DDL.replace("ts timestamp", "ts string"))
    df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    df.write.parquet(src)
    stream = spark.readStream.schema(EVENTS_DDL).parquet(src)
    sq = (
        P.dedup_within_watermark(stream)
        .writeStream.format("memory")
        .queryName("dedup_t")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    _run_stream(sq)
    got = spark.sql("SELECT user_id, event_type FROM dedup_t").collect()
    keys = [(r["user_id"], r["event_type"]) for r in got]
    assert sorted(keys) == [(10, "click"), (10, "view"), (11, "click")]


def test_stateful_running_totals(spark, events, tmp_path):
    """applyInPandasWithState keeps per-user state across micro-batches:
    with maxFilesPerTrigger=1 the two source files process as two
    micro-batches in one run; the final update per user must equal the
    batch totals over ALL data (i.e. state carried across batches)."""
    src = str(tmp_path / "src")
    first, second = _write_parquet_source(events, src + "_stage", parts=2)
    os.makedirs(src, exist_ok=True)
    first.coalesce(1).write.mode("append").parquet(src)
    second.coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema(EVENTS_DDL)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    sq = (
        P.running_totals_stateful(stream)
        .writeStream.format("memory")
        .queryName("state_t")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    _run_stream(sq)

    # update mode appends one row per (user, micro-batch); the row with
    # the highest n_events is the final running total
    rows = spark.sql("SELECT * FROM state_t").collect()
    assert len(rows) > events.select("user_id").distinct().count()  # >1 batch
    final = {}
    for r in rows:
        cur = final.get(r["user_id"])
        if cur is None or r["n_events"] > cur[0]:
            final[r["user_id"]] = (r["n_events"], r["total_value"])
    want = {
        r["user_id"]: (r["n"], r["tv"])
        for r in events.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("tv"),
        )
        .collect()
    }
    assert final == want


def test_stream_static_join(spark, events, tmp_path):
    """Stream-static broadcast join (ADVICE r1): events streamed via
    availableNow joined to the static customer dim must equal the batch
    result of the same static_enrich_counts transform."""
    from libcolumnfile_spark.tables import load_table

    customer = load_table(spark, SF, "customer")
    src = str(tmp_path / "src")
    events.write.parquet(src)
    stream = spark.readStream.schema(EVENTS_DDL).parquet(src)
    sq = (
        P.static_enrich_counts(stream, customer)
        .writeStream.format("memory")
        .queryName("static_join_t")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    _run_stream(sq)
    got = {
        (r["segment"], r["event_type"]): (r["n_events"], r["total_value"])
        for r in spark.sql("SELECT * FROM static_join_t").collect()
    }
    want = {
        (r["segment"], r["event_type"]): (r["n_events"], r["total_value"])
        for r in P.static_enrich_counts(events, customer).collect()
    }
    assert got == want


def test_watermark_drops_late_data(spark, tmp_path):
    """An event arriving far behind the watermark must be dropped from a
    watermarked windowed aggregation (watermark-bounded state is the
    unbounded-stream contract), while an on-time event in the same
    micro-batch still lands. Uses append mode: a closed window emits
    once and can never be re-emitted or updated by late data."""
    import datetime as dt

    src = str(tmp_path / "src")
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    base = dt.datetime(2026, 1, 1, 10, 0, 0)

    def mk(rows):
        return spark.createDataFrame(
            [
                (i, base + dt.timedelta(minutes=m), 1, "click", 1.0, None)
                for i, m in rows
            ],
            EVENTS_DDL,
        )

    os.makedirs(src, exist_ok=True)
    # run 1: events at 10:00, 10:30, 12:30 -> watermark ends at 12:20,
    # closing window [10,11) with 2 events; [12,13) stays open in state
    mk([(0, 0), (1, 30), (2, 150)]).write.mode("append").parquet(src)

    def run_once():
        stream = spark.readStream.schema(EVENTS_DDL).parquet(src)
        sq = (
            P.tumbling_counts(stream)
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        _run_stream(sq)

    run_once()
    # run 2: a LATE event at 10:40 (behind the restored 12:20 watermark
    # -> dropped) plus an on-time event at 13:30 (advances the watermark
    # to 13:20, closing [12,13) with exactly the one 12:30 event)
    mk([(3, 40), (4, 210)]).write.mode("append").parquet(src)
    run_once()

    got = {
        r["window_start"]: r["n_events"]
        for r in spark.read.parquet(sink).collect()
    }
    assert got[base] == 2  # [10,11): late 10:40 event did NOT make it 3
    assert got[base + dt.timedelta(hours=2)] == 1  # [12,13): on-time only
    # no duplicate emission of any window
    rows = spark.read.parquet(sink).count()
    assert rows == len(got)


def test_streaming_upsert_merges_incrementally(spark, tmp_path):
    """Two micro-batch rounds of keyed updates must leave the target
    exactly at sequential-merge state: round 2 overwrites round 1's
    values for shared keys, appends new keys, keeps untouched rows."""
    src = str(tmp_path / "updates_in")
    target = str(tmp_path / "target")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)

    def write_updates(rows, name):
        spark.createDataFrame(rows, "doc_id bigint, n_chars bigint").coalesce(1)\
            .write.mode("overwrite").parquet(f"{src}/{name}")

    # round 1: keys 1..3
    spark.createDataFrame(
        [(1, 10), (2, 20), (3, 30)], "doc_id bigint, n_chars bigint"
    ).coalesce(1).write.parquet(f"{src}/b1")
    stream = spark.readStream.schema("doc_id bigint, n_chars bigint").parquet(f"{src}/*")
    _run_stream(P.upsert_stream(stream, target, ckpt).start())
    state1 = {r["doc_id"]: r["n_chars"] for r in spark.read.parquet(target).collect()}
    assert state1 == {1: 10, 2: 20, 3: 30}

    # round 2: update key 2, insert key 4 — same checkpoint, only the new
    # file is processed
    spark.createDataFrame(
        [(2, 99), (4, 40)], "doc_id bigint, n_chars bigint"
    ).coalesce(1).write.parquet(f"{src}/b2")
    stream = spark.readStream.schema("doc_id bigint, n_chars bigint").parquet(f"{src}/*")
    _run_stream(P.upsert_stream(stream, target, ckpt).start())
    state2 = {r["doc_id"]: r["n_chars"] for r in spark.read.parquet(target).collect()}
    assert state2 == {1: 10, 2: 99, 3: 30, 4: 40}


def test_streaming_upsert_ord_col_deterministic_winner(spark, tmp_path):
    """A batch with duplicate keys must resolve last-write-wins by the
    explicit ordering column — the greatest ord_col row survives, on
    every run (pipelines.py upsert_stream ord_col path)."""
    src = str(tmp_path / "updates_in")
    target = str(tmp_path / "target")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)
    spark.createDataFrame(
        [(1, 10, 1), (1, 77, 9), (1, 33, 5), (2, 20, 1)],
        "doc_id bigint, n_chars bigint, ver bigint",
    ).repartition(4).write.parquet(f"{src}/b1")
    stream = spark.readStream.schema(
        "doc_id bigint, n_chars bigint, ver bigint"
    ).parquet(f"{src}/*")
    _run_stream(P.upsert_stream(stream, target, ckpt, ord_col="ver").start())
    state = {r["doc_id"]: r["n_chars"] for r in spark.read.parquet(target).collect()}
    assert state == {1: 77, 2: 20}


def test_streaming_upsert_recovers_from_crash_window(spark, tmp_path):
    """If a crash hit between rename-away and rename-in (target gone,
    .__bak present), the next batch must still merge against the prior
    state instead of silently dropping it."""
    src = str(tmp_path / "updates_in")
    target = str(tmp_path / "target")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)
    spark.createDataFrame(
        [(1, 10), (2, 20)], "doc_id bigint, n_chars bigint"
    ).coalesce(1).write.parquet(f"{src}/b1")
    stream = spark.readStream.schema("doc_id bigint, n_chars bigint").parquet(f"{src}/*")
    _run_stream(P.upsert_stream(stream, target, ckpt).start())
    # simulate the crash window: target renamed away, new dir never arrived
    os.replace(target, f"{target}.__bak")
    spark.createDataFrame(
        [(2, 99), (3, 30)], "doc_id bigint, n_chars bigint"
    ).coalesce(1).write.parquet(f"{src}/b2")
    stream = spark.readStream.schema("doc_id bigint, n_chars bigint").parquet(f"{src}/*")
    _run_stream(P.upsert_stream(stream, target, ckpt).start())
    state = {r["doc_id"]: r["n_chars"] for r in spark.read.parquet(target).collect()}
    assert state == {1: 10, 2: 99, 3: 30}
    assert not os.path.isdir(f"{target}.__bak")


def test_fuzzy_dedup_within_watermark(spark, tmp_path):
    """Near-identical documents arriving within the watermark collapse
    to the first arrival; distinct and too-short-to-shingle documents
    pass through. Survivor set must equal the batch face's winners."""
    src = str(tmp_path / "docs_src")
    base = "the quick brown fox jumps over the lazy dog tonight"
    rows = [
        (1, "2024-01-01 00:00:01", base),
        (2, "2024-01-01 00:00:02", base),          # exact dup of 1
        (3, "2024-01-01 00:00:03", base.upper()),  # case-normalized dup of 1
        (4, "2024-01-01 00:00:04", "completely different content about spark engines here"),
        (5, "2024-01-01 00:00:05", "too short"),   # < shingle_n tokens: passes
        (6, "2024-01-01 00:00:06", "too short"),   # same text but per-doc short key: passes
    ]
    # one file per row + maxFilesPerTrigger=1: each row is its own
    # micro-batch, so "first arrival" is real (within a single
    # micro-batch dropDuplicates keeps an arbitrary row by design)
    os.makedirs(src, exist_ok=True)
    for row in rows:
        spark.createDataFrame([row], "doc_id bigint, ts string, text string").withColumn(
            "ts", F.col("ts").cast("timestamp")
        ).coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema("doc_id bigint, ts timestamp, text string")
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    sq = (
        P.fuzzy_dedup_within_watermark(stream)
        .writeStream.format("memory")
        .queryName("fuzzy_dedup_t")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    _run_stream(sq)
    got = sorted(r["doc_id"] for r in spark.sql("SELECT doc_id FROM fuzzy_dedup_t").collect())
    assert got == [1, 4, 5, 6]

    # batch face agrees on the signature PARTITIONING (dropDuplicates
    # picks an arbitrary row per key on batch frames; the deterministic
    # min-id winner is the oracle-checked q_stream_dedup_fuzzy)
    batch = P.fuzzy_dedup_within_watermark(spark.read.parquet(src))
    assert batch.count() == 4


def test_sig_key_kernel_equals_catalyst_expression(spark):
    """The Arrow md5-signature kernel must produce the EXACT string the
    Catalyst expression produces, row by row — including short docs,
    null ids, null text, empty text, and unicode — so swapping it into
    the streaming pipeline cannot move the oracle."""
    from libcolumnfile_spark.operators.dedup import (
        md5_minhash_sig_key_from_tokens,
        md5_sig_key_kernel,
        minhash_tokens,
    )

    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumps over the lazy dog"),
        (3, "THE QUICK brown fox jumps over a sleepy dog"),
        (4, "short doc"),
        (None, "short doc"),
        (None, "other short"),
        (5, None),
        (None, None),
        (6, ""),
        (7, "  padded   whitespace   tokens here now  "),
        (8, "unicodé tokëns ünd ëdge cäses éèê mixed in"),
        (9, "a b c d e f g h i j k l m n o p q r s t u v w x y z"),
    ]
    # coalesce(1): null and non-null short-doc ids MUST share one Arrow
    # batch — int64-with-null batches convert to pandas float64, the
    # exact divergence class the string-cast contract guards against
    df = (
        spark.createDataFrame(rows, "doc_id bigint, text string")
        .coalesce(1)
        .withColumn("__toks", minhash_tokens(F.col("text")))
    )
    both = df.select(
        "doc_id",
        md5_minhash_sig_key_from_tokens(F.col("__toks"), F.col("doc_id")).alias(
            "cat"
        ),
        md5_sig_key_kernel()(
            F.col("__toks"), F.col("doc_id").cast("string")
        ).alias("ker"),
    ).collect()
    for r in both:
        assert r["ker"] == r["cat"], (r["doc_id"], r["ker"], r["cat"])
    # and over the real fixture, every row agrees
    d = spark.read.parquet("/root/testdata/sf0.01/documents.parquet").withColumn(
        "__toks", minhash_tokens(F.col("text"))
    )
    diff = (
        d.select(
            md5_minhash_sig_key_from_tokens(
                F.col("__toks"), F.col("doc_id")
            ).alias("cat"),
            md5_sig_key_kernel()(
                F.col("__toks"), F.col("doc_id").cast("string")
            ).alias("ker"),
        )
        .filter(~F.col("cat").eqNullSafe(F.col("ker")))
        .count()
    )
    assert diff == 0


def test_fuzzy_dedup_null_id_short_docs_never_merge_distinct_text(spark):
    """Short docs with NULL ids must not all collapse into one NULL
    sig_key survivor: distinct texts pass through; identical texts (a
    genuine duplicate) still merge — keyed by a content hash, not NULL."""
    rows = [
        (None, "2024-01-01 00:00:01", "alpha beta"),
        (None, "2024-01-01 00:00:02", "gamma delta"),
        (None, "2024-01-01 00:00:03", "alpha beta"),  # identical -> merges
        (None, "2024-01-01 00:00:04", None),          # null text too
        (None, "2024-01-01 00:00:05", None),
    ]
    df = spark.createDataFrame(
        rows, "doc_id bigint, ts string, text string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = P.fuzzy_dedup_within_watermark(df)
    # alpha-beta (x2 -> 1) + gamma-delta (1) + null-text (x2 -> 1) = 3
    assert out.count() == 3
    texts = sorted(r["text"] or "" for r in out.collect())
    assert texts == ["", "alpha beta", "gamma delta"]


def test_columnfile_tailed_segments_watermark_equals_batch(spark, tmp_path):
    """The reference's O23 tail-able-segment semantics under REAL
    lateness: out-of-order micro-batches arrive as segments appended to
    ONE growing .col file (writer flush per segment = the reference's
    per-segment pubsync, columnfile-writer.cc:84), and a watermarked
    tumbling aggregation replays from the same checkpoint after each
    append. Contract: (a) a late event that is behind the watermark but
    whose WINDOW is still open must be COUNTED — lateness inside the
    state-retention bound is correctness, not best effort; (b) every
    window the stream emits equals the batch aggregate of the same
    file's rows; (c) each closed window emits exactly once."""
    import datetime as dt

    register(spark)
    from pyspark.sql.types import _parse_datatype_string

    from libcolumnfile_spark.sources.columnfile.format import ColumnFileWriter
    from libcolumnfile_spark.sources.columnfile.typed import encoder_for

    schema = _parse_datatype_string(EVENTS_DDL)
    encs = [encoder_for(f.dataType) for f in schema.fields]
    path = str(tmp_path / "grow.col")
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    base = dt.datetime(2026, 1, 1, 10, 0, 0)

    w = ColumnFileWriter(path, compression="lz4")

    def append_segment(rows):  # rows: [(event_id, minutes-after-base)]
        for eid, m in rows:
            vals = (
                eid,
                base + dt.timedelta(minutes=m),
                eid % 3,
                "click",
                eid * 0.5,
                None,
            )
            for c, v in enumerate(vals):
                if v is None:
                    w.put_null(c)
                else:
                    w.put(c, encs[c](v))
            w.add_rows(1)
        assert w.flush() is not None  # one complete on-disk segment

    def run_once():
        stream = (
            spark.readStream.format("columnfile").schema(EVENTS_DDL).load(path)
        )
        sq = (
            P.tumbling_counts(stream)
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        _run_stream(sq)

    # segment 1: 10:05, 10:20, 11:05 -> end-of-run watermark 10:55;
    # window [10,11) stays OPEN (10:55 < 11:00), nothing emits yet
    append_segment([(0, 5), (1, 20), (2, 65)])
    run_once()
    # segment 2, out of order: 10:40 is BEHIND the restored 10:55
    # watermark but its window is still open -> must be aggregated;
    # 11:45 advances the watermark to 11:35, closing [10,11) with THREE
    # events (the late one included)
    append_segment([(3, 40), (4, 105)])
    run_once()
    # segment 3: 12:30 -> end-of-run watermark 12:20; emission of a
    # closed window happens in the batch AFTER the one that advanced
    # the watermark (the restored-watermark replay path), so...
    append_segment([(5, 150)])
    run_once()
    # ...segment 4's run replays with the restored 12:20 watermark and
    # closes [11,12) (2 events); [12,13) and [13,14) stay open in state
    append_segment([(6, 210)])
    run_once()
    w.finalize()

    got = sorted(
        spark.read.parquet(sink).collect(), key=lambda r: r["window_start"]
    )
    # (c) exactly-once per window, (a) the late 10:40 event counted
    assert [r["n_events"] for r in got] == [3, 2]
    # (b) emitted windows equal the batch aggregate of the same file
    batch = {
        r["window_start"]: r
        for r in P.tumbling_counts(
            spark.read.format("columnfile").schema(EVENTS_DDL).load(path)
        ).collect()
    }
    for r in got:
        b = batch[r["window_start"]]
        assert (r["n_events"], r["total_value"]) == (
            b["n_events"],
            b["total_value"],
        ), r["window_start"]


def test_columnfile_stream_torn_tail_failure_injection(spark, tmp_path):
    """O23 failure injection (round-9 VERDICT item 6): a writer crash /
    in-flight append leaves a PARTIAL segment (cut mid-blob) at the tail
    of a tailed file. Contract: (a) the stream neither crashes nor emits
    any row from the torn tail — offsets stop at the end of the last
    COMPLETE segment; (b) once the segment is completed, the next run
    delivers exactly the new rows (exactly-once overall); (c)
    scan_segments keeps strict batch semantics (raises) while the
    partial_ok streaming mode returns the complete prefix."""
    import datetime as dt

    import pytest as _pytest

    register(spark)
    from pyspark.sql.types import _parse_datatype_string

    from libcolumnfile_spark.sources.columnfile.format import (
        ColumnFileFormatError,
        ColumnFileWriter,
        scan_segments,
    )
    from libcolumnfile_spark.sources.columnfile.typed import encoder_for

    schema = _parse_datatype_string(EVENTS_DDL)
    encs = [encoder_for(f.dataType) for f in schema.fields]
    base = dt.datetime(2026, 1, 1, 10, 0, 0)

    def write_file(path, ids):
        w = ColumnFileWriter(path, compression="lz4")
        for eid in ids:
            vals = (eid, base + dt.timedelta(minutes=eid), eid % 3, "click",
                    eid * 0.5, None)
            for c, v in enumerate(vals):
                if v is None:
                    w.put_null(c)
                else:
                    w.put(c, encs[c](v))
            w.add_rows(1)
        assert w.flush() is not None
        w.finalize()

    grow = str(tmp_path / "grow.col")
    donor = str(tmp_path / "donor.col")
    write_file(grow, [0, 1, 2])
    write_file(donor, [3, 4, 5])
    with open(donor, "rb") as f:
        donor_seg = f.read()[4:]  # strip magic: one complete segment
    assert len(donor_seg) > 20

    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")

    def run_once():
        stream = (
            spark.readStream.format("columnfile").schema(EVENTS_DDL).load(grow)
        )
        sq = (
            stream.select("event_id", "user_id", "value")
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        _run_stream(sq)

    run_once()
    assert spark.read.parquet(sink).count() == 3

    # inject the torn tail: all but the last 10 bytes of the donor
    # segment (cut lands mid-blob — the header is tens of bytes in)
    with open(grow, "ab") as f:
        f.write(donor_seg[:-10])

    # (c) strict batch scan raises on the torn tail; streaming-mode scan
    # returns exactly the one complete segment
    with _pytest.raises(ColumnFileFormatError):
        scan_segments(grow)
    segs = scan_segments(grow, partial_ok=True)
    assert len(segs) == 1

    # (a) the stream survives and emits nothing from the torn tail
    run_once()
    out = spark.read.parquet(sink)
    assert out.count() == 3
    assert sorted(r["event_id"] for r in out.collect()) == [0, 1, 2]

    # complete the segment: append the missing 10 bytes
    with open(grow, "ab") as f:
        f.write(donor_seg[-10:])
    assert len(scan_segments(grow)) == 2  # strict scan happy again

    # (b) exactly-once delivery of exactly the completed segment's rows
    run_once()
    out = spark.read.parquet(sink)
    assert sorted(r["event_id"] for r in out.collect()) == [0, 1, 2, 3, 4, 5]


def test_windowed_topk_stream_sink_rank_equals_batch(spark, events, tmp_path):
    """windowed_topk on a real stream: the tumbling aggregate runs
    incrementally (complete mode — a rank over an aggregate is not
    append-expressible), the rank applies at the sink exactly as the
    transform's docstring prescribes, and the ranked board equals the
    fused batch plan."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    src = str(tmp_path / "src")
    events.write.parquet(src)
    stream = spark.readStream.schema(EVENTS_DDL).parquet(src)
    agg = P.windowed_topk(stream)  # streaming face: aggregate only
    assert agg.isStreaming and "rank" not in agg.columns
    sq = (
        agg.writeStream.format("memory")
        .queryName("topk_t")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    _run_stream(sq)
    w = Window.partitionBy("window_start").orderBy(
        F.col("n_events").desc(), F.col("event_type").asc()
    )
    got = {
        (r["window_start"], r["rank"]): (r["event_type"], r["n_events"])
        for r in spark.sql("SELECT * FROM topk_t")
        .withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= 3)
        .collect()
    }
    want = {
        (r["window_start"], r["rank"]): (r["event_type"], r["n_events"])
        for r in P.windowed_topk(events).collect()
    }
    assert got == want
