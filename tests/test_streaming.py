"""Streaming correctness: every streaming pipeline is checked against
its batch equivalent over the same events — the strongest verification
available for non-SQL-expressible stateful operators."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lab5_lakehouse_etl_spark.session import load_table, table_path
from lab5_lakehouse_etl_spark.streaming import events as E
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def batch_events(spark):
    return load_table(spark, SF_DIR, "events").cache()


@pytest.fixture(scope="module")
def stream(spark):
    return E.read_events_stream(spark, table_path(SF_DIR, "events"))


def test_tumbling_stream_equals_batch(spark, stream, batch_events):
    streamed = E.run_to_memory(
        E.tumbling_counts(stream), "t_tumbling", spark, "complete"
    )
    batch = (
        batch_events.groupBy(F.window("ts", "10 minutes").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 3).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )
    assert sorted(map(tuple, streamed.collect())) == sorted(
        map(tuple, batch.collect())
    )


def test_stream_dedup_matches_distinct(spark, stream, batch_events):
    deduped = E.run_to_memory(E.stream_dedup(stream), "t_dedup", spark)
    assert deduped.count() == batch_events.select("event_id").distinct().count()


def test_sessionize_partitions_events(spark, stream, batch_events):
    sessions = E.run_to_memory(E.sessionize(stream), "t_sessions", spark, "complete")
    rows = sessions.collect()
    # every user's session event-counts sum to their total event count
    per_user = {}
    for r in rows:
        per_user[r.user_id] = per_user.get(r.user_id, 0) + r.n_events
    totals = {
        r.user_id: r.n
        for r in batch_events.groupBy("user_id").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert per_user == totals
    # sessions of one user never overlap
    by_user: dict[int, list] = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append((r.session_start, r.session_end))
    for spans in by_user.values():
        spans.sort()
        assert all(a_end <= b_start for (_, a_end), (b_start, _) in zip(spans, spans[1:]))


def test_watermark_drops_late_data(spark, tmp_path):
    """Three-batch replay proving the watermark actually discards late
    input — the semantics that bounds state at 100 TB. Batch A
    establishes the watermark (max 14:00 − 1 h delay = 13:00); batch B
    exists because Spark applies a newly-advanced watermark to input
    filtering only from the NEXT batch (measured: a late row in the
    batch immediately after the advancing one passes through); batch C
    then carries one row below the watermark (dropped) and one on-time
    row. Only the finalized 10:00 window is emitted, and it must NOT
    contain the late event."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    def ns(hour, minute=0):
        # fixture epoch: 2024-01-01, nanosecond int64 like events.parquet
        base = 1704067200
        return (base + hour * 3600 + minute * 60) * 1_000_000_000

    def write_batch(name, rows, mtime):
        tbl = pa.table(
            {
                "event_id": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array([r[1] for r in rows], pa.int64()),
                "user_id": pa.array([1] * len(rows), pa.int64()),
                "event_type": pa.array(["click"] * len(rows)),
                "value": pa.array([1.0] * len(rows)),
                "props": pa.array(["{}"] * len(rows)),
            }
        )
        p = str(tmp_path / name)
        pq.write_table(tbl, p)
        os.utime(p, (mtime, mtime))

    write_batch("a.parquet", [(1, ns(10)), (2, ns(14))], mtime=1_000_000)
    write_batch("b.parquet", [(5, ns(13, 50))], mtime=1_000_100)
    # event 3 at 10:05 is below the 13:00 watermark → dropped before it
    # can resurrect the already-finalized 10:00 window
    write_batch("c.parquet", [(3, ns(10, 5)), (4, ns(13, 45))], mtime=1_000_200)

    stream = E.read_events_stream(spark, str(tmp_path))
    out = E.run_to_memory(
        E.tumbling_counts(stream), "t_late_drop", spark, "append"
    )
    rows = [(str(r.window_start), r.n_events) for r in out.collect()]
    # only the 10:00 window is final (13:20/13:40/13:50/14:00 are still
    # open when the source drains), and the late event is not in it
    assert rows == [("2024-01-01 10:00:00", 1)]


def test_stateful_counts_match_batch(spark, stream, batch_events):
    out = E.run_to_memory(
        E.stateful_user_counts(stream), "t_stateful", spark, "update"
    )
    # update mode emits one row per user per batch; the LAST row per
    # user carries the final running totals
    final = {}
    for r in out.collect():
        final[r.user_id] = (r.n_events, r.sum_value)
    batch = {
        r.user_id: (r.n, r.s)
        for r in batch_events.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 3).alias("s"),
        )
        .collect()
    }
    assert {u: v[0] for u, v in final.items()} == {u: v[0] for u, v in batch.items()}
    for u in final:
        assert abs(final[u][1] - batch[u][1]) < 1e-6

def test_stream_stream_join_equals_batch_join(spark):
    """The drained stream-stream join must equal the identical batch
    join expression — watermarks with availableNow over a static source
    never drop on-time rows, so the sets coincide exactly."""
    from pyspark.sql import functions as F

    from lab5_lakehouse_etl_spark.queries.streaming_ops import q_stream_join
    from lab5_lakehouse_etl_spark.session import load_table
    from tests.conftest import SF_DIR

    got = sorted(
        (r.user_id, r.view_id, r.purchase_id)
        for r in q_stream_join(spark, SF_DIR).collect()
    )
    ev = load_table(spark, SF_DIR, "events")
    views = ev.filter(F.col("event_type") == "view").select(
        F.col("user_id").alias("v_user"),
        F.col("ts").alias("v_ts"),
        F.col("event_id").alias("view_id"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("p_ts"),
        F.col("event_id").alias("purchase_id"),
    )
    want = sorted(
        (r.v_user, r.view_id, r.purchase_id)
        for r in views.join(
            purchases,
            F.expr(
                "v_user = p_user AND p_ts >= v_ts "
                "AND p_ts <= v_ts + INTERVAL 1 HOUR"
            ),
        ).collect()
    )
    assert len(want) > 0
    assert got == want


def test_dedup_within_watermark_collapses_jittered_retries(spark, tmp_path):
    """Two-batch replay of a retried event whose event-time jitters
    between copies (same event_id, ts 60 s apart). The (event_id, ts)
    key of stream_dedup treats the copies as distinct rows — the
    documented limitation — while dropDuplicatesWithinWatermark on
    event_id alone collapses them, which is exactly the API's reason
    to exist."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    base = 1704067200

    def write_batch(name, rows, mtime):
        tbl = pa.table(
            {
                "event_id": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array(
                    [(base + r[1]) * 1_000_000_000 for r in rows], pa.int64()
                ),
                "user_id": pa.array([1] * len(rows), pa.int64()),
                "event_type": pa.array(["click"] * len(rows)),
                "value": pa.array([1.0] * len(rows)),
                "props": pa.array(["{}"] * len(rows)),
            }
        )
        p = str(tmp_path / name)
        pq.write_table(tbl, p)
        os.utime(p, (mtime, mtime))

    write_batch("a.parquet", [(1, 0)], mtime=1_000_000)
    # retry of event 1 arrives a batch later with +60 s jitter, well
    # inside the 1 h watermark delay; event 2 is genuinely new
    write_batch("b.parquet", [(1, 60), (2, 120)], mtime=1_000_100)

    stream = E.read_events_stream(spark, str(tmp_path))
    wm = E.run_to_memory(
        E.stream_dedup_within_watermark(stream), "t_dedup_wm", spark
    )
    assert sorted(r.event_id for r in wm.collect()) == [1, 2]

    stream2 = E.read_events_stream(spark, str(tmp_path))
    keyed = E.run_to_memory(E.stream_dedup(stream2), "t_dedup_keyed", spark)
    # the ts-keyed dedup passes BOTH copies of event 1 (distinct keys)
    assert sorted(r.event_id for r in keyed.collect()) == [1, 1, 2]


def test_read_events_stream_nanos_and_micros_parity(spark, tmp_path):
    """Streaming twin of the load_table nanos/micros pin: the file
    source must drain identical rows for both ts encodings of the same
    logical events (the footer probe picks the branch; the branch the
    current fixtures don't ship is the one the next regeneration can
    switch to)."""
    import datetime

    import pyarrow as pa
    import pyarrow.parquet as pq

    from lab5_lakehouse_etl_spark.streaming.events import (
        read_events_stream,
        run_to_memory,
    )

    base = datetime.datetime(2024, 3, 1, 12, 0, 0)
    times = [
        base + datetime.timedelta(seconds=17 * i, microseconds=i)
        for i in range(8)
    ]
    cols = {
        "event_id": pa.array(range(8), type=pa.int64()),
        "user_id": pa.array([i % 3 for i in range(8)], type=pa.int64()),
        "event_type": pa.array(["view", "purchase"] * 4),
        "value": pa.array([float(i) for i in range(8)]),
        "props": pa.array(["{}"] * 8),
    }
    drained = {}
    for unit in ("ns", "us"):
        d = tmp_path / unit
        d.mkdir()
        t = pa.table({**cols, "ts": pa.array(times, type=pa.timestamp(unit))})
        pq.write_table(
            t, str(d / "events.parquet"), version="2.6",
            coerce_timestamps=None,
        )
        stream = read_events_stream(spark, str(d / "events.parquet"))
        out = run_to_memory(
            stream.select("event_id", "ts", "user_id"),
            f"nanos_parity_{unit}",
            spark,
        )
        drained[unit] = sorted(tuple(r) for r in out.collect())
    assert drained["ns"] == drained["us"]
    assert len(drained["ns"]) == 8


@pytest.mark.skipif(
    not __import__(
        "lab5_lakehouse_etl_spark.streaming.events", fromlist=["events"]
    ).tws_available(),
    reason="transformWithStateInPandas needs protobuf (not in this "
    "sandbox; see streaming/events.py tws_available)",
)
def test_tws_matches_applyinpandaswithstate(spark):
    """transformWithStateInPandas (Spark 4 arbitrary-stateful API) and
    applyInPandasWithState express the same per-user running totals —
    parity-pinned wherever the runtime has protobuf."""
    from lab5_lakehouse_etl_spark.session import table_path
    from lab5_lakehouse_etl_spark.streaming import events as E
    from tests.conftest import SF_DIR

    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    try:
        stream = E.read_events_stream(spark, table_path(SF_DIR, "events"))
        tws = E.run_to_memory(
            E.stateful_user_counts_tws(stream), "tws_parity_sink", spark,
            "update",
        )
        stream2 = E.read_events_stream(spark, table_path(SF_DIR, "events"))
        aip = E.run_to_memory(
            E.stateful_user_counts(stream2), "aip_parity_sink", spark,
            "update",
        )
        assert sorted(map(tuple, tws.collect())) == sorted(
            map(tuple, aip.collect())
        )
    finally:
        spark.conf.unset("spark.sql.streaming.stateStore.providerClass")


def test_tws_plan_constructs_without_protobuf(spark):
    """The TWS operator's PLAN builds in any environment (protobuf is
    only needed by the python runner at stream start): pin the declared
    output schema so the skip-guarded parity test can't silently rot —
    the non-skipped twin of the delta-adapter structural pins."""
    from lab5_lakehouse_etl_spark.session import table_path
    from lab5_lakehouse_etl_spark.streaming import events as E
    from tests.conftest import SF_DIR

    stream = E.read_events_stream(spark, table_path(SF_DIR, "events"))
    out = E.stateful_user_counts_tws(stream)
    assert out.isStreaming
    assert [(f.name, f.dataType.simpleString()) for f in out.schema.fields] == [
        ("user_id", "bigint"),
        ("n_events", "bigint"),
        ("sum_value", "double"),
    ]


def test_stream_neardup_equals_batch_index_store(spark):
    """The streaming gate and its batch twin are the SAME operator:
    q_stream_neardup's drained rejects must equal q_dedup_index_store's
    output row-for-row (both probe an immutable base band index with
    the same split), and the landing layout must have produced real
    multi-batch execution (4 files, maxFilesPerTrigger=1)."""
    import glob
    import os

    from lab5_lakehouse_etl_spark import queries as Q
    from lab5_lakehouse_etl_spark.session import scratch_dir
    from tests.conftest import SF_DIR

    Q.load_all()
    got_stream = sorted(
        tuple(r)
        for r in Q.QUERIES["q_stream_neardup"](spark, SF_DIR).collect()
    )
    got_batch = sorted(
        tuple(r)
        for r in Q.QUERIES["q_dedup_index_store"](spark, SF_DIR).collect()
    )
    assert got_stream == got_batch
    land = scratch_dir("q_stream_neardup") + "/landing"
    assert len(glob.glob(os.path.join(land, "*.parquet"))) == 4


def test_stream_decontaminate_invariant_to_batching(spark, tmp_path):
    """Batch-independence of the ingest decontamination gate, pinned
    directly: the same training docs landed as 4 files and drained
    with maxFilesPerTrigger=1 (four micro-batches) vs a single
    availableNow batch produce the IDENTICAL quarantine relation —
    the property that makes the query SQL-stateable."""
    from lab5_lakehouse_etl_spark.functions import dedup as D

    docs = load_table(spark, SF_DIR, "documents")
    split = F.pmod(F.col("doc_id") * F.lit(2654435761), F.lit(100))
    train = docs.filter(split < 80).select("doc_id", "text")
    bench_grams = (
        docs.filter(split >= 90)
        .select(F.explode(D.word_ngrams("text", 5)).alias("gram"))
        .distinct()
    )
    land = str(tmp_path / "landing")
    train.repartitionByRange(4, "doc_id").write.parquet(land)

    def drained(max_files: int, tag: str) -> set:
        stream = (
            spark.readStream.schema(train.schema)
            .option("maxFilesPerTrigger", max_files)
            .parquet(land)
        )
        out = str(tmp_path / f"quarantine_{tag}")
        E.stream_decontaminate_gate(
            spark, stream, bench_grams, out, str(tmp_path / f"ckpt_{tag}")
        )
        import os

        if not os.path.isdir(out):
            return set()
        # per-batch subdirectories (replay-idempotent overwrite sinks)
        return {
            (r.doc_id, r.n_leaked_grams)
            for r in spark.read.option("recursiveFileLookup", "true")
            .parquet(out)
            .collect()
        }

    four = drained(1, "four")
    one = drained(4, "one")
    assert four == one
    assert len(four) > 0  # the fixture plants real contamination


def test_nanos_rebuild_floors_like_duckdb(spark, tmp_path):
    """r10 deep review: the ns→µs rebuild for TIMESTAMP(NANOS) fixtures
    must FLOOR, not truncate toward zero — DuckDB's ns→µs conversion
    floors (measured: -1500 ns → -2 µs), so a pre-epoch nanosecond
    event under bare `div` would land one µs later than the oracle and
    than the MICROS encoding of the same instant, shifting
    window/watermark assignment between the two supported encodings."""
    import duckdb

    from pyspark.sql import functions as F

    FLOOR = "(ts - ((ts % 1000) + 1000) % 1000) div 1000"
    df = spark.createDataFrame(
        [(-1500,), (-999,), (-1,), (0,), (999,), (1500,)], "ts long"
    )
    got = {r.ts: r.us for r in df.select(
        "ts", F.expr(FLOOR).alias("us")).collect()}
    con = duckdb.connect()
    for ns, want in got.items():
        # DuckDB floors in its ns->us conversion; state it arithmetically
        duck = con.execute(
            f"SELECT CAST(floor({ns} / 1000.0) AS BIGINT)"
        ).fetchone()[0]
        assert want == duck, (ns, want, duck)
    assert got == {-1500: -2, -999: -1, -1: -1, 0: 0, 999: 0, 1500: 1}
