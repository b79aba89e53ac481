"""SparkSession construction and test-table registration.

Mirrors the reference's session bootstrap (jobs/order_glue_job.py:49-53
builds a Delta-enabled session; we have no delta-spark in this
environment, so the lakehouse layer in `lab5_lakehouse_etl_spark.lakehouse`
provides the ACID-ish table semantics instead) while adding the configs
that matter for scale:

- AQE on (runtime re-planning, skew-join handling, partition coalescing).
- Arrow execution for any pandas interchange.
- Session timezone pinned to UTC so timestamp results are identical
  under any driver session and match DuckDB's naive-UTC reads.

All queries must ALSO be correct under a vanilla session the driver
builds (ANSI mode on in Spark 4), which is why operators use
``try_cast``/``try_*`` explicitly rather than relying on legacy
permissive-cast session configs.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: Every driver-provided test table (TESTDATA.md).
TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def build_session(
    app_name: str = "lab5-lakehouse-etl-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    """Create (or fetch) a SparkSession tuned for this engine.

    On the test box we run ``local[N]``; on a real cluster the same
    configs hold — AQE coalesces the 200-default shuffle partitions to
    match actual data volume, so ``shuffle_partitions`` is a ceiling,
    not a hand-tuned constant.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master or f"local[{cpus}]")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or cpus))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # INT64 micros instead of the deprecated INT96: INT96 columns
        # carry no usable parquet min/max statistics, which silently
        # disables footer stats → manifest data skipping for TIMESTAMP
        # (LTZ) columns written through LakeTable
        .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
    )
    return builder.getOrCreate()


def tune(spark: SparkSession) -> SparkSession:
    """Apply runtime-settable configs to a session we did not build.

    The correctness driver constructs its own SparkSession; these are
    the session-scoped settings our declared queries rely on. Timezone
    is the critical one — the DuckDB oracle reads parquet timestamps as
    naive UTC, so Spark must collect them in UTC too. Shuffle
    partitions: AQE coalesces batch shuffles, but Structured Streaming
    state stores get NO adaptive coalescing — a vanilla session's 200
    default partitions means 200 state-store tasks per micro-batch, so
    size it to the machine (fresh checkpoints each run, so re-sizing is
    safe; a production stream with a retained checkpoint must keep its
    original partition count).
    """
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark.conf.set("spark.sql.shuffle.partitions", cpus)
    # see build_session: INT96 timestamps have no parquet stats, which
    # disables manifest data skipping on TIMESTAMP columns
    spark.conf.set(
        "spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS"
    )
    return spark


def scratch_dir(*parts: str, fresh: bool = False) -> str:
    """Stable per-process scratch directory for staged landing files.

    Declared queries that stage data (CSV landing, workbook splits,
    streamed LakeTables) must return DISTRIBUTED scans over files that
    outlive the query call — a ``TemporaryDirectory`` would vanish
    before the driver collects, which previously forced driver-side
    ``collect()`` round-trips. The pid component keeps concurrent
    processes apart; ``fresh=True`` clears a previous run's files so
    each call is idempotent.
    """
    import shutil
    import tempfile

    base = os.environ.get(
        "SPARK_GRAFT_SCRATCH",
        os.path.join(tempfile.gettempdir(), "lab5_lakehouse_scratch"),
    )
    d = os.path.join(base, f"pid{os.getpid()}", *parts)
    if fresh and os.path.isdir(d):
        shutil.rmtree(d)
    os.makedirs(d, exist_ok=True)
    return d


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def table_rows(sf_dir: str, name: str) -> int:
    """Row count of one driver test table from PARQUET FOOTER METADATA —
    driver-side, zero Spark jobs, zero data pages read.  For parameter
    choosers that only need corpus SCALE (e.g. minhash_params picking a
    banding tier), a full ``df.count()`` action is a whole extra scan
    the query's plan pins never see; the footer already carries the
    exact count.  Falls back to a Spark count only if pyarrow cannot
    read the footer (never expected for the fixture tables — the
    fallback keeps the helper total rather than fast).

    Directory scans walk RECURSIVELY: a hive-partitioned table nests
    its files under ``key=value/`` subdirectories, where a top-level
    ``os.listdir`` finds no ``*.parquet`` and a bare ``sum()`` over the
    empty generator would silently report 0 rows (r9 advice) — sending
    e.g. ``minhash_params`` to the smallest banding tier at any corpus
    scale.  An empty match set is therefore treated as
    footer-unreadable and routed to the Spark-count fallback too."""
    path = table_path(sf_dir, name)
    try:
        import pyarrow.parquet as pq

        if os.path.isdir(path):
            files = [
                os.path.join(root, f)
                for root, _dirs, names in os.walk(path)
                for f in names
                if f.endswith(".parquet")
            ]
            if not files:
                raise FileNotFoundError(f"no parquet files under {path}")
            return sum(
                pq.ParquetFile(f).metadata.num_rows for f in files
            )
        return pq.ParquetFile(path).metadata.num_rows
    except Exception:  # noqa: BLE001 — footer unreadable: stay correct
        from pyspark.sql import SparkSession

        return SparkSession.active().read.parquet(path).count()


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Columnar parquet scan of one driver test table.

    Plain ``spark.read.parquet`` so Catalyst keeps scan-level predicate
    pushdown and column pruning for whatever the caller composes on top.

    `events.ts` has shipped as either parquet TIMESTAMP(NANOS) or
    TIMESTAMP(MICROS) depending on the generator run. Spark's reader
    rejects nanos (PARQUET_TYPE_ILLEGAL — Spark timestamps are µs)
    unless the legacy conf reads them as long, so we set the conf and
    branch on the landed type: long → rebuild the µs timestamp with
    FLOOR integer division (NOT float division — ns epoch values
    ~1.7e18 exceed double's 2^53 integer range; and not bare `div`,
    which truncates toward zero: DuckDB's ns→µs conversion FLOORS, so
    a pre-epoch nanosecond timestamp under `div` would land one µs
    later than the oracle and than the MICROS encoding of the same
    instant — measured: DuckDB maps -1500 ns to -2 µs; r10 review); timestamp/timestamp_ntz → cast to the
    session-local TIMESTAMP (a no-op under the pinned UTC timezone),
    so every downstream query sees one stable TIMESTAMP type.
    """
    tune(spark)
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(table_path(sf_dir, name))
        if df.schema["ts"].dataType.simpleString() == "bigint":
            ts = F.timestamp_micros(F.expr("(ts - ((ts % 1000) + 1000) % 1000) div 1000"))
        else:
            ts = F.col("ts").cast("timestamp")
        return df.withColumn("ts", ts).select(
            "event_id", "ts", "user_id", "event_type", "value", "props"
        )
    return spark.read.parquet(table_path(sf_dir, name))


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every test table as a temp view for ``spark.sql`` use.

    Local stand-in for the reference's Glue-Crawler→Athena catalog path
    (step_functions/state_machine.json:69-145): Spark's catalog replaces
    the Glue Data Catalog and ``spark.sql`` replaces Athena.
    """
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)


def cluster_for_write(df, by: str):
    """Key-clustered exchange ahead of a ``partition_by=[by]`` table
    write: hash-repartition by ``by`` with an EXPLICIT partition count
    (defaultParallelism).  The explicit count is the point — a bare
    ``repartition("col")`` is an AQE-coalescible shuffle, and on a
    small build (kilobytes into 256 cells) AQE collapses it to ONE
    post-shuffle partition, so a single task serially pays the parquet
    writer open/close for every partition directory (measured: the
    256-cell IVF index create spent 4-5 s of its 5.3 s in one task
    writing 253 files; pinned at defaultParallelism the same write is
    ~0.9 s across 32 tasks).  Layout is unchanged — each key still
    lands wholly in one task, so the one-file-per-partition-value
    small-files discipline holds; only writer parallelism moves, and
    it scales with the cluster instead of with AQE's byte heuristic."""
    from pyspark.sql import functions as F

    n = df.sparkSession.sparkContext.defaultParallelism
    return df.repartition(n, F.col(by))


def spread(df, by: str, min_partitions: int | None = None):
    """Fixture-parallelism knob for CPU-heavy narrow maps: when the
    upstream scan yields fewer partitions than cores (the test corpora
    are single small parquet files with one row group — Spark cannot
    split below a row-group boundary, so the whole map runs on ONE
    core), hash-spread by ``by`` first.  CONDITIONAL on purpose: on a
    real corpus the scan is already split and this returns the input
    untouched — the 100 TB plan stays shuffle-free, while the local
    fixture stops serializing a 32-core box onto one thread (measured
    3.3 s -> 0.95 s on the prefix-join shingle pass at sf0.1)."""
    from pyspark.sql import functions as F

    n = min_partitions or df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= n:
        return df
    return df.repartition(n, F.col(by))
