"""Iceberg partition transforms: hash pinned against the in-container
INDEPENDENT implementation (Guava murmur3_32_fixed — the exact code
Iceberg's BucketUtil delegates to — for both byte strings and longs)
plus the spec's published Appendix-B test values; transform
semantics, export/read round-trips, scan-planning file counts, and
the mispartitioned-table refusal.

The java-imageio-validation precedent: no iceberg/mmh3 package is
installable here, so external correctness rests on validators that
ship with the JVM/Spark jars, not on self-consistency.
"""

from __future__ import annotations

import datetime
import shutil

import numpy as np
import pytest
from pyspark.sql import functions as F

from lab5_lakehouse_etl_spark.lakehouse import iceberg_meta as IM
from lab5_lakehouse_etl_spark.lakehouse import iceberg_transforms as T
from lab5_lakehouse_etl_spark.lakehouse.table import LakeTable


# --------------------------------------------------------------- hash

def test_murmur3_spec_appendix_b_vectors():
    """The Iceberg spec's published hash test values (Appendix B,
    "Hash results for spec validation"): int/long promote identically,
    date hashes as days from epoch, timestamp as micros, string as
    UTF-8 — a wrong seed, tail handling, or ordinal encoding breaks
    at least one row."""
    assert T.hash_long(34) == 2017239379  # hashInt(34) == hashLong(34)
    assert T.murmur3_32(b"iceberg") == 1210000089
    days = (datetime.date(2017, 11, 16) - datetime.date(1970, 1, 1)).days
    assert days == 17486 and T.hash_long(days) == -653330422
    micros = 1510871468000000  # 2017-11-16T22:31:08 UTC
    assert T.hash_long(micros) == -2047944441


def test_murmur3_matches_guava_jvm(spark):
    """Property pin against the INDEPENDENT in-container
    implementation: Guava's canonical murmur3_32_fixed — the exact
    code Iceberg's own BucketUtil delegates to — over random byte
    strings of every tail length 0..3 and over longs via its own
    ``hashLong`` (which hashes the 8-byte LE encoding, the Appendix-B
    contract)."""
    guava = spark._jvm.com.google.common.hash.Hashing.murmur3_32_fixed()
    rng = np.random.default_rng(7)
    for n in list(range(0, 16)) + [31, 64, 255]:
        data = bytes(rng.integers(0, 256, n, dtype=np.uint8))
        want = guava.hashBytes(bytearray(data)).asInt()
        assert T.murmur3_32(data) == want, f"len {n}"
    for v in [0, 1, -1, 34, 2**31, -(2**31), 2**63 - 1, -(2**63)] + [
        int(x) for x in rng.integers(-(2**62), 2**62, 50)
    ]:
        assert T.hash_long(v) == guava.hashLong(v).asInt(), v


def test_vectorized_bucket_matches_scalar():
    rng = np.random.default_rng(3)
    v = rng.integers(-(2**62), 2**62, 2000, dtype=np.int64)
    vec = T._mm3_long_np(v)
    assert vec.dtype == np.int32
    sca = np.array([T.hash_long(int(x)) for x in v], dtype=np.int32)
    assert (vec == sca).all()


# --------------------------------------------------- transform algebra

def test_apply_transform_semantics():
    # truncate: W * floor(v / W), exact for negatives; strings by
    # leading code points
    assert T.apply_transform("truncate", 10, -7, "long") == -10
    assert T.apply_transform("truncate", 10, -10, "long") == -10
    assert T.apply_transform("truncate", 10, 19, "int") == 10
    assert T.apply_transform("truncate", 3, "iceberg", "string") == "ice"
    # time ordinals (spec): months from 1970-01, days from epoch,
    # hours from epoch, floor semantics pre-epoch
    assert T.apply_transform("year", None, "2017-11-16", "date") == 47
    assert T.apply_transform("month", None, "2017-11-16", "date") == 574
    assert T.apply_transform("day", None, "2017-11-16", "date") == 17486
    assert (
        T.apply_transform("day", None, "2017-11-16T22:31:08", "timestamp")
        == 17486
    )
    assert (
        T.apply_transform("hour", None, 1510871468000000, "timestamp")
        == 419686
    )
    # pre-epoch: 1969-12-31 is day -1, month -1, year -1
    assert T.apply_transform("day", None, "1969-12-31", "date") == -1
    assert T.apply_transform("month", None, "1969-12-31", "date") == -1
    assert T.apply_transform("year", None, "1969-12-31", "date") == -1
    assert (
        T.apply_transform("hour", None, "1969-12-31T23:30:00", "timestamp")
        == -1
    )
    # bucket: spec example bucket[16] of 34 -> hash & IntMax % 16
    assert T.apply_transform("bucket", 16, 34, "long") == (
        2017239379 & 0x7FFFFFFF
    ) % 16
    assert T.apply_transform("bucket", 16, "iceberg", "string") == (
        1210000089 & 0x7FFFFFFF
    ) % 16
    # nulls pass through
    assert T.apply_transform("bucket", 16, None, "long") is None


def test_transform_refusals():
    with pytest.raises(NotImplementedError, match="void"):
        T.parse_transform("void")
    with pytest.raises(NotImplementedError):
        T.parse_transform("zorder")
    with pytest.raises(ValueError, match="> 0"):
        T.parse_transform("bucket[0]")
    with pytest.raises(NotImplementedError, match="bucket over"):
        T.result_type("bucket", "double")
    with pytest.raises(NotImplementedError, match="bucket over"):
        T.result_type("bucket", "decimal(10,2)")
    with pytest.raises(NotImplementedError, match="truncate over"):
        T.result_type("truncate", "timestamp")
    with pytest.raises(NotImplementedError, match="hour"):
        T.result_type("hour", "date")
    with pytest.raises(NotImplementedError, match="over boolean"):
        T.result_type("day", "boolean")


def test_column_builders_match_driver_side(spark):
    """The distributed derivations (pandas-UDF bucket, JVM truncate /
    time ordinals) agree with apply_transform on every row, including
    nulls and negatives."""
    rows = [
        (1, -42, "alpha", datetime.date(2017, 11, 16),
         datetime.datetime(2017, 11, 16, 22, 31, 8)),
        (2, 0, "", datetime.date(1969, 12, 31),
         datetime.datetime(1969, 12, 31, 23, 30)),
        (3, 1234567, "iceberg", datetime.date(1970, 1, 1),
         datetime.datetime(2024, 2, 29, 1, 2, 3, 456789)),
        (4, None, None, None, None),
    ]
    df = spark.createDataFrame(
        rows, "id long, v long, s string, d date, ts timestamp"
    )
    out = df.select(
        "id", "v", "s", "d", "ts",
        T.bucket_column("v", 16, "long").alias("bv"),
        T.bucket_column("s", 16, "string").alias("bs"),
        T.bucket_column("d", 16, "date").alias("bd"),
        T.bucket_column("ts", 16, "timestamptz").alias("bts"),
        T.truncate_column("v", 10, "long").alias("tv"),
        T.truncate_column("s", 3, "string").alias("ts3"),
        T.year_column("ts").alias("yy"),
        T.month_column("ts").alias("mm"),
        T.day_column("ts").alias("dd"),
        T.hour_column("ts").alias("hh"),
    ).collect()
    for r in out:
        def want(name, param, v, styp):
            return None if v is None else T.apply_transform(
                name, param, v, styp
            )
        assert r.bv == want("bucket", 16, r.v, "long")
        assert r.bs == want("bucket", 16, r.s, "string")
        assert r.bd == want("bucket", 16, r.d, "date")
        assert r.bts == want("bucket", 16, r.ts, "timestamptz")
        assert r.tv == want("truncate", 10, r.v, "long")
        assert r.ts3 == want("truncate", 3, r.s, "string")
        assert r.yy == want("year", None, r.ts, "timestamp")
        assert r.mm == want("month", None, r.ts, "timestamp")
        assert r.dd == want("day", None, r.ts, "timestamp")
        assert r.hh == want("hour", None, r.ts, "timestamp")


# ------------------------------------------------- export + scan plan

def test_bucket_truncate_export_roundtrip_and_pruning(spark, tmp_path):
    """A bucket[4]+truncate[100] table exports, the schema EXCLUDES
    the derived columns, the full metadata read reproduces the data
    exactly, and a point lookup through the scan planner reads only
    the matching bucket's files."""
    df = spark.range(0, 400).select(
        F.col("id").alias("k"),
        (F.col("id") * 3 % 250).alias("v"),
        F.concat(F.lit("row-"), F.col("id")).alias("s"),
    )
    staged = df.withColumn(
        "kb", T.bucket_column("k", 4, "long")
    ).withColumn("vt", T.truncate_column("v", 100, "long"))
    # one file per partition dir so the scan-planning counts are exact
    staged = staged.repartition("kb", "vt")
    path = str(tmp_path / "t")
    t = LakeTable.create(staged, path, partition_by=["kb", "vt"])
    IM.export_iceberg_metadata(
        t,
        partition_transforms={
            "kb": ("bucket[4]", "k"),
            "vt": ("truncate[100]", "v"),
        },
    )
    # metadata assertions: schema has no derived cols, spec has the
    # transform strings against the SOURCE field ids
    meta = IM._load_metadata(path)
    schema = meta["schemas"][meta["current-schema-id"]]
    names = [f["name"] for f in schema["fields"]]
    assert names == ["k", "v", "s"]
    spec = meta["partition-specs"][meta["default-spec-id"]]
    by_name = {pf["name"]: pf for pf in spec["fields"]}
    id_of = {f["name"]: f["id"] for f in schema["fields"]}
    assert by_name["kb"]["transform"] == "bucket[4]"
    assert by_name["kb"]["source-id"] == id_of["k"]
    assert by_name["vt"]["transform"] == "truncate[100]"
    assert by_name["vt"]["source-id"] == id_of["v"]

    full = IM.read_iceberg_snapshot(spark, path)
    assert sorted(full.columns) == ["k", "s", "v"]
    assert set(map(tuple, full.collect())) == set(map(tuple, df.collect()))

    n_full = full.select(F.input_file_name()).distinct().count()
    key = 137
    point = IM.read_iceberg_snapshot(spark, path, prune={"k": (key, key)})
    n_point = point.select(F.input_file_name()).distinct().count()
    # 4 buckets x 3 truncate groups; the bucket dimension prunes 4x
    assert n_full == 12 and n_point == 3
    assert point.filter(F.col("k") == key).count() == 1
    # prune is an I/O hint, never a filter: the bucket's OTHER rows
    # are still present
    assert point.count() > 1


def test_time_transform_export_verifies_and_prunes(spark, tmp_path):
    """day+month spec: exported partition values are VERIFIED against
    source footer bounds, day values carry the Avro date logical
    annotation, and a 2-day range prune reads only those partitions;
    a mispartitioned table refuses loudly at export."""
    base = datetime.datetime(2024, 1, 1)
    df = spark.range(0, 240).select(
        F.col("id").alias("eid"),
        (
            F.lit(base)
            + F.make_interval(hours=(F.col("id") * 3).cast("int"))
        ).alias("ts"),
    )
    staged = df.withColumn("ts_day", T.day_column("ts")).withColumn(
        "ts_month", T.month_column("ts")
    ).repartition("ts_day")
    path = str(tmp_path / "t")
    t = LakeTable.create(staged, path, partition_by=["ts_month", "ts_day"])
    IM.export_iceberg_metadata(
        t,
        partition_transforms={
            "ts_day": ("day", "ts"),
            "ts_month": ("month", "ts"),
        },
    )
    full = IM.read_iceberg_snapshot(spark, path)
    assert sorted(full.columns) == ["eid", "ts"]
    assert full.count() == 240
    lo = datetime.datetime(2024, 1, 3)
    hi = datetime.datetime(2024, 1, 4, 23, 59, 59, 999999)
    pruned = IM.read_iceberg_snapshot(spark, path, prune={"ts": (lo, hi)})
    n_full = full.select(F.input_file_name()).distinct().count()
    n_pruned = pruned.select(F.input_file_name()).distinct().count()
    # 30 day-partitions at 8 rows/day -> the window keeps exactly 2
    assert n_full == 30 and n_pruned == 2
    got = pruned.filter((F.col("ts") >= lo) & (F.col("ts") <= hi)).count()
    assert got == 16

    # mispartitioned claim: junk int column declared as day(ts)
    bad = df.withColumn("ts_day", (F.col("eid") % 5).cast("int"))
    bpath = str(tmp_path / "bad")
    t2 = LakeTable.create(bad, bpath, partition_by=["ts_day"])
    with pytest.raises(ValueError, match="not partitioned by"):
        IM.export_iceberg_metadata(
            t2, partition_transforms={"ts_day": ("day", "ts")}
        )
    shutil.rmtree(bpath, ignore_errors=True)


def test_transform_column_must_be_partition_column(spark, tmp_path):
    """A declared transform column that is NOT hive-partitioned is a
    real data column — excluding it from the schema would hide data,
    so the export refuses."""
    df = spark.range(0, 10).select(
        F.col("id").alias("k"),
        (F.col("id") % 3).cast("int").alias("kb"),
    )
    t = LakeTable.create(df, str(tmp_path / "t"))
    with pytest.raises(ValueError, match="not a partition column"):
        IM.export_iceberg_metadata(
            t, partition_transforms={"kb": ("bucket[3]", "k")}
        )
    with pytest.raises(ValueError, match="identity belongs"):
        IM.export_iceberg_metadata(
            t, partition_transforms={"kb": ("identity", "k")}
        )


def test_day_partition_value_carries_date_logical_type(spark, tmp_path):
    """The day transform's result is Iceberg type date: the manifest's
    partition struct field must be Avro int annotated with the date
    logical type (spec Appendix A), readable by logical-type-aware
    Avro consumers."""
    import json

    from lab5_lakehouse_etl_spark.lakehouse import avro

    df = spark.range(0, 4).select(
        F.col("id").alias("k"),
        F.lit(datetime.datetime(2024, 1, 15, 12)).alias("ts"),
    )
    staged = df.withColumn("ts_day", T.day_column("ts"))
    path = str(tmp_path / "t")
    t = LakeTable.create(staged, path, partition_by=["ts_day"])
    IM.export_iceberg_metadata(
        t, partition_transforms={"ts_day": ("day", "ts")}
    )
    meta = IM._load_metadata(path)
    snap = meta["snapshots"][-1]
    _, mfs = avro.read_container(snap["manifest-list"])
    hdr, entries = avro.read_container(mfs[0]["manifest_path"])
    schema = json.loads(hdr["avro.schema"])
    part = next(
        f
        for f in schema["fields"]
        if f["name"] == "data_file"
    )
    pstruct = next(
        f
        for f in part["type"]["fields"]
        if f["name"] == "partition"
    )
    dayf = next(
        f for f in pstruct["type"]["fields"] if f["name"] == "ts_day"
    )
    branch = [b for b in dayf["type"] if b != "null"][0]
    assert branch == {"type": "int", "logicalType": "date"}
    want_day = (datetime.date(2024, 1, 15) - datetime.date(1970, 1, 1)).days
    assert entries[0]["data_file"]["partition"]["ts_day"] == want_day
