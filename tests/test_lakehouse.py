"""LakeTable unit tests: versioned writes, snapshot reads, MERGE
semantics, vacuum, partition layout (SURVEY §2.1 S6-S8, §2.3 J4)."""

from __future__ import annotations

import os

import pytest

from lab5_lakehouse_etl_spark.lakehouse import LakeTable, create_or_merge


@pytest.fixture()
def df3(spark):
    return spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "a", 30.0)],
        "k BIGINT, part STRING, v DOUBLE",
    )


def test_create_read_roundtrip(spark, df3, tmp_path):
    path = str(tmp_path / "t")
    assert not LakeTable.is_table(path)
    t = LakeTable.create(df3, path, partition_by=["part"])
    assert LakeTable.is_table(path)
    assert t.version() == 0
    back = t.read(spark)
    assert sorted((r.k, r.part, r.v) for r in back.collect()) == [
        (1, "a", 10.0),
        (2, "b", 20.0),
        (3, "a", 30.0),
    ]
    # partitioned layout: directory-encoded partition values
    assert os.path.isdir(os.path.join(path, "data_v0", "part=a"))


def test_merge_update_and_insert(spark, df3, tmp_path):
    t = LakeTable.create(df3, str(tmp_path / "t"))
    source = spark.createDataFrame(
        [(2, "b", 99.0), (4, "c", 40.0)], "k BIGINT, part STRING, v DOUBLE"
    )
    t.merge(spark, source, key=["k"])
    rows = {r.k: r.v for r in t.read(spark).collect()}
    assert rows == {1: 10.0, 2: 99.0, 3: 30.0, 4: 40.0}  # update-all + insert-all
    assert t.version() == 1
    assert [m["operation"] for m in t.history()] == ["create", "merge"]


def test_merge_latest_wins_pre_dedup(spark, tmp_path):
    t = LakeTable.create(
        spark.createDataFrame([(1, 1, 0.0)], "k BIGINT, ts BIGINT, v DOUBLE"),
        str(tmp_path / "t"),
    )
    # duplicate merge keys in the source — the reference's Delta MERGE
    # would throw; we keep the newest by ts (documented deviation)
    source = spark.createDataFrame(
        [(1, 5, 50.0), (1, 9, 90.0), (2, 1, 10.0)],
        "k BIGINT, ts BIGINT, v DOUBLE",
    )
    t.merge(spark, source, key=["k"], latest_by="ts")
    rows = {r.k: (r.ts, r.v) for r in t.read(spark).collect()}
    assert rows == {1: (9, 90.0), 2: (1, 10.0)}


def test_merge_schema_mismatch_raises(spark, df3, tmp_path):
    t = LakeTable.create(df3, str(tmp_path / "t"))
    bad = spark.createDataFrame([(1, "x")], "k BIGINT, other STRING")
    with pytest.raises(ValueError, match="merge schema mismatch"):
        t.merge(spark, bad, key=["k"])


def test_vacuum_keeps_two_versions(spark, df3, tmp_path):
    path = str(tmp_path / "t")
    t = LakeTable.create(df3, path)
    src = spark.createDataFrame([(9, "z", 1.0)], "k BIGINT, part STRING, v DOUBLE")
    t.merge(spark, src, key=["k"])
    t.merge(spark, src, key=["k"])
    t.merge(spark, src, key=["k"])
    assert t.version() == 3
    # history metadata intact, but only 2 newest data dirs remain
    assert len(t.history()) == 4
    dirs = [d for d in os.listdir(path) if d.startswith("data_v")]
    assert sorted(dirs) == ["data_v2", "data_v3"]


def test_create_or_merge_branch(spark, df3, tmp_path):
    path = str(tmp_path / "t")
    create_or_merge(spark, df3, path, key=["k"])  # create branch
    assert LakeTable(path).version() == 0
    create_or_merge(spark, df3, path, key=["k"])  # merge branch
    assert LakeTable(path).version() == 1
    assert LakeTable(path).read(spark).count() == 3


def test_delete_copy_on_write(spark, df3, tmp_path):
    from pyspark.sql import functions as F

    t = LakeTable.create(df3, str(tmp_path / "t"))
    v = t.delete(spark, F.col("part") == "a")
    assert v == 1
    assert [r.k for r in t.read(spark).collect()] == [2]
    # pre-delete snapshot still time-travels
    assert t.read(spark, version=0).count() == 3
    assert t.history()[-1]["operation"] == "delete"


def test_optimize_compacts_files_preserves_rows(spark, df3, tmp_path):
    import glob

    t = LakeTable.create(
        df3.repartition(8), str(tmp_path / "t")
    )  # 8 small files
    before = len(glob.glob(os.path.join(str(tmp_path / "t"), "data_v0", "*.parquet")))
    assert before > 1
    v = t.optimize(spark)
    after = len(
        glob.glob(os.path.join(str(tmp_path / "t"), f"data_v{v}", "*.parquet"))
    )
    assert after == 1
    assert sorted((r.k, r.part, r.v) for r in t.read(spark).collect()) == [
        (1, "a", 10.0),
        (2, "b", 20.0),
        (3, "a", 30.0),
    ]
    assert t.history()[-1]["operation"] == "optimize"


def test_optimize_partitioned_keeps_layout(spark, df3, tmp_path):
    path = str(tmp_path / "t")
    t = LakeTable.create(df3.repartition(4), path, partition_by=["part"])
    v = t.optimize(spark)
    assert os.path.isdir(os.path.join(path, f"data_v{v}", "part=a"))
    assert t.read(spark).count() == 3
