"""Vendored Delta-log writer: golden action structure, protocol
round-trip fidelity (snapshot == LakeTable.read at every version),
idempotent re-export, and loud refusal of inexpressible features."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from lab5_lakehouse_etl_spark.lakehouse import LakeTable
from lab5_lakehouse_etl_spark.lakehouse import delta_log as DL
from lab5_lakehouse_etl_spark.session import load_table
from tests.conftest import SF_DIR


def _rows(df):
    return sorted(map(tuple, df.collect()))


@pytest.fixture()
def nation_table(spark, tmp_path):
    nation = load_table(spark, SF_DIR, "nation")
    t = LakeTable.create(
        nation, str(tmp_path / "t"), partition_by=["n_regionkey"]
    )
    return t, nation


def test_export_golden_action_structure(spark, nation_table):
    t, nation = nation_table
    log_dir = DL.export_delta_log(t)
    files = sorted(os.listdir(log_dir))
    assert files[0] == "00000000000000000000.json"
    with open(os.path.join(log_dir, files[0])) as fh:
        actions = [json.loads(line) for line in fh if line.strip()]
    # fixed prologue order: commitInfo, protocol, metaData, then adds
    assert list(actions[0]) == ["commitInfo"]
    assert actions[1] == {
        "protocol": {"minReaderVersion": 1, "minWriterVersion": 2}
    }
    meta = actions[2]["metaData"]
    assert meta["partitionColumns"] == ["n_regionkey"]
    assert meta["format"] == {"provider": "parquet", "options": {}}
    # schemaString is the exact Spark StructType JSON
    assert StructType.fromJson(json.loads(meta["schemaString"])) == nation.schema
    adds = [a["add"] for a in actions[3:]]
    assert adds and all(a["path"].startswith("data/") for a in adds)
    for a in adds:
        assert set(a["partitionValues"]) == {"n_regionkey"}
        assert a["size"] > 0 and a["dataChange"] is True
        assert json.loads(a["stats"])["numRecords"] > 0
        # hive dir value round-trips into partitionValues
        assert f"n_regionkey={a['partitionValues']['n_regionkey']}/" in a["path"]
    assert sum(json.loads(a["stats"])["numRecords"] for a in adds) == 25
    # re-export is byte-stable (golden determinism incl. table id)
    before = {
        f: open(os.path.join(log_dir, f), "rb").read() for f in files
    }
    DL.export_delta_log(t)
    after = {
        f: open(os.path.join(log_dir, f), "rb").read()
        for f in sorted(os.listdir(log_dir))
    }
    assert before == after


def test_snapshot_roundtrip_across_versions(spark, nation_table):
    t, nation = nation_table
    v0_expected = _rows(t.read(spark))
    upd = nation.filter(F.col("n_nationkey") < 10).withColumn(
        "n_name", F.lit("dl-updated")
    )
    t.merge(spark, upd, key=["n_nationkey"])
    DL.export_delta_log(t)
    got_latest = DL.read_delta_snapshot(spark, t.path)
    assert _rows(got_latest.select(*t.read(spark).columns)) == _rows(
        t.read(spark)
    )
    # merge rewrote touched partitions: the log must carry removes
    with open(
        os.path.join(t.path, "_delta_log", "00000000000000000001.json")
    ) as fh:
        actions = [json.loads(line) for line in fh if line.strip()]
    kinds = {next(iter(a)) for a in actions}
    assert "remove" in kinds and "add" in kinds
    # no repeated metaData when schema/partitioning is unchanged
    assert "metaData" not in kinds and "protocol" not in kinds
    # time travel: version 0 snapshot reconstructs the original write
    got_v0 = DL.read_delta_snapshot(spark, t.path, version=0)
    assert _rows(got_v0.select(*nation.columns)) == v0_expected


def test_export_refuses_inexpressible_features(spark, tmp_path):
    nation = load_table(spark, SF_DIR, "nation")
    t = LakeTable.create(nation, str(tmp_path / "dv"))
    t.delete_dv(spark, F.col("n_nationkey") == 3)
    with pytest.raises(NotImplementedError, match="deletion vectors"):
        DL.export_delta_log(t)

    t2 = LakeTable.create(nation, str(tmp_path / "cm"))
    t2.rename_column("n_name", "nm")
    with pytest.raises(NotImplementedError, match="column mapping"):
        DL.export_delta_log(t2)


def test_null_partition_value_roundtrip(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, "a"), (2, None), (3, "b")], "id long, grp string"
    )
    t = LakeTable.create(df, str(tmp_path / "np"), partition_by=["grp"])
    DL.export_delta_log(t)
    snap = DL.replay_delta_log(t.path)
    vals = {pv["grp"] for pv in snap["files"].values()}
    assert None in vals  # hive default partition -> json null
    got = DL.read_delta_snapshot(spark, t.path)
    assert _rows(got.select("id", "grp")) == _rows(df)


def test_action_paths_are_percent_encoded(spark, tmp_path):
    # hive-escaped dir names contain %XX; the Delta protocol stores
    # paths as percent-encoded relative URIs, so a spec reader
    # URL-decodes them — raw paths would decode to missing files
    df = spark.createDataFrame(
        [(1, "a:b"), (2, "c d"), (3, "plain")], "id long, grp string"
    )
    t = LakeTable.create(df, str(tmp_path / "enc"), partition_by=["grp"])
    log_dir = DL.export_delta_log(t)
    with open(os.path.join(log_dir, "00000000000000000000.json")) as fh:
        adds = [
            json.loads(line)["add"]
            for line in fh
            if line.strip() and "add" in json.loads(line)
        ]
    import urllib.parse

    for a in adds:
        decoded = urllib.parse.unquote(a["path"])
        assert os.path.exists(os.path.join(t.path, decoded))
    # the escaped-char partitions decode to real dirs AND the snapshot
    # reader reconstructs the exact relation through them
    vals = {a["partitionValues"]["grp"] for a in adds}
    assert {"a:b", "c d", "plain"} <= vals
    got = DL.read_delta_snapshot(spark, t.path)
    assert _rows(got.select("id", "grp")) == _rows(df)
