"""delta-spark interchange parity (lakehouse/delta_adapter.py).

Round-trips one table through BOTH backends — the real Delta protocol
via the adapter and LakeTable's JSON-manifest engine — and asserts the
same results for create / merge / delete / time travel / OPTIMIZE /
history depth, matching the reference's actual storage engine
(/root/reference/requirements.txt:2 delta-spark, MERGE shape at
jobs/order_glue_job.py:151-155).

INSTALL-BLOCKED IN THIS SANDBOX: delta-spark is not installed and the
environment forbids pip, so every test here skips with the reason
below.  On a cluster with the package, run this module STANDALONE
(``pytest tests/test_delta_adapter.py``): delta-spark needs its SQL
extension + catalog wired at session CREATION, which cannot be
retrofitted onto the suite's shared session.
"""

from __future__ import annotations

import shutil
import tempfile

import pytest

from lab5_lakehouse_etl_spark.lakehouse import LakeTable, delta_adapter as DA

pytestmark = pytest.mark.skipif(
    not DA.delta_available(),
    reason="delta-spark not installed (sandbox forbids pip; see module "
    "docstring — run standalone on a delta-enabled cluster)",
)


@pytest.fixture(scope="module")
def dspark():
    from pyspark.sql import SparkSession

    active = SparkSession.getActiveSession()
    if active is not None:
        # extensions only apply at creation — a shared plain session
        # cannot become a Delta session
        active.stop()
    builder = SparkSession.builder.master("local[4]").appName(
        "delta-adapter-parity"
    )
    spark = DA.configure_session(builder).getOrCreate()
    yield spark
    spark.stop()


@pytest.fixture()
def paths():
    d = tempfile.mkdtemp(prefix="delta_parity_")
    yield f"{d}/delta_tbl", f"{d}/lake_tbl"
    shutil.rmtree(d, ignore_errors=True)


def _rows(df):
    return sorted(tuple(r) for r in df.select("k", "v", "amt").collect())


def _fixture_df(spark, data):
    return spark.createDataFrame(data, "k long, v string, amt double")


def test_create_read_parity(dspark, paths):
    dpath, lpath = paths
    df = _fixture_df(dspark, [(1, "a", 10.0), (2, "b", 20.0)])
    DA.write_delta(df, dpath)
    LakeTable.create(df, lpath)
    assert _rows(DA.read_delta(dspark, dpath)) == _rows(
        LakeTable(lpath).read(dspark)
    )


def test_merge_delete_time_travel_parity(dspark, paths):
    dpath, lpath = paths
    from pyspark.sql import functions as F

    v0 = _fixture_df(dspark, [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)])
    DA.write_delta(v0, dpath)
    lt = LakeTable.create(v0, lpath)
    # unpartitioned merge + delete are both full rewrites; the default
    # retain_versions=2 vacuum at the delete commit would physically
    # drop v0's files and break the time-travel parity read below
    lt.retain_versions = 3

    # MERGE: update k=2, insert k=4 (update-all / insert-all)
    src = _fixture_df(dspark, [(2, "B", 22.0), (4, "d", 40.0)])
    DA.merge_delta(dspark, dpath, src, key=["k"])
    lt.merge(dspark, src, key=["k"])
    assert _rows(DA.read_delta(dspark, dpath)) == _rows(lt.read(dspark))

    # DELETE
    DA.delete_delta(dspark, dpath, F.col("k") == 3)
    lt.delete(dspark, F.col("k") == 3)
    assert _rows(DA.read_delta(dspark, dpath)) == _rows(lt.read(dspark))

    # time travel back to v0
    assert _rows(DA.read_delta(dspark, dpath, version=0)) == _rows(
        lt.read(dspark, version=0)
    )

    # history depth: create + merge + delete = 3 commits on both
    assert DA.history_delta(dspark, dpath).count() == 3
    assert lt.version() == 2  # 0-based versions, same 3 snapshots


def test_optimize_preserves_rows(dspark, paths):
    dpath, lpath = paths
    df = _fixture_df(
        dspark, [(i, chr(97 + i % 26), float(i)) for i in range(100)]
    ).repartition(8)
    DA.write_delta(df, dpath)
    lt = LakeTable.create(df, lpath)
    before = _rows(DA.read_delta(dspark, dpath))
    DA.optimize_delta(dspark, dpath, zorder_by=["k"])
    lt.optimize(dspark, zorder_by=["k"])
    assert _rows(DA.read_delta(dspark, dpath)) == before
    assert _rows(lt.read(dspark)) == before


def test_cdf_matches_laketable_changes(dspark, paths):
    dpath, lpath = paths
    v0 = _fixture_df(dspark, [(1, "a", 10.0), (2, "b", 20.0)])
    DA.write_delta(v0, dpath)
    lt = LakeTable.create(v0, lpath)
    src = _fixture_df(dspark, [(2, "B", 22.0), (3, "c", 30.0)])
    DA.merge_delta(dspark, dpath, src, key=["k"])
    lt.merge(dspark, src, key=["k"])
    # Delta CDF spells the update images "update_preimage"/"update_postimage";
    # LakeTable.changes uses "update_pre"/"update_post" — normalize
    norm = {"update_preimage": "update_pre", "update_postimage": "update_post"}
    delta_changed = {
        (r.k, norm.get(r._change_type, r._change_type))
        for r in DA.changes_delta(dspark, dpath, starting_version=1)
        .select("k", "_change_type")
        .collect()
    }
    # Delta's startingVersion=1 feeds the changes COMMITTED IN v1 (the
    # merge); LakeTable.changes takes base/target SNAPSHOTS, so the
    # equivalent diff is v0 -> latest
    lake_changed = {
        (r.k, r._change_type)
        for r in lt.changes(dspark, key=["k"], from_version=0)
        .select("k", "_change_type")
        .collect()
    }
    assert delta_changed == lake_changed
