"""Vendored Iceberg spec-v2 metadata writer: Avro container codec
round trips, golden metadata structure, snapshot round-trip fidelity
(scan == LakeTable.read at every version), manifest entry statuses and
sequence numbers, idempotent re-export, and loud refusal of
inexpressible features — the Iceberg twin of test_delta_log.py."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from lab5_lakehouse_etl_spark.lakehouse import LakeTable
from lab5_lakehouse_etl_spark.lakehouse import avro
from lab5_lakehouse_etl_spark.lakehouse import iceberg_meta as IM
from lab5_lakehouse_etl_spark.session import load_table
from tests.conftest import SF_DIR


def _rows(df):
    return sorted(map(tuple, df.collect()))


# ------------------------------------------------------------- avro codec


def test_avro_container_roundtrip(tmp_path):
    schema = {
        "type": "record",
        "name": "t",
        "fields": [
            {"name": "a", "type": "long"},
            {"name": "b", "type": ["null", "string"], "default": None},
            {"name": "c", "type": {"type": "array", "items": "int"}},
            {
                "name": "d",
                "type": {
                    "type": "record",
                    "name": "inner",
                    "fields": [
                        {"name": "x", "type": "double"},
                        {"name": "y", "type": "boolean"},
                    ],
                },
            },
            {"name": "e", "type": ["null", "bytes"], "default": None},
            {"name": "f", "type": {"type": "map", "values": "long"}},
        ],
    }
    recs = [
        {
            "a": -1,
            "b": "héllo",
            "c": [1, 2, 3],
            "d": {"x": 1.5, "y": True},
            "e": b"\x00\xff",
            "f": {"k": 9},
        },
        {
            "a": 2**62,
            "b": None,
            "c": [],
            "d": {"x": -2.25, "y": False},
            "e": None,
            "f": {},
        },
    ]
    avro.roundtrip_check(schema, recs)
    p = str(tmp_path / "t.avro")
    avro.write_container(p, schema, recs, metadata={"format-version": "2"})
    meta, out = avro.read_container(p)
    assert meta["format-version"] == "2"
    assert out == recs
    # byte-stable re-write (golden determinism incl. the sync marker)
    first = open(p, "rb").read()
    avro.write_container(p, schema, recs, metadata={"format-version": "2"})
    assert open(p, "rb").read() == first
    # empty files round-trip too (a manifest list can be empty)
    p2 = str(tmp_path / "e.avro")
    avro.write_container(p2, schema, [])
    assert avro.read_container(p2)[1] == []


def test_avro_varint_edges(tmp_path):
    schema = {
        "type": "record",
        "name": "v",
        "fields": [{"name": "n", "type": "long"}],
    }
    edges = [0, -1, 1, 63, 64, -64, -65, 2**31, -(2**31), 2**62, -(2**62)]
    recs = [{"n": n} for n in edges]
    p = str(tmp_path / "v.avro")
    avro.write_container(p, schema, recs)
    assert [r["n"] for r in avro.read_container(p)[1]] == edges


def test_avro_rejects_malformed(tmp_path):
    p = str(tmp_path / "bad.avro")
    with open(p, "wb") as fh:
        fh.write(b"PAR1 not avro")
    with pytest.raises(ValueError, match="not an Avro"):
        avro.read_container(p)
    schema = {
        "type": "record",
        "name": "v",
        "fields": [{"name": "n", "type": "long"}],
    }
    good = str(tmp_path / "good.avro")
    avro.write_container(good, schema, [{"n": 5}])
    data = open(good, "rb").read()
    with open(good, "wb") as fh:  # corrupt the block sync marker
        fh.write(data[:-1] + bytes([data[-1] ^ 0xFF]))
    with pytest.raises(ValueError, match="sync marker"):
        avro.read_container(good)


# ------------------------------------------------------- metadata writer


@pytest.fixture()
def nation_table(spark, tmp_path):
    nation = load_table(spark, SF_DIR, "nation")
    t = LakeTable.create(
        nation, str(tmp_path / "t"), partition_by=["n_regionkey"]
    )
    return t, nation


def test_export_golden_metadata_structure(spark, nation_table):
    t, nation = nation_table
    meta_dir = IM.export_iceberg_metadata(t)
    hint = open(os.path.join(meta_dir, "version-hint.text")).read()
    assert hint == "1"
    doc = json.load(open(os.path.join(meta_dir, "v1.metadata.json")))
    assert doc["format-version"] == 2
    assert doc["last-column-id"] == len(nation.columns)
    (schema,) = doc["schemas"]
    assert [f["name"] for f in schema["fields"]] == nation.columns
    assert {f["id"] for f in schema["fields"]} == set(
        range(1, len(nation.columns) + 1)
    )
    (spec,) = doc["partition-specs"]
    assert spec["fields"] == [
        {
            "name": "n_regionkey",
            "transform": "identity",
            "source-id": schema["fields"][
                nation.columns.index("n_regionkey")
            ]["id"],
            "field-id": 1000,
        }
    ]
    (snap,) = doc["snapshots"]
    assert snap["sequence-number"] == 1
    assert snap["summary"]["operation"] == "append"
    # the manifest list is a REAL avro container with one data manifest
    meta, manifests = avro.read_container(snap["manifest-list"])
    assert meta["format-version"] == "2"
    (mf,) = manifests
    assert mf["content"] == 0 and mf["deleted_files_count"] == 0
    assert mf["added_rows_count"] == 25
    m_meta, entries = avro.read_container(mf["manifest_path"])
    assert m_meta["content"] == "data" and m_meta["partition-spec-id"] == "0"
    assert all(e["status"] == 1 for e in entries)
    assert sum(e["data_file"]["record_count"] for e in entries) == 25
    for e in entries:
        df_rec = e["data_file"]
        assert df_rec["file_format"] == "PARQUET"
        assert os.path.isfile(df_rec["file_path"])
        pv = df_rec["partition"]["n_regionkey"]
        assert isinstance(pv, int)  # typed, not a hive string
        assert f"n_regionkey={pv}/" in df_rec["file_path"]
    # idempotent re-export is byte-stable
    before = {
        f: open(os.path.join(meta_dir, f), "rb").read()
        for f in sorted(os.listdir(meta_dir))
    }
    IM.export_iceberg_metadata(t)
    after = {
        f: open(os.path.join(meta_dir, f), "rb").read()
        for f in sorted(os.listdir(meta_dir))
    }
    assert before == after


def test_snapshot_roundtrip_and_statuses_across_versions(
    spark, nation_table
):
    t, nation = nation_table
    v0_expected = _rows(t.read(spark))
    # touch ONE region so the other partitions' files carry over as
    # EXISTING entries (an all-partition rewrite would leave none)
    upd = nation.filter(F.col("n_regionkey") == 0).withColumn(
        "n_name", F.lit("ib-updated")
    )
    t.merge(spark, upd, key=["n_nationkey"])
    IM.export_iceberg_metadata(t)
    got = IM.read_iceberg_snapshot(spark, t.path)
    assert _rows(got.select(*t.read(spark).columns)) == _rows(t.read(spark))
    doc = IM._load_metadata(t.path)
    s0, s1 = doc["snapshots"]
    assert s1["parent-snapshot-id"] == s0["snapshot-id"]
    assert s1["summary"]["operation"] == "overwrite"
    # v2 statuses: merge rewrote touched partitions -> the second
    # manifest carries ADDED + EXISTING + DELETED entries, and
    # EXISTING/DELETED keep their ORIGINAL data sequence number
    (mf,) = avro.read_container(s1["manifest-list"])[1]
    entries = avro.read_container(mf["manifest_path"])[1]
    by_status: dict[int, list] = {}
    for e in entries:
        by_status.setdefault(e["status"], []).append(e)
    assert set(by_status) == {0, 1, 2}
    assert all(e["sequence_number"] == 2 for e in by_status[1])
    assert all(e["sequence_number"] == 1 for e in by_status[0])
    assert all(e["sequence_number"] == 1 for e in by_status[2])
    assert mf["deleted_files_count"] == len(by_status[2])
    # time travel by snapshot id reconstructs the original write
    got_v0 = IM.read_iceberg_snapshot(
        spark, t.path, snapshot_id=s0["snapshot-id"]
    )
    assert _rows(got_v0.select(*nation.columns)) == v0_expected


def test_export_widens_small_ints_spec_conform(spark, tmp_path):
    """r15: tinyint/smallint EXPORT as ``int`` — the Iceberg spec has
    no 8/16-bit primitives and parquet stores them as physical INT32,
    so the widening is lossless and is what real writers do; the
    source Spark types are recorded in graft.source-widened-types and
    the reader round-trips the values under int."""
    import json as _json

    df = spark.createDataFrame(
        [(i,) for i in range(6)], "id long"
    ).selectExpr(
        "id",
        "CAST(id - 3 AS TINYINT) AS b",
        "CAST(id * 300 AS SMALLINT) AS s",
    )
    t3 = LakeTable.create(df, str(tmp_path / "ty"))
    IM.export_iceberg_metadata(t3)
    doc = IM._load_metadata(t3.path)
    types = {
        f["name"]: f["type"]
        for f in doc["schemas"][doc["current-schema-id"]]["fields"]
    }
    assert types["b"] == "int" and types["s"] == "int"
    widened = _json.loads(doc["properties"]["graft.source-widened-types"])
    assert widened == {"b": "byte", "s": "short"}
    back = IM.read_iceberg_snapshot(spark, t3.path)
    assert dict(back.dtypes)["b"] == "int"
    assert sorted((r.id, r.b, r.s) for r in back.collect()) == [
        (i, i - 3, i * 300) for i in range(6)
    ]


def test_export_refuses_inexpressible_types():
    """The refusal now covers only what the spec genuinely cannot
    state — an interval (or any unknown) primitive still refuses
    loudly instead of guessing."""
    with pytest.raises(NotImplementedError, match="no exact Iceberg"):
        IM._iceberg_field_type("interval")
    with pytest.raises(NotImplementedError, match="no exact Iceberg"):
        IM._iceberg_field_type("calendarinterval")


def test_rename_and_drop_export_with_name_mapping(spark, nation_table):
    """Column mapping exports faithfully (r13): a metadata-only rename
    keeps the column's field id (ids key on the PHYSICAL name), the
    schema.name-mapping.default property resolves the parquet files'
    physical names to ids, and a drop retires the field from the
    current schema while time travel shows every generation under its
    own names."""
    t, nation = nation_table
    t.rename_column("n_name", "nation_label")  # v1: metadata-only
    extra = nation.select(
        (F.col("n_nationkey") + 100).alias("n_nationkey"),
        F.lit("renamed-extra").alias("nation_label"),
        *[c for c in nation.columns if c not in ("n_nationkey", "n_name")],
    )
    t.append(spark, extra)  # v2: files written under the PHYSICAL name
    t.drop_column("nation_label")  # v3
    IM.export_iceberg_metadata(t)
    doc = IM._load_metadata(t.path)

    # stable ids across the rename; the drop retires the field
    ids = [
        [(f["id"], f["name"]) for f in s["fields"]] for s in doc["schemas"]
    ]
    assert ids[0] == [(1, "n_nationkey"), (2, "n_name"), (3, "n_regionkey")]
    assert ids[1] == [
        (1, "n_nationkey"), (2, "nation_label"), (3, "n_regionkey"),
    ]
    assert ids[2] == [(1, "n_nationkey"), (3, "n_regionkey")]

    # the name mapping carries the physical name FIRST plus aliases
    nmap = {
        r["field-id"]: r["names"]
        for r in json.loads(
            doc["properties"]["schema.name-mapping.default"]
        )
    }
    assert nmap[2] == ["n_name", "nation_label"]

    # reads at every generation, exclusively through the metadata
    snaps = [s["snapshot-id"] for s in doc["snapshots"]]
    got = IM.read_iceberg_snapshot(spark, t.path)
    want = t.read(spark)
    assert got.columns == ["n_nationkey", "n_regionkey"]
    assert _rows(got.select(*want.columns)) == _rows(want)
    v2 = IM.read_iceberg_snapshot(spark, t.path, snapshot_id=snaps[2])
    assert v2.columns == ["n_nationkey", "nation_label", "n_regionkey"]
    assert v2.count() == 2 * nation.count()
    assert v2.filter(F.col("nation_label") == "renamed-extra").count() == (
        nation.count()
    )
    v0 = IM.read_iceberg_snapshot(spark, t.path, snapshot_id=snaps[0])
    assert v0.columns == list(nation.columns)
    assert _rows(v0.select(*nation.columns)) == _rows(nation)


def test_null_partition_and_schema_evolution(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, "a"), (2, None), (3, "b")], "id long, grp string"
    )
    t = LakeTable.create(df, str(tmp_path / "np"), partition_by=["grp"])
    src = spark.createDataFrame(
        [(1, "x", 7), (4, "c", 9)], "id long, grp string, extra long"
    )
    t.merge(spark, src, key=["id"], evolve_schema=True)
    IM.export_iceberg_metadata(t)
    doc = IM._load_metadata(t.path)
    # evolution appended a schema; ids of pre-existing columns stable
    assert len(doc["schemas"]) == 2
    ids0 = {f["name"]: f["id"] for f in doc["schemas"][0]["fields"]}
    ids1 = {f["name"]: f["id"] for f in doc["schemas"][1]["fields"]}
    assert ids1["id"] == ids0["id"] and ids1["grp"] == ids0["grp"]
    assert ids1["extra"] == len(ids0) + 1
    assert doc["snapshots"][0]["schema-id"] == 0
    assert doc["snapshots"][1]["schema-id"] == 1
    got = IM.read_iceberg_snapshot(spark, t.path)
    assert _rows(got.select("id", "grp", "extra")) == _rows(
        t.read(spark).select("id", "grp", "extra")
    )
    # the hive default partition round-trips as a NULL partition value
    vals = {r.grp for r in got.collect()}
    assert None in vals


# ----------------------------------------------- position deletes (DVs)


def test_position_delete_export_roundtrip(spark, nation_table):
    """DV-bearing tables export as spec-v2 position deletes (r12
    verdict next-round #3) instead of refusing: DELETE manifests
    (content=1) under an unpartitioned spec, delete files sorted by
    (file_path, pos) with the reserved field ids, sequence-numbered at
    the delete_dv commit so the <= application rule reproduces
    LakeTable's carry-forward semantics — files appended AFTER a DV
    are untouched by it, proven by the time-travel reads below."""
    t, nation = nation_table
    t.delete_dv(spark, F.col("n_nationkey") % 3 == 0)  # v1, seq 2
    extra = nation.select(
        (F.col("n_nationkey") + 100).alias("n_nationkey"),
        F.lit("extra").alias("n_name"),
        *[c for c in nation.columns if c not in ("n_nationkey", "n_name")],
    )
    t.append(spark, extra)  # v2, seq 3
    t.delete_dv(spark, F.col("n_nationkey") % 5 == 1)  # v3, seq 4
    IM.export_iceberg_metadata(t)
    doc = IM._load_metadata(t.path)
    snaps = doc["snapshots"]
    assert [s["summary"]["operation"] for s in snaps] == [
        "append", "delete", "append", "delete",
    ]

    # current snapshot == LakeTable's own DV-aware read
    got = IM.read_iceberg_snapshot(spark, t.path)
    want = t.read(spark)
    assert _rows(got.select(*want.columns)) == _rows(want)

    # time travel to v1: ONLY the first delete applies
    got_v1 = IM.read_iceberg_snapshot(
        spark, t.path, snapshot_id=snaps[1]["snapshot-id"]
    )
    exp_v1 = nation.filter(~(F.col("n_nationkey") % 3 == 0))
    assert _rows(got_v1.select(*nation.columns)) == _rows(exp_v1)

    # time travel to v0: no deletes at all
    got_v0 = IM.read_iceberg_snapshot(
        spark, t.path, snapshot_id=snaps[0]["snapshot-id"]
    )
    assert _rows(got_v0.select(*nation.columns)) == _rows(nation)

    # v2 (the append): first delete applies, appended rows intact —
    # the sequence rule at work (delete seq 2 < appended file seq 3)
    got_v2 = IM.read_iceberg_snapshot(
        spark, t.path, snapshot_id=snaps[2]["snapshot-id"]
    )
    assert got_v2.count() == exp_v1.count() + extra.count()


def test_position_delete_file_layout(spark, nation_table):
    """Spec-fidelity pins on the emitted artifacts: delete manifest
    content flags, unpartitioned spec id, delete-file sort order and
    reserved parquet field ids, and per-delete sequence numbers."""
    import pyarrow.parquet as pq

    t, nation = nation_table
    t.delete_dv(spark, F.col("n_nationkey") % 3 == 0)
    t.delete_dv(spark, F.col("n_nationkey") % 5 == 1)
    IM.export_iceberg_metadata(t)
    doc = IM._load_metadata(t.path)
    last = doc["snapshots"][-1]
    rows = avro.read_container(last["manifest-list"])[1]
    data_mf = [r for r in rows if r["content"] == 0]
    del_mf = [r for r in rows if r["content"] == 1]
    assert len(data_mf) == 1 and len(del_mf) == 1
    unpart = next(
        s["spec-id"] for s in doc["partition-specs"] if s["fields"] == []
    )
    assert del_mf[0]["partition_spec_id"] == unpart
    entries = avro.read_container(del_mf[0]["manifest_path"])[1]
    assert len(entries) == 2  # one ADDED (seq 3), one EXISTING (seq 2)
    by_seq = sorted(e["sequence_number"] for e in entries)
    assert by_seq == [2, 3]
    statuses = {e["sequence_number"]: e["status"] for e in entries}
    assert statuses[3] == 1 and statuses[2] == 0
    for e in entries:
        rec = e["data_file"]
        assert rec["content"] == 1 and rec["file_format"] == "PARQUET"
        tbl = pq.read_table(rec["file_path"])
        assert rec["record_count"] == tbl.num_rows
        # sorted by (file_path, pos), reserved field ids stamped
        pairs = list(
            zip(
                tbl.column("file_path").to_pylist(),
                tbl.column("pos").to_pylist(),
            )
        )
        assert pairs == sorted(pairs)
        sch = pq.ParquetFile(rec["file_path"]).schema_arrow
        assert (
            sch.field("file_path").metadata[b"PARQUET:field_id"]
            == str(IM._POS_DELETE_PATH_ID).encode()
        )
        assert (
            sch.field("pos").metadata[b"PARQUET:field_id"]
            == str(IM._POS_DELETE_POS_ID).encode()
        )
        # pointer paths are manifest-form (no file: scheme) and name
        # real exported data files
        data_entries = avro.read_container(data_mf[0]["manifest_path"])[1]
        known = {e2["data_file"]["file_path"] for e2 in data_entries}
        assert all(p in known for p, _ in pairs)


def test_optimize_materializes_deletes_away(spark, nation_table):
    """After OPTIMIZE rewrites the DV'd files, re-export carries
    status=DELETED delete-manifest entries (changelog consumers see
    the delete files retire) and the scan needs no delete application."""
    t, nation = nation_table
    t.delete_dv(spark, F.col("n_nationkey") % 3 == 0)
    t.optimize(spark)
    IM.export_iceberg_metadata(t)
    doc = IM._load_metadata(t.path)
    last = doc["snapshots"][-1]
    rows = avro.read_container(last["manifest-list"])[1]
    del_mf = [r for r in rows if r["content"] == 1]
    if del_mf:  # retire entries present exactly once, all DELETED
        entries = avro.read_container(del_mf[0]["manifest_path"])[1]
        assert all(e["status"] == 2 for e in entries)
    got = IM.read_iceberg_snapshot(spark, t.path)
    want = t.read(spark)
    assert _rows(got.select(*want.columns)) == _rows(want)


def test_bounds_export_and_file_pruning(spark, tmp_path):
    """Per-column bounds land in the manifest entries (Appendix-D
    single-value serialization) and the reader's prune hint eliminates
    disjoint files BEFORE the scan: 8 range-partitioned files, a
    1000-key range touches exactly the file(s) whose bounds overlap —
    and values equal the unpruned read under the same predicate."""
    orders = load_table(spark, SF_DIR, "orders")
    t = LakeTable.create(
        orders.repartitionByRange(8, "o_orderkey"), str(tmp_path / "t")
    )
    IM.export_iceberg_metadata(t)
    doc = IM._load_metadata(t.path)
    (snap,) = doc["snapshots"]
    (mf,) = IM.avro.read_container(snap["manifest-list"])[1]
    entries = IM.avro.read_container(mf["manifest_path"])[1]
    id_of = {
        f["name"]: f["id"] for f in doc["schemas"][0]["fields"]
    }
    kid = id_of["o_orderkey"]
    los, his = [], []
    for e in entries:
        lo = {r["key"]: r["value"] for r in e["data_file"]["lower_bounds"]}
        hi = {r["key"]: r["value"] for r in e["data_file"]["upper_bounds"]}
        los.append(IM.deserialize_bound(bytes(lo[kid]), "long"))
        his.append(IM.deserialize_bound(bytes(hi[kid]), "long"))
    # 8 files with disjoint, ordered key ranges
    order = sorted(range(len(los)), key=lambda i: los[i])
    for a, b in zip(order, order[1:]):
        assert his[a] < los[b]

    from pyspark.sql import functions as F

    full = IM.read_iceberg_snapshot(spark, t.path)
    pruned = IM.read_iceberg_snapshot(
        spark, t.path, prune={"o_orderkey": (500, 1500)}
    )
    n_full = full.select(F.input_file_name()).distinct().count()
    n_pruned = pruned.select(F.input_file_name()).distinct().count()
    assert n_full == 8 and n_pruned < n_full
    a = full.filter("o_orderkey BETWEEN 500 AND 1500")
    b = pruned.filter("o_orderkey BETWEEN 500 AND 1500")
    assert _rows(a) == _rows(b)
    # a range past the table prunes EVERYTHING and still returns an
    # empty, well-typed relation
    none = IM.read_iceberg_snapshot(
        spark, t.path, prune={"o_orderkey": (10**12, 10**12 + 5)}
    )
    assert none.count() == 0 and none.columns == full.columns


def test_nested_types_export_with_element_ids(spark, tmp_path):
    """Nested struct/list/map columns export spec-v2 schemas with
    UNIQUE element-level field ids (struct members, list element, map
    key/value — allocated by dotted-path first appearance, so schema
    evolution keeps v1 ids stable), last-column-id covers them, and
    the snapshot reader reconstructs the nested Spark schema from the
    metadata alone with values intact."""
    from pyspark.sql import functions as F

    df = spark.range(0, 20).select(
        F.col("id").alias("k"),
        F.struct(
            (F.col("id") * 2).alias("a"), F.lit("s").alias("b")
        ).alias("st"),
        F.array(F.col("id"), F.col("id") + 1).alias("arr"),
        F.create_map(F.lit("v"), F.col("id").cast("double")).alias("mp"),
    )
    path = str(tmp_path / "t")
    t = LakeTable.create(df.coalesce(1), path)
    IM.export_iceberg_metadata(t)
    meta = IM._load_metadata(path)
    schema = meta["schemas"][meta["current-schema-id"]]

    ids: list[int] = []

    def walk(ftype):
        if not isinstance(ftype, dict):
            return
        if ftype["type"] == "struct":
            for f in ftype["fields"]:
                ids.append(f["id"])
                walk(f["type"])
        elif ftype["type"] == "list":
            ids.append(ftype["element-id"])
            walk(ftype["element"])
        elif ftype["type"] == "map":
            ids.append(ftype["key-id"])
            walk(ftype["key"])
            ids.append(ftype["value-id"])
            walk(ftype["value"])

    walk(schema)
    assert len(ids) == len(set(ids)) == 9  # 4 top + 2 struct + 1 el + k/v
    assert meta["last-column-id"] == max(ids)
    by_name = {f["name"]: f for f in schema["fields"]}
    assert by_name["arr"]["type"]["element-required"] is True  # array() lits
    assert by_name["mp"]["type"]["key"] == "string"
    assert by_name["mp"]["type"]["value"] == "double"

    back = IM.read_iceberg_snapshot(spark, path)
    got = {
        (r.k, r.st.a, r.st.b, tuple(r.arr), r.mp["v"])
        for r in back.collect()
    }
    want = {
        (r.k, r.st.a, r.st.b, tuple(r.arr), r.mp["v"])
        for r in df.collect()
    }
    assert got == want

    # evolution: a second version adding a nested column keeps every
    # v1 id (dotted-path stability) and extends last-column-id
    upd = df.withColumn(
        "st2", F.struct(F.lit(7).alias("z"))
    )
    t.merge(spark, upd, key=["k"], evolve_schema=True)
    IM.export_iceberg_metadata(t)
    meta2 = IM._load_metadata(path)
    v1 = meta2["schemas"][0]
    v2 = meta2["schemas"][-1]

    def id_map(schema_doc, out, prefix=""):
        for f in schema_doc["fields"]:
            out[prefix + f["name"]] = f["id"]
            if isinstance(f["type"], dict) and f["type"]["type"] == "struct":
                id_map(f["type"], out, prefix + f["name"] + ".")
        return out

    m1 = id_map(v1, {})
    m2 = id_map(v2, {})
    for k, v in m1.items():
        assert m2[k] == v, f"field id moved for {k}"
    assert meta2["last-column-id"] > meta["last-column-id"]
    back2 = IM.read_iceberg_snapshot(spark, path)
    assert back2.count() == 20 and "st2" in back2.columns


def test_avro_source_reader(spark, tmp_path):
    """sources.readers.read_avro: header-only schema probe, multi-file
    distributed decode, nullable unions, a hand-built DEFLATE-coded
    foreign file, and the loud refusals (nested types, non-record
    schemas)."""
    import zlib

    from lab5_lakehouse_etl_spark.lakehouse import avro as A
    from lab5_lakehouse_etl_spark.sources.readers import read_avro

    schema = {
        "type": "record",
        "name": "r",
        "fields": [
            {"name": "k", "type": "long"},
            {"name": "s", "type": "string"},
            {"name": "opt", "type": ["null", "double"]},
        ],
    }
    rows = [
        {"k": i, "s": f"s{i}", "opt": None if i % 3 == 0 else i / 2}
        for i in range(40)
    ]
    for i in range(2):
        A.write_container(
            str(tmp_path / f"p{i}.avro"),
            schema,
            [r for r in rows if r["k"] % 2 == i],
        )
    # a third file written by a "foreign" deflate-coded writer:
    # re-encode p0's block with raw-deflate and the codec stamped
    import json as _json
    import struct as _struct

    body = bytearray()
    part = [r for r in rows if r["k"] % 2 == 0]
    for rec in part:
        A.encode(body, schema, rec)
    meta = {
        "avro.schema": _json.dumps(schema).encode(),
        "avro.codec": b"deflate",
    }
    out = bytearray(A.MAGIC)
    A._write_long(out, len(meta))
    for kk, vv in meta.items():
        A._write_bytes(out, kk.encode())
        A._write_bytes(out, vv)
    A._write_long(out, 0)
    sync = b"\x07" * 16
    out += sync
    comp = zlib.compress(bytes(body), 6)[2:-4]  # raw deflate framing
    A._write_long(out, len(part))
    A._write_long(out, len(comp))
    out += comp + sync
    (tmp_path / "p2.avro").write_bytes(bytes(out))

    # header-only probe agrees with the writer schema
    _m, got_schema = A.read_schema(str(tmp_path / "p0.avro"))
    assert got_schema == schema

    df = read_avro(spark, str(tmp_path / "*.avro"))
    assert dict(df.dtypes) == {"k": "bigint", "s": "string", "opt": "double"}
    got = sorted((r.k, r.s, r.opt) for r in df.collect())
    want = sorted(
        [(r["k"], r["s"], r["opt"]) for r in rows]
        + [(r["k"], r["s"], r["opt"]) for r in part]  # p2 duplicates p0
    )
    assert got == want

    # refusals: nested types and non-record schemas never half-read
    nested = {
        "type": "record",
        "name": "n",
        "fields": [
            {"name": "a", "type": {"type": "array", "items": "long"}}
        ],
    }
    A.write_container(str(tmp_path / "nested.avro"), nested, [])
    with pytest.raises(NotImplementedError, match="nested"):
        read_avro(spark, str(tmp_path / "nested.avro"))
    A.write_container(str(tmp_path / "bare.avro"), "long", [1, 2])
    with pytest.raises(NotImplementedError, match="record"):
        read_avro(spark, str(tmp_path / "bare.avro"))


def test_avro_source_mixed_schema_glob_refuses(spark, tmp_path):
    """r14 advice: a glob mixing writer schemas must refuse loudly —
    the DataFrame is typed from the FIRST file's header, and decoding
    the divergent file against it would silently yield None for its
    missing columns and drop its extras.  Every file's embedded
    writer schema is now checked executor-side against the probed
    contract."""
    from lab5_lakehouse_etl_spark.lakehouse import avro as A
    from lab5_lakehouse_etl_spark.sources.readers import read_avro

    s1 = {
        "type": "record",
        "name": "r",
        "fields": [{"name": "k", "type": "long"}],
    }
    s2 = {
        "type": "record",
        "name": "r",
        "fields": [
            {"name": "k", "type": "long"},
            {"name": "extra", "type": "string"},
        ],
    }
    A.write_container(str(tmp_path / "a0.avro"), s1, [{"k": 1}])
    A.write_container(
        str(tmp_path / "a1.avro"), s2, [{"k": 2, "extra": "x"}]
    )
    df = read_avro(spark, str(tmp_path / "*.avro"))
    with pytest.raises(Exception, match="mixed writer schemas"):
        df.collect()
    # same-schema glob still reads clean after the check landed
    A.write_container(str(tmp_path / "b0.avro"), s1, [{"k": 1}])
    A.write_container(str(tmp_path / "b1.avro"), s1, [{"k": 2}])
    ok = read_avro(spark, str(tmp_path / "b*.avro"))
    assert sorted(r.k for r in ok.collect()) == [1, 2]
