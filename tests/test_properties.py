"""Property-based checks (hypothesis) for operators whose correctness
rests on a claimed algebraic identity — the rewrites are only safe if
they hold on adversarial inputs (nulls, duplicates, empty groups), not
just the fixtures."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from lab5_lakehouse_etl_spark.operators import relational as ops
from lab5_lakehouse_etl_spark.operators import skew

_key = st.one_of(st.none(), st.integers(0, 4))
_val = st.one_of(st.none(), st.integers(0, 3))
_rows = st.lists(st.tuples(_key, _val), min_size=0, max_size=25)

_SETTINGS = dict(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@given(data=_rows)
@settings(**_SETTINGS)
def test_rejected_keys_is_except_distinct(spark, data):
    """rejected_keys(df, k, cond) ≡ df.select(k) EXCEPT valid.select(k)
    for any row-local cond — including null keys and duplicate rows."""
    df = spark.createDataFrame(data, "k int, v int")
    cond = F.col("v").isNotNull() & (F.col("v") > 0)
    via_agg = ops.rejected_keys(df, ["k"], cond)
    via_except = df.select("k").subtract(df.filter(cond).select("k"))
    assert sorted(map(tuple, via_agg.collect()), key=str) == sorted(
        map(tuple, via_except.collect()), key=str
    )


@given(data=_rows)
@settings(**_SETTINGS)
def test_salted_agg_is_plain_agg(spark, data):
    df = spark.createDataFrame(data, "k int, v int")
    plain = df.groupBy("k").agg(
        F.sum("v").alias("s"), F.max("v").alias("m"), F.count("v").alias("c")
    )
    salted = skew.salted_agg(
        df, ["k"], {"s": ("v", "sum"), "m": ("v", "max"), "c": ("v", "count")},
        n_salts=4,
    )
    assert sorted(map(tuple, salted.select(*plain.columns).collect()), key=str) == sorted(
        map(tuple, plain.collect()), key=str
    )


@given(data=_rows)
@settings(**_SETTINGS)
def test_latest_wins_dedup_survivor(spark, data):
    """Exactly one survivor per key, and it carries the max order value
    (nulls lose), matching a driver-side reference computation."""
    df = spark.createDataFrame(data, "k int, v int")
    out = ops.latest_wins_dedup(df.filter(F.col("k").isNotNull()), ["k"], "v")
    got = {r.k: r.v for r in out.collect()}
    expect: dict[int, int | None] = {}
    for k, v in data:
        if k is None:
            continue
        if k not in expect:
            expect[k] = v
        else:
            cur = expect[k]
            if cur is None or (v is not None and v > cur):
                expect[k] = v
    assert got == expect


def test_sketch_quantile_error_bounded(spark):
    """GK-sketch quantile estimates stay within the rank-error bound
    implied by accuracy=10000 (1/accuracy relative rank error — on the
    fixture it is exact because group sizes are below the accuracy)."""
    from lab5_lakehouse_etl_spark import queries as Q
    from tests.conftest import SF_DIR

    Q.load_all()
    rows = Q.QUERIES["q_sketch_quantile"](spark, SF_DIR).collect()
    assert rows
    # the GK guarantee is on RANK error (<= n/accuracy), never on value
    # distance — at a heavy tail, adjacent order statistics can be far
    # apart in value while one rank apart
    from lab5_lakehouse_etl_spark.session import load_table

    vals: dict[str, list[float]] = {}
    for row in (
        load_table(spark, SF_DIR, "events").select("event_type", "value").collect()
    ):
        vals.setdefault(row["event_type"], []).append(row["value"])
    for r in rows:
        n = r["n"]
        group = sorted(vals[r["event_type"]])
        assert len(r["approx_p"]) == 3 and n == len(group)
        for approx, q in zip(r["approx_p"], (0.5, 0.95, 0.99)):
            assert approx is not None
            rank = sum(1 for v in group if v <= approx)
            assert abs(rank / n - q) <= n / 10000 / n + 2.0 / n, (
                r["event_type"], q, approx, rank / n,
            )
