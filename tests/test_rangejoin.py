"""Unit tests for operators/rangejoin.binned_interval_join: bound
inclusivity, intervals spanning many bins, negative domains, and the
no-duplicate guarantee (each matching pair appears exactly once even
when the interval replicates into several bins)."""

from __future__ import annotations

import pytest

from lab5_lakehouse_etl_spark.operators.rangejoin import binned_interval_join


def _points(spark, xs):
    return spark.createDataFrame([(float(x),) for x in xs], "x double")


def _intervals(spark, rows):
    return spark.createDataFrame(
        [(n, float(lo), float(hi)) for n, lo, hi in rows],
        "name string, lo double, hi double",
    )


def test_half_open_default_bounds(spark):
    out = binned_interval_join(
        _points(spark, [0, 5, 10]),
        _intervals(spark, [("a", 0, 10)]),
        "x", "lo", "hi", bin_width=4.0,
    )
    xs = sorted(r.x for r in out.collect())
    assert xs == [0.0, 5.0]  # lo inclusive, hi exclusive


def test_inclusive_hi(spark):
    out = binned_interval_join(
        _points(spark, [10]),
        _intervals(spark, [("a", 0, 10)]),
        "x", "lo", "hi", bin_width=4.0, hi_inclusive=True,
    )
    assert out.count() == 1


def test_interval_spanning_many_bins_matches_once(spark):
    # interval covers 26 bins of width 1; every inner point matches
    # exactly once (the pair meets only in the point's own bin)
    out = binned_interval_join(
        _points(spark, [0.5, 12.5, 24.5]),
        _intervals(spark, [("wide", 0, 25)]),
        "x", "lo", "hi", bin_width=1.0,
    )
    assert out.count() == 3
    per_pair = (
        out.groupBy("x", "name").count().filter("count > 1").count()
    )
    assert per_pair == 0
    # duplicate point ROWS are preserved (bag semantics, like any join)
    dup = binned_interval_join(
        _points(spark, [12.5, 12.5]),
        _intervals(spark, [("wide", 0, 25)]),
        "x", "lo", "hi", bin_width=1.0,
    )
    assert dup.count() == 2


def test_negative_domain(spark):
    out = binned_interval_join(
        _points(spark, [-7.5, -0.1, 3.0]),
        _intervals(spark, [("neg", -8, 0)]),
        "x", "lo", "hi", bin_width=3.0,
    )
    xs = sorted(r.x for r in out.collect())
    assert xs == [-7.5, -0.1]


def test_overlapping_intervals_all_match(spark):
    out = binned_interval_join(
        _points(spark, [5]),
        _intervals(spark, [("a", 0, 10), ("b", 4, 6), ("c", 6, 8)]),
        "x", "lo", "hi", bin_width=2.0,
    )
    names = sorted(r.name for r in out.collect())
    assert names == ["a", "b"]


def test_rejects_bad_width(spark):
    with pytest.raises(ValueError):
        binned_interval_join(
            _points(spark, [1]),
            _intervals(spark, [("a", 0, 1)]),
            "x", "lo", "hi", bin_width=0.0,
        )
