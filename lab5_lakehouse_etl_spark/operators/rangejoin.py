"""Binned (banded) range join — the fact-fact interval join Spark
lacks natively.

A point-in-interval join with NO equi key (`p.x BETWEEN i.lo AND
i.hi`) falls back to BroadcastNestedLoopJoin in Spark: O(|points| x
|intervals|) comparisons, and only legal when one side broadcasts.
The standard engine technique (Databricks' range-join optimization,
DuckDB's IEJoin serves the same queries) is BINNING: quantize the
domain into fixed-width bins, send each point to its bin, replicate
each interval into every bin it overlaps, equi-join on the bin id,
then re-check the exact predicate. Each (point, interval) pair meets
in exactly one bin — the point's — so no dedup step is needed.

Cost model: shuffle is O(|points| + |intervals| * avg_bins_per_
interval); comparisons drop from |P| x |I| to pairs sharing a bin.
``bin_width`` trades replication (wide intervals / small bins) against
selectivity (narrow bins); a width near the typical interval length
keeps replication ~2x while making bin collisions rare. Skewed domains
(many intervals stacked on one value range) concentrate bins — at
scale, pick the width from a quantile sketch of interval lengths, and
salt a pathological hot bin like any skewed equi key
(operators/skew.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_BIN = "__bin"


def binned_interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    lo_col: str,
    hi_col: str,
    bin_width: float,
    lo_inclusive: bool = True,
    hi_inclusive: bool = False,
) -> DataFrame:
    """Join each point row to every interval row containing it.

    Returns points ⋈ intervals rows (all columns from both sides,
    helper bin column dropped). The interval side is replicated into
    ``floor(hi/W) - floor(lo/W) + 1`` bins via an exploded sequence —
    a narrow map — and the join itself is a plain equi-join on the bin
    id, so Catalyst plans a hash/sort-merge join (never a nested
    loop) and AQE handles size and skew as for any equi key.
    """
    if bin_width <= 0:
        raise ValueError("bin_width must be positive")

    def bin_of(c: Column) -> Column:
        return F.floor(c / F.lit(float(bin_width))).cast("long")

    p = points.withColumn(_BIN, bin_of(F.col(point_col)))
    iv = intervals.withColumn(
        _BIN,
        F.explode(F.sequence(bin_of(F.col(lo_col)), bin_of(F.col(hi_col)))),
    )
    lo_ok = (
        F.col(point_col) >= F.col(lo_col)
        if lo_inclusive
        else F.col(point_col) > F.col(lo_col)
    )
    hi_ok = (
        F.col(point_col) <= F.col(hi_col)
        if hi_inclusive
        else F.col(point_col) < F.col(hi_col)
    )
    return p.join(iv, _BIN).filter(lo_ok & hi_ok).drop(_BIN)
