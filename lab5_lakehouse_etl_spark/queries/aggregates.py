"""Aggregation declared queries (SURVEY §2.4 + extension surface).

The reference only ever counts (A1/A4) and distincts (A2/A3); the full
groupBy/rollup/cube/stats surface is the north-star extension. Floating
sums are rounded in BOTH engines: double accumulation order differs
between Spark partial-aggregates and DuckDB, so raw doubles can differ
in the last ulp. Fixture prices have 2 decimals, so rounding sums to 2
decimals is exact and stable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..session import load_table
from . import query


@query(
    "q_agg_groupby",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2)      AS sum_qty,
           round(sum(l_extendedprice), 2) AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
           round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
           round(avg(l_quantity), 4)      AS avg_qty,
           round(avg(l_extendedprice), 4) AS avg_price,
           round(avg(l_discount), 4)      AS avg_disc,
           CAST(count(*) AS BIGINT)       AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q_agg_groupby(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: TPC-H Q1-shaped grouped aggregation. Map-side partial
    aggregation means the shuffle carries ~|groups|×partitions rows, not
    the scan — the plan that survives 100 TB. Filter pushes to the scan."""
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@query(
    "q_agg_having",
    oracle="""
    SELECT o_custkey,
           CAST(count(*) AS BIGINT)        AS n_orders,
           round(sum(o_totalprice), 2)     AS revenue
    FROM orders
    GROUP BY o_custkey
    HAVING count(*) >= 5
    """,
)
def q_agg_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Post-aggregation filter (HAVING). Catalyst keeps the filter above
    the aggregate — no second shuffle."""
    return (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
        )
        .filter(F.col("n_orders") >= 5)
    )


@query(
    "q_agg_countd",
    oracle="""
    SELECT l_returnflag,
           CAST(count(DISTINCT l_partkey) AS BIGINT) AS n_parts,
           CAST(count(DISTINCT l_suppkey) AS BIGINT) AS n_supps,
           CAST(count(*) AS BIGINT)                  AS n_rows
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def q_agg_countd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi count(DISTINCT) — Spark plans this as expand + two-phase
    aggregate; exact, unlike approx_count_distinct (declared separately
    rows-only since HLL estimates are engine-specific)."""
    return (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_partkey").alias("n_parts"),
            F.countDistinct("l_suppkey").alias("n_supps"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


@query(
    "q_agg_approx",
    oracle="""
    SELECT l_returnflag,
           CAST(count(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
           TRUE AS approx_ok
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def q_agg_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HyperLogLog++, rsd 0.02) next to the
    exact count — at 100 TB the sketch replaces exact countd wherever a
    ±2% answer is acceptable (one pass, bounded state, no expand).

    The raw estimate is engine-specific, so the declared output is the
    SQL-stateable invariant instead: the exact count (hash-checked
    against DuckDB) plus the sketch's deterministic accuracy guarantee
    as a boolean — |approx/exact − 1| ≤ 0.06 (3× the configured rsd;
    HLL++ bias correction keeps the fixture well inside), which the
    oracle states as TRUE. The estimate itself stays pinned by
    tests/test_properties-style bounds through this boolean."""
    return (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_partkey").alias("exact_parts"),
            F.approx_count_distinct("l_partkey", 0.02).alias("__approx"),
        )
        .select(
            "l_returnflag",
            "exact_parts",
            (
                F.abs(F.col("__approx") / F.col("exact_parts") - 1.0) <= 0.06
            ).alias("approx_ok"),
        )
    )


@query(
    "q_agg_rollup",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2) AS sum_qty,
           CAST(count(*) AS BIGINT)  AS n
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def q_agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP grouping sets (hierarchical subtotals + grand total)."""
    return (
        load_table(spark, sf_dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.count(F.lit(1)).alias("n"),
        )
    )


@query(
    "q_agg_grouping_sets",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2) AS sum_qty,
           CAST(count(*) AS BIGINT)  AS n
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    """,
)
def q_agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (per-flag, per-status, grand total) via
    the DataFrame groupingSets API — one Expand + one hash aggregate,
    not three scans unioned."""
    return (
        load_table(spark, sf_dir, "lineitem")
        .groupingSets(
            [["l_returnflag"], ["l_linestatus"], []],
            "l_returnflag",
            "l_linestatus",
        )
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.count(F.lit(1)).alias("n"),
        )
    )


@query(
    "q_agg_cube",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2) AS sum_qty,
           CAST(count(*) AS BIGINT)  AS n
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def q_agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE grouping sets (all cross-combinations)."""
    return (
        load_table(spark, sf_dir, "lineitem")
        .cube("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.count(F.lit(1)).alias("n"),
        )
    )


@query(
    "q_agg_stats",
    oracle="""
    SELECT l_returnflag,
           round(stddev_samp(l_quantity), 4)  AS sd_qty,
           round(var_samp(l_quantity), 4)     AS var_qty,
           round(corr(l_extendedprice, l_quantity), 4) AS corr_price_qty,
           round(covar_samp(l_extendedprice, l_quantity), 4) AS covar_price_qty,
           round(min(l_extendedprice), 2)     AS min_price,
           round(max(l_extendedprice), 2)     AS max_price
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def q_agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregates (stddev/variance/corr/covar)."""
    return (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.round(F.stddev_samp("l_quantity"), 4).alias("sd_qty"),
            F.round(F.var_samp("l_quantity"), 4).alias("var_qty"),
            F.round(F.corr("l_extendedprice", "l_quantity"), 4).alias(
                "corr_price_qty"
            ),
            F.round(F.covar_samp("l_extendedprice", "l_quantity"), 4).alias(
                "covar_price_qty"
            ),
            F.round(F.min("l_extendedprice"), 2).alias("min_price"),
            F.round(F.max("l_extendedprice"), 2).alias("max_price"),
        )
    )


@query(
    "q_pivot",
    oracle="""
    SELECT l_linestatus,
           round(sum(l_quantity) FILTER (l_returnflag = 'A'), 2) AS "A",
           round(sum(l_quantity) FILTER (l_returnflag = 'N'), 2) AS "N",
           round(sum(l_quantity) FILTER (l_returnflag = 'R'), 2) AS "R"
    FROM lineitem
    GROUP BY l_linestatus
    """,
)
def q_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT: one output column per l_returnflag value. Values are
    listed explicitly — with an implicit value list Spark must run an
    extra distinct job before planning; the explicit list keeps it to
    one aggregation, which is the only form that scales."""
    return (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_linestatus")
        .pivot("l_returnflag", ["A", "N", "R"])
        .agg(F.round(F.sum("l_quantity"), 2))
    )


@query(
    "q_unpivot",
    oracle="""
    SELECT p_partkey, 'size' AS metric, CAST(p_size AS DOUBLE) AS value
    FROM part
    UNION ALL
    SELECT p_partkey, 'price' AS metric, round(p_retailprice, 2) AS value
    FROM part
    """,
)
def q_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT/melt: wide metrics to long (metric, value) rows — a
    narrow Expand, no shuffle. Oracle expressed as UNION ALL (the
    relational identity of UNPIVOT)."""
    return (
        load_table(spark, sf_dir, "part")
        .select(
            "p_partkey",
            F.col("p_size").cast("double").alias("size"),
            F.round("p_retailprice", 2).alias("price"),
        )
        .unpivot("p_partkey", ["size", "price"], "metric", "value")
    )


@query(
    "q_agg_percentile",
    oracle="""
    SELECT c_mktsegment,
           round(median(c_acctbal), 4)              AS med_bal,
           round(quantile_cont(c_acctbal, 0.25), 4) AS p25_bal,
           round(quantile_cont(c_acctbal, 0.75), 4) AS p75_bal,
           round(quantile_cont(c_acctbal, 0.95), 4) AS p95_bal
    FROM customer
    GROUP BY c_mktsegment
    """,
)
def q_agg_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact median + continuous percentiles per segment (Spark
    `median`/`percentile` ≙ DuckDB `median`/`quantile_cont`, both
    linear-interpolation). Exact percentiles sort each group's values;
    at 100 TB prefer `approx_percentile` (t-digest sketch, q_agg_approx)
    unless exactness is contractual."""
    cust = load_table(spark, sf_dir, "customer")
    return cust.groupBy("c_mktsegment").agg(
        F.round(F.median("c_acctbal"), 4).alias("med_bal"),
        F.round(F.percentile("c_acctbal", 0.25), 4).alias("p25_bal"),
        F.round(F.percentile("c_acctbal", 0.75), 4).alias("p75_bal"),
        F.round(F.percentile("c_acctbal", 0.95), 4).alias("p95_bal"),
    )


@query(
    "q_agg_argminmax",
    oracle="""
    SELECT c_nationkey,
           arg_max(c_name, c_custkey) AS newest_customer,
           arg_min(c_name, c_custkey) AS oldest_customer,
           round(max(c_acctbal), 2)   AS max_bal
    FROM customer
    GROUP BY c_nationkey
    """,
)
def q_agg_argminmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered-argument aggregation: the row-valued companion to
    min/max (Spark `max_by`/`min_by` ≙ DuckDB `arg_max`/`arg_min`).
    Keyed on the globally-unique c_custkey so the winner is
    deterministic at every scale factor — argmax over a non-unique key
    is an engine-dependent coin flip. One map-side-combinable shuffle,
    same cost profile as plain max()."""
    cust = load_table(spark, sf_dir, "customer")
    return cust.groupBy("c_nationkey").agg(
        F.max_by("c_name", "c_custkey").alias("newest_customer"),
        F.min_by("c_name", "c_custkey").alias("oldest_customer"),
        F.round(F.max("c_acctbal"), 2).alias("max_bal"),
    )


@query(
    "q_dq_profile",
    oracle="""
    SELECT 'o_custkey' AS col,
           CAST(count(*) AS BIGINT)                     AS n_rows,
           CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
                                                        AS n_nulls,
           CAST(count(DISTINCT o_custkey) AS BIGINT)    AS n_distinct,
           CAST(min(o_custkey) AS DOUBLE)               AS min_val,
           CAST(max(o_custkey) AS DOUBLE)               AS max_val
    FROM orders
    UNION ALL
    SELECT 'o_totalprice',
           CAST(count(*) AS BIGINT),
           CAST(sum(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END) AS BIGINT),
           CAST(count(DISTINCT o_totalprice) AS BIGINT),
           round(min(o_totalprice), 2),
           round(max(o_totalprice), 2)
    FROM orders
    """,
)
def q_dq_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality profile (the expectations/audit pass a lakehouse
    runs before publishing a table — the reference logs input/valid/
    rejected counts per run, jobs/order_glue_job.py:199-208; this
    generalizes that to per-column null/distinct/range metrics). ONE
    aggregation pass computes every column's metrics simultaneously
    (count/sum/countDistinct/min/max all partial-combine; the unpivot
    to one-row-per-column happens on the 1-row aggregate, not the
    fact), then the tiny result is reshaped driver-free via explode."""
    orders = load_table(spark, sf_dir, "orders")
    agg = orders.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("o_custkey").isNull().cast("long")).alias("ck_nulls"),
        F.countDistinct("o_custkey").alias("ck_distinct"),
        F.min("o_custkey").cast("double").alias("ck_min"),
        F.max("o_custkey").cast("double").alias("ck_max"),
        F.sum(F.col("o_totalprice").isNull().cast("long")).alias("tp_nulls"),
        F.countDistinct("o_totalprice").alias("tp_distinct"),
        F.round(F.min("o_totalprice"), 2).alias("tp_min"),
        F.round(F.max("o_totalprice"), 2).alias("tp_max"),
    )
    profile = agg.select(
        F.explode(
            F.array(
                F.struct(
                    F.lit("o_custkey").alias("col"),
                    F.col("n").cast("bigint").alias("n_rows"),
                    F.col("ck_nulls").cast("bigint").alias("n_nulls"),
                    F.col("ck_distinct").cast("bigint").alias("n_distinct"),
                    F.col("ck_min").alias("min_val"),
                    F.col("ck_max").alias("max_val"),
                ),
                F.struct(
                    F.lit("o_totalprice").alias("col"),
                    F.col("n").cast("bigint").alias("n_rows"),
                    F.col("tp_nulls").cast("bigint").alias("n_nulls"),
                    F.col("tp_distinct").cast("bigint").alias("n_distinct"),
                    F.col("tp_min").alias("min_val"),
                    F.col("tp_max").alias("max_val"),
                ),
            )
        ).alias("p")
    )
    return profile.select("p.*")


@query(
    "q_dq_constraints",
    oracle="""
    WITH o AS (
      SELECT count(*) AS n,
             sum(CASE WHEN o_custkey IS NOT NULL THEN 1 ELSE 0 END) AS ck_ok,
             count(DISTINCT o_orderkey) AS ok_distinct,
             sum(CASE WHEN o_totalprice > 0 THEN 1 ELSE 0 END) AS tp_ok,
             sum(CASE WHEN o_orderstatus IN ('O','F','P')
                      THEN 1 ELSE 0 END) AS st_ok
      FROM orders
    ),
    l AS (
      SELECT count(*) AS n,
             sum(CASE WHEN l_quantity BETWEEN 1 AND 50
                      THEN 1 ELSE 0 END) AS qty_ok,
             sum(CASE WHEN l_extendedprice IS NOT NULL
                      THEN 1 ELSE 0 END) AS ep_ok
      FROM lineitem
    ),
    c AS (
      SELECT count(*) AS n_keys,
             sum(CASE WHEN o.o_orderkey IS NOT NULL THEN 1 ELSE 0 END)
                 AS n_contained
      FROM (SELECT DISTINCT l_orderkey FROM lineitem) lk
      LEFT JOIN (SELECT DISTINCT o_orderkey FROM orders) o
        ON lk.l_orderkey = o.o_orderkey
    )
    SELECT 'completeness_o_custkey' AS constraint,
           round(ck_ok / CAST(n AS DOUBLE), 6) AS metric,
           CAST(1.0 AS DOUBLE) AS threshold,
           ck_ok / CAST(n AS DOUBLE) >= 1.0 AS passed FROM o
    UNION ALL
    SELECT 'uniqueness_o_orderkey',
           round(ok_distinct / CAST(n AS DOUBLE), 6), CAST(1.0 AS DOUBLE),
           ok_distinct / CAST(n AS DOUBLE) >= 1.0 FROM o
    UNION ALL
    SELECT 'compliance_o_totalprice_positive',
           round(tp_ok / CAST(n AS DOUBLE), 6), CAST(1.0 AS DOUBLE),
           tp_ok / CAST(n AS DOUBLE) >= 1.0 FROM o
    UNION ALL
    SELECT 'membership_o_orderstatus',
           round(st_ok / CAST(n AS DOUBLE), 6), CAST(1.0 AS DOUBLE),
           st_ok / CAST(n AS DOUBLE) >= 1.0 FROM o
    UNION ALL
    SELECT 'compliance_l_quantity_1_50',
           round(qty_ok / CAST(n AS DOUBLE), 6), CAST(1.0 AS DOUBLE),
           qty_ok / CAST(n AS DOUBLE) >= 1.0 FROM l
    UNION ALL
    SELECT 'completeness_l_extendedprice',
           round(ep_ok / CAST(n AS DOUBLE), 6), CAST(1.0 AS DOUBLE),
           ep_ok / CAST(n AS DOUBLE) >= 1.0 FROM l
    UNION ALL
    SELECT 'containment_l_orderkey_in_orders',
           round(n_contained / CAST(n_keys AS DOUBLE), 6), CAST(1.0 AS DOUBLE),
           n_contained / CAST(n_keys AS DOUBLE) >= 1.0 FROM c
    """,
)
def q_dq_constraints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative data-quality CONSTRAINT suite (Deequ-style
    hasCompleteness / isUnique / isContainedIn / compliance checks —
    Schelter et al. 2018, VLDB, "Automating Large-Scale Data Quality
    Verification") over the reference's validated tables: one row per
    constraint with its measured metric, threshold, and pass verdict —
    the publish gate a lakehouse runs where the reference logs only
    input/valid/rejected counts (jobs/order_glue_job.py:199-208;
    q_dq_profile generalizes the METRICS, this adds the VERDICTS).

    Constraints: completeness(o_custkey), uniqueness(o_orderkey),
    compliance(o_totalprice > 0), membership(o_orderstatus in O/F/P),
    compliance(l_quantity in [1, 50]), completeness(l_extendedprice),
    and referential containment(l_orderkey ⊆ orders.o_orderkey).

    Scale shape: every per-table constraint folds into ONE conditional
    aggregate per table — two fact scans total, each producing a 1-row
    partial-combining aggregate; the tiny result reshapes to
    constraint rows via explode, never a per-constraint rescan
    (Deequ's shared-scan analyzer design).  Only the referential
    containment needs cross-table data movement: distinct key
    relations (keys only, never payload) hash-join on the key — the
    same bounded shuffle any RI check costs at 100 TB.  All verdicts
    are exact, not sampled."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")

    o = orders.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("o_custkey").isNotNull().cast("long")).alias("ck_ok"),
        F.countDistinct("o_orderkey").alias("ok_distinct"),
        F.sum((F.col("o_totalprice") > 0).cast("long")).alias("tp_ok"),
        F.sum(
            F.col("o_orderstatus").isin("O", "F", "P").cast("long")
        ).alias("st_ok"),
    )
    l_agg = li.agg(
        F.count(F.lit(1)).alias("ln"),
        F.sum(F.col("l_quantity").between(1, 50).cast("long")).alias(
            "qty_ok"
        ),
        F.sum(F.col("l_extendedprice").isNotNull().cast("long")).alias(
            "ep_ok"
        ),
    )
    cont = (
        li.select("l_orderkey")
        .distinct()
        .join(
            orders.select(F.col("o_orderkey").alias("l_orderkey"))
            .distinct()
            .withColumn("__hit", F.lit(1)),
            "l_orderkey",
            "left",
        )
        .agg(
            F.count(F.lit(1)).alias("n_keys"),
            F.sum(F.coalesce(F.col("__hit"), F.lit(0))).alias(
                "n_contained"
            ),
        )
    )

    def row(name: str, num, den):
        frac = num / den.cast("double")
        return F.struct(
            F.lit(name).alias("constraint"),
            F.round(frac, 6).alias("metric"),
            F.lit(1.0).alias("threshold"),
            (frac >= 1.0).alias("passed"),
        )

    wide = o.crossJoin(l_agg).crossJoin(cont)
    return wide.select(
        F.explode(
            F.array(
                row("completeness_o_custkey", F.col("ck_ok"), F.col("n")),
                row("uniqueness_o_orderkey", F.col("ok_distinct"), F.col("n")),
                row(
                    "compliance_o_totalprice_positive",
                    F.col("tp_ok"),
                    F.col("n"),
                ),
                row("membership_o_orderstatus", F.col("st_ok"), F.col("n")),
                row("compliance_l_quantity_1_50", F.col("qty_ok"), F.col("ln")),
                row(
                    "completeness_l_extendedprice",
                    F.col("ep_ok"),
                    F.col("ln"),
                ),
                row(
                    "containment_l_orderkey_in_orders",
                    F.col("n_contained"),
                    F.col("n_keys"),
                ),
            )
        ).alias("c")
    ).select("c.*")
