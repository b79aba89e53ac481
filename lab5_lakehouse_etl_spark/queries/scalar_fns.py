"""Scalar-function pack declared queries (SURVEY §2.7 extension).

The reference's scalar surface is tiny (cast, to_timestamp,
current_timestamp, isNull); these packs declare the general surface.
Each pack stays entirely inside whole-stage codegen — built-in JVM
expressions, zero Python UDFs. Dialect gaps vs DuckDB are resolved on
the oracle side (e.g. DuckDB regexp_replace needs the 'g' flag, DuckDB
integer functions return BIGINT where Spark returns INT → everything is
cast to BIGINT in both).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..session import load_table
from . import query


@query(
    "q_fn_string",
    oracle="""
    SELECT p_partkey,
           concat(p_brand, '#', p_name)                    AS branded,
           upper(p_name)                                   AS uname,
           lower(p_brand)                                  AS lbrand,
           trim(p_name)                                    AS tname,
           substring(p_name, 1, 8)                         AS prefix8,
           CAST(length(p_name) AS BIGINT)                  AS name_len,
           split_part(p_name, ' ', 1)                      AS first_word,
           regexp_extract(p_name, '([a-z]+)', 1)           AS first_alpha,
           regexp_replace(p_name, 'a', '@', 'g')           AS subbed,
           (p_name LIKE '%wood%')                          AS has_wood,
           lpad(p_brand, 12, '.')                          AS padded,
           replace(p_name, ' ', '_')                       AS snake
    FROM part
    """,
)
def q_fn_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String pack: concat/case/trim/substring/length/split/regex/like/
    pad/replace. Spark regexp_replace is global by default; the oracle
    passes DuckDB's 'g' flag to match."""
    part = load_table(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.concat(F.col("p_brand"), F.lit("#"), F.col("p_name")).alias("branded"),
        F.upper("p_name").alias("uname"),
        F.lower("p_brand").alias("lbrand"),
        F.trim("p_name").alias("tname"),
        F.substring("p_name", 1, 8).alias("prefix8"),
        F.length("p_name").cast("bigint").alias("name_len"),
        F.split_part(F.col("p_name"), F.lit(" "), F.lit(1)).alias("first_word"),
        F.regexp_extract("p_name", "([a-z]+)", 1).alias("first_alpha"),
        F.regexp_replace("p_name", "a", "@").alias("subbed"),
        F.col("p_name").like("%wood%").alias("has_wood"),
        F.lpad("p_brand", 12, ".").alias("padded"),
        F.replace(F.col("p_name"), F.lit(" "), F.lit("_")).alias("snake"),
    )


@query(
    "q_fn_date",
    oracle="""
    SELECT o_orderkey,
           CAST(o_orderdate AS DATE)                          AS od,
           CAST(year(o_orderdate)  AS BIGINT)                 AS y,
           CAST(month(o_orderdate) AS BIGINT)                 AS m,
           CAST(day(o_orderdate)   AS BIGINT)                 AS d,
           CAST(quarter(o_orderdate) AS BIGINT)               AS q,
           CAST(o_orderdate AS DATE) + 30                     AS plus30,
           CAST(date_diff('day', DATE '1995-01-01',
                          CAST(o_orderdate AS DATE)) AS BIGINT) AS days_since,
           CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
           last_day(CAST(o_orderdate AS DATE))                AS month_end,
           CAST(epoch(o_orderdate) AS BIGINT)                 AS unix_ts
    FROM orders
    """,
)
def q_fn_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date pack: extract/add/diff/trunc/last_day/epoch. Spark datediff
    is (end, start); DuckDB date_diff is ('day', start, end)."""
    orders = load_table(spark, sf_dir, "orders")
    od = F.col("o_orderdate").cast("date")
    return orders.select(
        "o_orderkey",
        od.alias("od"),
        F.year("o_orderdate").cast("bigint").alias("y"),
        F.month("o_orderdate").cast("bigint").alias("m"),
        F.dayofmonth("o_orderdate").cast("bigint").alias("d"),
        F.quarter("o_orderdate").cast("bigint").alias("q"),
        F.date_add(od, 30).alias("plus30"),
        F.datediff(od, F.lit("1995-01-01").cast("date")).cast("bigint").alias(
            "days_since"
        ),
        F.date_trunc("month", F.col("o_orderdate")).alias("month_start"),
        F.last_day(od).alias("month_end"),
        F.unix_timestamp(F.col("o_orderdate")).cast("bigint").alias("unix_ts"),
    )


@query(
    "q_fn_math",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           round(l_extendedprice * 0.8, 2)            AS discounted,
           CAST(floor(l_extendedprice) AS BIGINT)     AS price_floor,
           CAST(ceil(l_extendedprice)  AS BIGINT)     AS price_ceil,
           abs(l_discount - 0.05)                     AS disc_dist,
           round(sqrt(l_quantity), 4)                 AS qty_sqrt,
           round(exp(l_discount), 4)                  AS disc_exp,
           round(ln(l_extendedprice), 4)              AS price_ln,
           CAST(mod(l_orderkey, 7) AS BIGINT)         AS key_mod7,
           round(pow(l_quantity, 2), 2)               AS qty_sq,
           CAST(sign(l_tax - 0.04) AS BIGINT)         AS tax_sign
    FROM lineitem
    """,
)
def q_fn_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math pack: round/floor/ceil/abs/sqrt/exp/ln/mod/pow/sign.
    Transcendentals rounded to 4 — libm results agree well past that.
    pmod ≡ mod here because l_orderkey is non-negative."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.col("l_extendedprice") * 0.8, 2).alias("discounted"),
        F.floor("l_extendedprice").cast("bigint").alias("price_floor"),
        F.ceil("l_extendedprice").cast("bigint").alias("price_ceil"),
        F.abs(F.col("l_discount") - 0.05).alias("disc_dist"),
        F.round(F.sqrt("l_quantity"), 4).alias("qty_sqrt"),
        F.round(F.exp("l_discount"), 4).alias("disc_exp"),
        F.round(F.log("l_extendedprice"), 4).alias("price_ln"),
        F.pmod(F.col("l_orderkey"), F.lit(7)).cast("bigint").alias("key_mod7"),
        F.round(F.pow("l_quantity", F.lit(2)), 2).alias("qty_sq"),
        F.signum(F.col("l_tax") - 0.04).cast("bigint").alias("tax_sign"),
    )


@query(
    "q_fn_cond",
    oracle="""
    SELECT c_custkey,
           CASE WHEN c_acctbal < 0 THEN 'debtor'
                WHEN c_acctbal < 5000 THEN 'regular'
                ELSE 'premium' END                       AS tier,
           coalesce(nullif(c_mktsegment, 'BUILDING'),
                    'OTHER')                             AS seg_or_other,
           least(c_acctbal, 1000.0)                     AS capped_low,
           greatest(c_acctbal, 0.0)                     AS capped_high,
           (c_acctbal BETWEEN 0 AND 1000)               AS small_positive
    FROM customer
    """,
)
def q_fn_cond(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional pack: CASE/coalesce/nullif/least/greatest/between."""
    cust = load_table(spark, sf_dir, "customer")
    bal = F.col("c_acctbal")
    return cust.select(
        "c_custkey",
        F.when(bal < 0, "debtor")
        .when(bal < 5000, "regular")
        .otherwise("premium")
        .alias("tier"),
        F.coalesce(F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")), F.lit("OTHER"))
        .alias("seg_or_other"),
        F.least(bal, F.lit(1000.0)).alias("capped_low"),
        F.greatest(bal, F.lit(0.0)).alias("capped_high"),
        bal.between(0, 1000).alias("small_positive"),
    )


@query(
    "q_fn_array",
    oracle="""
    SELECT vec_id, label,
           CAST(len(embedding) AS BIGINT)                     AS n_dims,
           round(CAST(embedding[1] AS DOUBLE), 6)             AS first_val,
           round(CAST(list_min(embedding) AS DOUBLE), 6)      AS min_val,
           round(CAST(list_max(embedding) AS DOUBLE), 6)      AS max_val,
           round(list_sum(list_transform(embedding,
                 x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))), 4) AS sq_norm,
           CAST(len(list_filter(embedding, x -> x > 0)) AS BIGINT) AS n_positive
    FROM embeddings
    """,
)
def q_fn_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array pack over the embedding column: size/index/min/max plus
    higher-order transform+aggregate (the squared L2 norm) and filter —
    all JVM-side lambda expressions, the multimodal-column fast path."""
    emb = load_table(spark, sf_dir, "embeddings")
    as_double = F.transform(
        F.col("embedding"), lambda x: x.cast("double") * x.cast("double")
    )
    return emb.select(
        "vec_id",
        "label",
        F.size("embedding").cast("bigint").alias("n_dims"),
        F.round(F.element_at("embedding", 1).cast("double"), 6).alias("first_val"),
        F.round(F.array_min("embedding").cast("double"), 6).alias("min_val"),
        F.round(F.array_max("embedding").cast("double"), 6).alias("max_val"),
        F.round(
            F.aggregate(as_double, F.lit(0.0), lambda acc, x: acc + x), 4
        ).alias("sq_norm"),
        F.size(F.filter(F.col("embedding"), lambda x: x > 0))
        .cast("bigint")
        .alias("n_positive"),
    )


@query(
    "q_fn_map",
    oracle="""
    WITH t AS (
      SELECT c_custkey,
             MAP {'lo': round(c_acctbal * 0.1, 4), 'hi': c_acctbal} AS m
      FROM customer
    )
    SELECT c_custkey,
           m['hi'][1]                                       AS hi_val,
           m['lo'][1]                                       AS lo_val,
           CAST(cardinality(m) AS BIGINT)                   AS n_keys,
           list_aggregate(map_keys(m), 'string_agg', ',')   AS keys_csv
    FROM t
    """,
)
def q_fn_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map pack: construction, key lookup, cardinality, key listing —
    scalarized outputs (DuckDB's map index returns a LIST, hence the
    [1] in the oracle)."""
    cust = load_table(spark, sf_dir, "customer")
    m = F.create_map(
        F.lit("lo"),
        F.round(F.col("c_acctbal") * 0.1, 4),
        F.lit("hi"),
        F.col("c_acctbal"),
    )
    return cust.select(
        "c_custkey",
        F.element_at(m, "hi").alias("hi_val"),
        F.element_at(m, "lo").alias("lo_val"),
        F.size(m).cast("bigint").alias("n_keys"),
        F.array_join(F.map_keys(m), ",").alias("keys_csv"),
    )


@query(
    "q_fn_json",
    oracle="""
    SELECT event_id, event_type,
           json_extract_string(props, '$.k')                  AS k_str,
           TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_num,
           TRY_CAST(json_extract_string(props, '$.missing') AS BIGINT) AS absent
    FROM events
    """,
)
def q_fn_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON pack over events.props: path extraction as string + numeric
    try_cast + missing-path NULL semantics."""
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        "event_type",
        F.get_json_object("props", "$.k").alias("k_str"),
        F.get_json_object("props", "$.k").try_cast("bigint").alias("k_num"),
        F.get_json_object("props", "$.missing").try_cast("bigint").alias("absent"),
    )


@query(
    "q_fn_struct",
    oracle="""
    WITH packed AS (
      SELECT o_orderkey,
             {'custkey': o_custkey,
              'total':   round(o_totalprice, 2),
              'status':  o_orderstatus} AS o
      FROM orders
    )
    SELECT o_orderkey,
           o.custkey AS custkey,
           o.total   AS total,
           o.status  AS status
    FROM packed
    WHERE o.total > 100000
    """,
)
def q_fn_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nested-struct round trip: pack columns into a struct, filter on
    a nested field, project fields back out (F.struct + getField ≙
    DuckDB struct literals + dot access). Catalyst collapses the
    pack/unpack into plain column references — the struct never
    materializes, so nesting costs nothing in the scan or filter."""
    orders = load_table(spark, sf_dir, "orders")
    packed = orders.select(
        "o_orderkey",
        F.struct(
            F.col("o_custkey").alias("custkey"),
            F.round("o_totalprice", 2).alias("total"),
            F.col("o_orderstatus").alias("status"),
        ).alias("o"),
    )
    return packed.filter(F.col("o.total") > 100000).select(
        "o_orderkey",
        F.col("o.custkey").alias("custkey"),
        F.col("o.total").alias("total"),
        F.col("o.status").alias("status"),
    )


@query(
    "q_fn_variant",
    oracle="""
    SELECT event_id,
           TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
           (json_extract_string(props, '$.k') IS NOT NULL)       AS has_k
    FROM events
    """,
)
def q_fn_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 VARIANT type over events.props: parse_json lifts the
    JSON string into the binary VARIANT encoding once, then typed path
    access (`variant_get(v, '$.k', 'bigint')`) reads fields WITHOUT
    re-parsing text per extraction — the semi-structured columnar
    answer to repeated get_json_object calls (q_fn_json), which
    re-tokenize the string for every path. At scale the parse happens
    once per row at ingest and every downstream field access is a
    binary offset lookup; here the engine proof is that the VARIANT
    round trip produces exactly the classic JSON-path results
    (oracle-verified against DuckDB json_extract)."""
    ev = load_table(spark, sf_dir, "events")
    v = F.parse_json("props")
    return ev.select(
        "event_id",
        F.try_variant_get(v, "$.k", "bigint").alias("k"),
        # existence, not bigint-castability: mirror the oracle's
        # json_extract_string IS NOT NULL even when $.k holds a
        # non-integer value (string extraction succeeds for any scalar)
        F.try_variant_get(v, "$.k", "string").isNotNull().alias("has_k"),
    )


@query(
    "q_fn_try",
    oracle="""
    SELECT l_orderkey,
           l_linenumber,
           CASE WHEN (l_linenumber - 1) = 0 THEN NULL
                ELSE round(l_quantity / (l_linenumber - 1), 4) END
             AS per_prior_line,
           TRY_CAST(CASE WHEN l_quantity < 25 THEN CAST(CAST(l_quantity AS INT) AS VARCHAR)
                         ELSE 'not-a-number' END AS INTEGER) AS qty_int,
           CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)
             AS net_cents
    FROM lineitem
    WHERE l_orderkey % 50 = 0
    """,
)
def q_fn_try(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI-safe error handling: under Spark 4's default ANSI mode a
    division by zero or an invalid cast THROWS mid-job — the
    ``try_*`` family (`try_divide`, `try_cast`) returns NULL instead,
    which is the only sane semantics for a 100 TB batch where one
    malformed row must not kill hour-long jobs.  The driver runs a
    DEFAULT session (ANSI on), so this query also guards the repo
    against accidentally relying on legacy non-ANSI behavior.  Oracle:
    DuckDB's CASE-guarded division and TRY_CAST state the identical
    NULL-on-error contract."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_orderkey") % 50 == 0
    )
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(
            F.try_divide(F.col("l_quantity"), F.col("l_linenumber") - 1), 4
        ).alias("per_prior_line"),
        F.when(
            F.col("l_quantity") < 25,
            F.col("l_quantity").cast("int").cast("string"),
        )
        .otherwise(F.lit("not-a-number"))
        .try_cast("int")
        .alias("qty_int"),
        # per-row money rounding in CENTS (scaled BIGINT): across 10^5
        # rows some product always lands on a .xx5 boundary where
        # Spark's BigDecimal HALF_UP and DuckDB's
        # multiply-then-nearbyint 2-decimal rounding disagree by a
        # cent; integer-scale rounding of the IDENTICAL double is
        # tie-stable in both engines (the aggregate queries never hit
        # this because they round SUMS, not rows)
        F.round(
            F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
        )
        .cast("bigint")
        .alias("net_cents"),
    )


@query(
    "q_fn_regr",
    oracle="""
    SELECT event_type,
           CAST(regr_count(value, user_id) AS BIGINT) AS n,
           round(regr_slope(value,
             (epoch(CAST(ts AS TIMESTAMP)) - 1704067200) / 86400.0), 4)
             AS slope_per_day,
           round(regr_intercept(value,
             (epoch(CAST(ts AS TIMESTAMP)) - 1704067200) / 86400.0), 2)
             AS intercept,
           round(regr_r2(value,
             (epoch(CAST(ts AS TIMESTAMP)) - 1704067200) / 86400.0), 4)
             AS r2
    FROM events
    GROUP BY event_type
    """,
)
def q_fn_regr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped ordinary-least-squares via the SQL:2016 ``regr_*``
    aggregates — per event type, the linear trend of value over time
    (slope per day, intercept at the fixture epoch, R²).  One partial-combining aggregate
    pass: regr state is six mergeable moments (n, Σx, Σy, Σxx, Σyy,
    Σxy), so the 100 TB plan is identical to any sum — map-side
    partials, one tiny shuffle.  The everyday drift-detection /
    trend-monitoring primitive; both engines implement the identical
    SQL-standard definitions over the identical epoch-day x-axis."""
    ev = load_table(spark, sf_dir, "events")
    # x = days since 2024-01-01 (the fixture epoch): intercept is
    # y-at-x=0, so an x-axis two decades from the data would multiply
    # the engines' last-ulp slope difference by ~2e4 and break the
    # 4-decimal hash — shifting the origin into the data kills the
    # amplification (measured: intercept differed at the 3rd decimal
    # on raw epoch-days, stable at 4 decimals after the shift)
    x = (F.unix_timestamp("ts") - F.lit(1704067200)) / F.lit(86400.0)
    return ev.groupBy("event_type").agg(
        F.regr_count(F.col("value"), F.col("user_id"))
        .cast("bigint")
        .alias("n"),
        # 4/2-decimal rounding, coarser than the repo's usual 4-6: the
        # regr moments suffer catastrophic cancellation (Sxy = sums of
        # near-cancelling terms), so the engines' true values differ by
        # ~1e-6 — not last-ulp noise — and fine rounding would straddle
        # boundaries at some scale factor
        F.round(F.regr_slope(F.col("value"), x), 4).alias("slope_per_day"),
        F.round(F.regr_intercept(F.col("value"), x), 2).alias("intercept"),
        F.round(F.regr_r2(F.col("value"), x), 4).alias("r2"),
    )
