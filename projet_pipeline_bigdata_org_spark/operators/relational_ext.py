"""Extended relational surface: pivot/unpivot, grouping sets, HAVING,
conditional aggregation, subqueries (EXISTS / scalar), exact percentiles,
null-handling functions, extended string/date packs, RANGE window frames,
and the raw-SQL entry path (SURVEY.md §2.2-2.8 completion).

Some queries deliberately go through ``spark.sql`` over registered views —
the engine exposes both the DataFrame and SQL surfaces and Catalyst plans
them identically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from projet_pipeline_bigdata_org_spark.catalog import load
from projet_pipeline_bigdata_org_spark.functions.exact import dec, dsum
from projet_pipeline_bigdata_org_spark.plans.registry import query

PRIORITIES = ("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")


@query(
    "sql_pivot_priority_counts",
    oracle="""
    SELECT o_orderstatus,
           COUNT(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 END) AS urgent,
           COUNT(CASE WHEN o_orderpriority = '2-HIGH' THEN 1 END) AS high,
           COUNT(CASE WHEN o_orderpriority = '3-MEDIUM' THEN 1 END) AS medium,
           COUNT(CASE WHEN o_orderpriority = '4-NOT SPECIFIED' THEN 1 END) AS unspecified,
           COUNT(CASE WHEN o_orderpriority = '5-LOW' THEN 1 END) AS low
    FROM orders GROUP BY o_orderstatus
    """,
    tags=("relational", "pivot"),
)
def ext_pivot_priority_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT (explicit value list so no extra distinct-values job at scale)."""
    o = load(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderstatus")
        .pivot("o_orderpriority", list(PRIORITIES))
        .count()
        .select(
            "o_orderstatus",
            F.coalesce("1-URGENT", F.lit(0)).alias("urgent"),
            F.coalesce("2-HIGH", F.lit(0)).alias("high"),
            F.coalesce("3-MEDIUM", F.lit(0)).alias("medium"),
            F.coalesce("4-NOT SPECIFIED", F.lit(0)).alias("unspecified"),
            F.coalesce("5-LOW", F.lit(0)).alias("low"),
        )
    )


@query(
    "sql_unpivot_lineitem_metrics",
    oracle="""
    SELECT l_orderkey, l_linenumber, 'qty' AS metric, l_quantity AS val
    FROM lineitem WHERE l_orderkey < 100
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'price', l_extendedprice
    FROM lineitem WHERE l_orderkey < 100
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'disc', l_discount
    FROM lineitem WHERE l_orderkey < 100
    """,
    tags=("relational", "pivot"),
)
def ext_unpivot_lineitem_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT via stack() — wide → long without a join."""
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 100)
    return li.selectExpr(
        "l_orderkey",
        "l_linenumber",
        "stack(3, 'qty', l_quantity, 'price', l_extendedprice, 'disc', l_discount)"
        " AS (metric, val)",
    )


@query(
    "sql_grouping_sets",
    oracle="""
    SELECT r_name, c_mktsegment, COUNT(*) AS n,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE) AS balance
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY GROUPING SETS ((r_name), (c_mktsegment), ())
    """,
    tags=("relational", "agg", "sql"),
)
def ext_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS through the SQL surface (region totals,
    segment totals, grand total in one pass — Expand operator underneath)."""
    load(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    load(spark, sf_dir, "nation").createOrReplaceTempView("nation")
    load(spark, sf_dir, "region").createOrReplaceTempView("region")
    return spark.sql(
        """
        SELECT r_name, c_mktsegment, COUNT(*) AS n,
               CAST(SUM(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE) AS balance
        FROM customer
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY GROUPING SETS ((r_name), (c_mktsegment), ())
        """
    )


@query(
    "sql_having",
    oracle="""
    SELECT o_custkey, COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS spend
    FROM orders
    GROUP BY o_custkey
    HAVING COUNT(*) >= 15
    """,
    tags=("relational", "agg"),
)
def ext_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HAVING = post-aggregation filter."""
    o = load(spark, sf_dir, "orders")
    return (
        o.groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n_orders"), dsum("o_totalprice", "spend"))
        .filter(F.col("n_orders") >= 15)
    )


@query(
    "sql_conditional_agg",
    oracle="""
    SELECT l_returnflag,
           COUNT(CASE WHEN l_discount > 0.05 THEN 1 END) AS n_discounted,
           COUNT(*) AS n_total,
           CAST(SUM(CASE WHEN l_discount > 0.05
                         THEN CAST(l_extendedprice AS DECIMAL(18,6))
                         ELSE CAST(0 AS DECIMAL(18,6)) END) AS DOUBLE) AS discounted_revenue,
           CAST(COUNT(CASE WHEN l_discount > 0.05 THEN 1 END) AS DOUBLE) / COUNT(*)
             AS discounted_ratio
    FROM lineitem
    GROUP BY l_returnflag
    """,
    tags=("relational", "agg"),
)
def ext_conditional_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional aggregation (count_if / sum(CASE) / ratio-of-counts)."""
    li = load(spark, sf_dir, "lineitem")
    cond = F.col("l_discount") > 0.05
    n_disc = F.count_if(cond)
    return li.groupBy("l_returnflag").agg(
        n_disc.alias("n_discounted"),
        F.count(F.lit(1)).alias("n_total"),
        F.sum(F.when(cond, dec("l_extendedprice")).otherwise(F.lit(0).cast("decimal(18,6)")))
        .cast("double")
        .alias("discounted_revenue"),
        (n_disc.cast("double") / F.count(F.lit(1))).alias("discounted_ratio"),
    )


@query(
    "sql_exists_subquery",
    oracle="""
    SELECT s_suppkey, s_name FROM supplier
    WHERE EXISTS (SELECT 1 FROM lineitem
                  WHERE l_suppkey = s_suppkey AND l_quantity >= 49)
      AND NOT EXISTS (SELECT 1 FROM lineitem
                      WHERE l_suppkey = s_suppkey AND l_discount = 0.0
                        AND l_quantity <= 2)
    """,
    tags=("relational", "sql", "subquery"),
)
def ext_exists_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS / NOT EXISTS through the SQL surface (Catalyst
    decorrelates to semi/anti joins — check the plan, not a loop)."""
    load(spark, sf_dir, "supplier").createOrReplaceTempView("supplier")
    load(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(
        """
        SELECT s_suppkey, s_name FROM supplier
        WHERE EXISTS (SELECT 1 FROM lineitem
                      WHERE l_suppkey = s_suppkey AND l_quantity >= 49)
          AND NOT EXISTS (SELECT 1 FROM lineitem
                          WHERE l_suppkey = s_suppkey AND l_discount = 0.0
                            AND l_quantity <= 2)
        """
    )


@query(
    "sql_scalar_subquery",
    oracle="""
    SELECT c_custkey, c_acctbal
    FROM customer
    WHERE c_acctbal > (SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE)
                              / COUNT(c_acctbal)
                       FROM customer)
    """,
    tags=("relational", "sql", "subquery"),
)
def ext_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar subquery (above-average filter); the subquery plans as a
    single-row broadcast, the numeric path uses the exact-decimal average."""
    load(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    return spark.sql(
        """
        SELECT c_custkey, c_acctbal
        FROM customer
        WHERE c_acctbal > (SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE)
                                  / COUNT(c_acctbal)
                           FROM customer)
        """
    )


@query(
    "sql_median_quantity",
    oracle="""
    SELECT l_returnflag,
           MEDIAN(l_quantity) AS median_qty,
           QUANTILE_CONT(l_quantity, 0.25) AS q25,
           QUANTILE_CONT(l_quantity, 0.75) AS q75
    FROM lineitem
    GROUP BY l_returnflag
    """,
    tags=("relational", "agg"),
)
def ext_median_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact percentiles (median/quartiles) on an integer-valued measure —
    interpolation arithmetic is exact for integer neighbors, so engines
    agree bit-for-bit. (approx_percentile exists for the at-scale variant
    but is engine-specific, hence not oracle-gated.)"""
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.median("l_quantity").alias("median_qty"),
        F.percentile("l_quantity", 0.25).alias("q25"),
        F.percentile("l_quantity", 0.75).alias("q75"),
    )


@query(
    "sql_null_handling",
    oracle="""
    SELECT event_id,
           COALESCE(CASE WHEN value > 10 THEN value END, -1) AS value_or_default,
           NULLIF(event_type, 'view') AS type_non_view,
           CASE WHEN value > 10 THEN value END IS NULL AS was_null,
           IFNULL(CASE WHEN value > 10 THEN value END, 0) AS value_or_zero
    FROM events
    """,
    tags=("relational", "function", "events"),
)
def ext_null_handling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL-handling pack: coalesce / nullif / is-null / ifnull."""
    e = load(spark, sf_dir, "events")
    big = F.when(F.col("value") > 10, F.col("value"))
    return e.select(
        "event_id",
        F.coalesce(big, F.lit(-1.0)).alias("value_or_default"),
        F.nullif(F.col("event_type"), F.lit("view")).alias("type_non_view"),
        big.isNull().alias("was_null"),
        F.ifnull(big, F.lit(0.0)).alias("value_or_zero"),
    )


@query(
    "sql_string_pack2",
    oracle="""
    SELECT p_partkey,
           COALESCE(ARRAY_TO_STRING(LIST_TRANSFORM(STRING_SPLIT(p_name, ' '),
                           w -> UPPER(w[1]) || LOWER(w[2:])), ' '), '') AS name_title,
           REVERSE(p_brand) AS brand_rev,
           REPEAT(p_type, 2) AS type_twice,
           LEFT(p_name, 4) AS name_left4,
           RIGHT(p_name, 4) AS name_right4,
           CONTAINS(p_name, 'ring') AS has_ring,
           STARTS_WITH(p_type, 'ECO') AS is_eco,
           ENDS_WITH(p_name, 'bolt') AS is_bolt,
           SPLIT_PART(p_name, ' ', 2) AS second_word,
           TRANSLATE(p_brand, '#', '-') AS brand_dash
    FROM part
    """,
    tags=("relational", "function"),
)
def ext_string_pack2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second string pack: initcap/reverse/repeat/left/right/contains/
    startswith/endswith/split_part/translate."""
    p = load(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.initcap("p_name").alias("name_title"),
        F.reverse(F.col("p_brand")).alias("brand_rev"),
        F.repeat(F.col("p_type"), 2).alias("type_twice"),
        F.substring("p_name", 1, 4).alias("name_left4"),
        F.substring(F.col("p_name"), -4, 4).alias("name_right4"),
        F.contains(F.col("p_name"), F.lit("ring")).alias("has_ring"),
        F.startswith(F.col("p_type"), F.lit("ECO")).alias("is_eco"),
        F.endswith(F.col("p_name"), F.lit("bolt")).alias("is_bolt"),
        F.split_part(F.col("p_name"), F.lit(" "), F.lit(2)).alias("second_word"),
        F.translate(F.col("p_brand"), "#", "-").alias("brand_dash"),
    )


@query(
    "sql_date_pack2",
    oracle="""
    SELECT o_orderkey,
           STRFTIME(LAST_DAY(o_orderdate), '%Y-%m-%d') AS month_end,
           STRFTIME(o_orderdate + INTERVAL 3 MONTH, '%Y-%m-%d') AS plus_3_months,
           CAST(EPOCH(o_orderdate) AS BIGINT) AS epoch_sec,
           STRFTIME(MAKE_DATE(CAST(YEAR(o_orderdate) AS INT), 1, 1), '%Y-%m-%d') AS year_start,
           CAST(DATE_DIFF('month', TIMESTAMP '1995-01-01', o_orderdate) AS BIGINT) AS months_since
    FROM orders
    """,
    tags=("relational", "function"),
)
def ext_date_pack2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second date pack: last_day / add_months / epoch seconds / make_date /
    month difference (DuckDB date_diff('month') counts month-boundary
    crossings — mirrored via (yr*12+mo) delta, not months_between)."""
    o = load(spark, sf_dir, "orders")
    months_since = (
        (F.year("o_orderdate") - F.lit(1995)) * 12 + (F.month("o_orderdate") - 1)
    ).cast("long")
    return o.select(
        "o_orderkey",
        F.date_format(F.last_day("o_orderdate"), "yyyy-MM-dd").alias("month_end"),
        F.date_format(F.add_months("o_orderdate", 3), "yyyy-MM-dd").alias(
            "plus_3_months"
        ),
        F.unix_timestamp("o_orderdate").alias("epoch_sec"),
        F.date_format(
            F.make_date(F.year("o_orderdate"), F.lit(1), F.lit(1)), "yyyy-MM-dd"
        ).alias("year_start"),
        months_since.alias("months_since"),
    )


@query(
    "sql_window_range_frame",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice,
           COUNT(*) OVER (PARTITION BY o_custkey ORDER BY o_totalprice
                          RANGE BETWEEN 50000 PRECEDING AND CURRENT ROW) AS n_similar_cheaper,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6)))
                OVER (PARTITION BY o_custkey ORDER BY o_totalprice
                      RANGE BETWEEN 50000 PRECEDING AND CURRENT ROW) AS DOUBLE) AS band_spend,
           FIRST_VALUE(o_orderkey) OVER (PARTITION BY o_custkey
                                         ORDER BY o_orderdate, o_orderkey) AS first_order
    FROM orders
    """,
    tags=("relational", "window"),
)
def ext_window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame (value-based window) + first_value analytic."""
    o = load(spark, sf_dir, "orders")
    w_range = (
        W.partitionBy("o_custkey")
        .orderBy("o_totalprice")
        .rangeBetween(-50000, W.currentRow)
    )
    w_first = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_orderkey",
        "o_custkey",
        "o_totalprice",
        F.count(F.lit(1)).over(w_range).alias("n_similar_cheaper"),
        F.sum(dec("o_totalprice")).over(w_range).cast("double").alias("band_spend"),
        F.first("o_orderkey").over(w_first).alias("first_order"),
    )


@query(
    "sql_surface_q3",
    oracle="""
    SELECT l_orderkey,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                    * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue,
           STRFTIME(o_orderdate, '%Y-%m-%d') AS orderdate
    FROM customer JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1997-03-15'
      AND l_shipdate > TIMESTAMP '1997-03-15'
    GROUP BY l_orderkey, o_orderdate
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
    tags=("relational", "sql", "join", "flagship"),
)
def ext_sql_surface_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3-shaped query through the raw SQL surface — same Catalyst
    plan as the DataFrame form; proves the engine's SQL entry point."""
    load(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    load(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    load(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(
        """
        SELECT l_orderkey,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                        * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue,
               DATE_FORMAT(o_orderdate, 'yyyy-MM-dd') AS orderdate
        FROM customer JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < TIMESTAMP '1997-03-15'
          AND l_shipdate > TIMESTAMP '1997-03-15'
        GROUP BY l_orderkey, o_orderdate
        ORDER BY revenue DESC, l_orderkey
        LIMIT 10
        """
    )


@query(
    "sql_map_functions",
    oracle="""
    WITH m AS (
      SELECT event_id,
             MAP(['k', 'kmod'],
                 [CAST(JSON_EXTRACT_STRING(props, '$.k') AS BIGINT),
                  CAST(JSON_EXTRACT_STRING(props, '$.k') AS BIGINT) % 10]) AS mp
      FROM events)
    SELECT event_id,
           ELEMENT_AT(mp, 'k')[1] AS k_val,
           CAST(CARDINALITY(mp) AS INT) AS map_size,
           COALESCE(ARRAY_TO_STRING(MAP_KEYS(mp), '|'), '') AS keys_joined,
           COALESCE(ARRAY_TO_STRING(LIST_TRANSFORM(MAP_VALUES(mp), v -> CAST(v AS VARCHAR)), '|'), '') AS values_joined
    FROM m
    """,
    tags=("relational", "function", "map", "events"),
)
def ext_map_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MapType surface: create_map / element_at / size / map_keys /
    map_values (map payloads emitted as scalars+joined strings for
    engine-neutral hashing; DuckDB's map extraction list-wraps values,
    unwrapped with [1] in the oracle)."""
    e = load(spark, sf_dir, "events")
    k = F.get_json_object(F.col("props"), "$.k").cast("long")
    m = F.create_map(F.lit("k"), k, F.lit("kmod"), k % 10)
    return e.select(
        "event_id",
        F.element_at(m, "k").alias("k_val"),
        F.size(m).alias("map_size"),
        F.array_join(F.map_keys(m), "|").alias("keys_joined"),
        F.array_join(
            F.transform(F.map_values(m), lambda v: v.cast("string")), "|"
        ).alias("values_joined"),
    )


@query(
    "sql_merge_upsert",
    oracle="""
    WITH upd AS (
      SELECT c_custkey, c_acctbal + 1000 AS new_bal FROM customer WHERE c_custkey % 7 = 0
      UNION ALL
      SELECT c_custkey + 10000000, 0.0 FROM customer WHERE c_custkey % 97 = 0)
    SELECT c_custkey AS custkey, c_acctbal AS acctbal, FALSE AS was_updated
    FROM customer
    WHERE c_custkey NOT IN (SELECT c_custkey FROM upd)
    UNION ALL
    SELECT c_custkey, new_bal, TRUE FROM upd
    """,
    tags=("relational", "merge"),
)
def ext_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE/upsert emulated with anti-join + union (the CDC pattern without
    a table format: Delta/Iceberg MERGE INTO is the managed variant; the
    dataflow — changed rows replace, new rows append, untouched rows carry
    over — is identical, one shuffle on the merge key). Updates are derived
    deterministically from the base table so the oracle can reproduce them."""
    base = load(spark, sf_dir, "customer")
    changed = base.filter(F.col("c_custkey") % 7 == 0).select(
        "c_custkey", (F.col("c_acctbal") + 1000).alias("new_bal")
    )
    inserted = base.filter(F.col("c_custkey") % 97 == 0).select(
        (F.col("c_custkey") + 10_000_000).alias("c_custkey"),
        F.lit(0.0).alias("new_bal"),
    )
    upd = changed.union(inserted)
    untouched = base.join(upd.select("c_custkey"), "c_custkey", "left_anti").select(
        F.col("c_custkey").alias("custkey"),
        F.col("c_acctbal").alias("acctbal"),
        F.lit(False).alias("was_updated"),
    )
    applied = upd.select(
        F.col("c_custkey").alias("custkey"),
        F.col("new_bal").alias("acctbal"),
        F.lit(True).alias("was_updated"),
    )
    return untouched.union(applied)


@query(
    "sql_bitwise_pack",
    oracle="""
    SELECT event_id,
           event_id & 255 AS low_byte,
           event_id | 15 AS with_low_bits,
           XOR(event_id, CAST(1024 AS BIGINT)) AS flipped,
           ~event_id AS complement,
           event_id << 2 AS shl2,
           event_id >> 3 AS shr3
    FROM events
    """,
    tags=("relational", "function", "bitwise", "events"),
)
def ext_bitwise_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise operator pack (& | ^ ~ shifts) — sketch/bitmap building blocks."""
    e = load(spark, sf_dir, "events")
    k = F.col("event_id")
    return e.select(
        "event_id",
        k.bitwiseAND(F.lit(255)).alias("low_byte"),
        k.bitwiseOR(F.lit(15)).alias("with_low_bits"),
        k.bitwiseXOR(F.lit(1024)).alias("flipped"),
        F.bitwise_not(k).alias("complement"),
        F.shiftleft(k, 2).alias("shl2"),
        F.shiftright(k, 3).alias("shr3"),
    )


@query(
    "sql_union_by_name",
    oracle="""
    SELECT c_custkey AS entity_id, c_acctbal AS balance, 'customer' AS kind
    FROM customer WHERE c_acctbal > 9900
    UNION ALL
    SELECT s_suppkey, s_acctbal, 'supplier' FROM supplier WHERE s_acctbal > 9900
    """,
    tags=("relational", "setop"),
)
def ext_union_by_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    """unionByName across differently-ordered projections (schema aligned by
    column name, not position)."""
    c = load(spark, sf_dir, "customer").filter(F.col("c_acctbal") > 9900).select(
        F.col("c_acctbal").alias("balance"),
        F.col("c_custkey").alias("entity_id"),
        F.lit("customer").alias("kind"),
    )
    s = load(spark, sf_dir, "supplier").filter(F.col("s_acctbal") > 9900).select(
        F.col("s_suppkey").alias("entity_id"),
        F.lit("supplier").alias("kind"),
        F.col("s_acctbal").alias("balance"),
    )
    return c.unionByName(s).select("entity_id", "balance", "kind")


@query(
    "sql_window_analytic_pack",
    oracle="""
    SELECT s_suppkey, s_acctbal,
           PERCENT_RANK() OVER w AS pct_rank,
           CUME_DIST() OVER w AS cume,
           NTH_VALUE(s_suppkey, 2) OVER (ORDER BY s_acctbal, s_suppkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS second_poorest,
           LAST_VALUE(s_suppkey) OVER (ORDER BY s_acctbal, s_suppkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS richest
    FROM supplier
    WINDOW w AS (ORDER BY s_acctbal, s_suppkey)
    """,
    tags=("relational", "window"),
)
def ext_window_analytic_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """percent_rank / cume_dist / nth_value / last_value over the supplier
    dim (tiny global window — a real global sort only on small inputs)."""
    s = load(spark, sf_dir, "supplier")
    w = W.orderBy("s_acctbal", "s_suppkey")
    w_full = w.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    return s.select(
        "s_suppkey",
        "s_acctbal",
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
        F.nth_value("s_suppkey", 2).over(w_full).alias("second_poorest"),
        F.last("s_suppkey").over(w_full).alias("richest"),
    )


@query(
    "sql_interval_arithmetic",
    oracle="""
    SELECT event_id,
           STRFTIME(ts + INTERVAL 90 MINUTE, '%Y-%m-%d %H:%M:%S') AS plus_90m,
           STRFTIME(ts - INTERVAL 2 DAY, '%Y-%m-%d %H:%M:%S') AS minus_2d,
           ts + INTERVAL 90 MINUTE > TIMESTAMP '2024-01-15 00:00:00' AS in_second_half,
           CAST(DATE_DIFF('second', TIMESTAMP '2024-01-01 00:00:00', ts) AS BIGINT) AS secs_from_start
    FROM events
    """,
    tags=("relational", "function", "temporal", "events"),
)
def ext_interval_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval arithmetic on event time (add/subtract intervals, interval
    comparisons, whole-second differences)."""
    e = load(spark, sf_dir, "events")
    plus = F.col("ts") + F.expr("INTERVAL 90 MINUTES")
    minus = F.col("ts") - F.expr("INTERVAL 2 DAYS")
    return e.select(
        "event_id",
        F.date_format(plus, "yyyy-MM-dd HH:mm:ss").alias("plus_90m"),
        F.date_format(minus, "yyyy-MM-dd HH:mm:ss").alias("minus_2d"),
        (plus > F.lit("2024-01-15 00:00:00").cast("timestamp")).alias("in_second_half"),
        (F.unix_timestamp("ts") - F.unix_timestamp(F.lit("2024-01-01 00:00:00").cast("timestamp")))
        .cast("long")
        .alias("secs_from_start"),
    )


@query(
    "sql_surface_q18",
    oracle="""
    WITH big AS (
      SELECT l_orderkey
      FROM lineitem
      GROUP BY l_orderkey
      HAVING SUM(CAST(l_quantity AS DECIMAL(12,2))) > 250
    )
    SELECT c_custkey,
           o_orderkey,
           STRFTIME(o_orderdate, '%Y-%m-%d') AS orderdate,
           CAST(o_totalprice AS DOUBLE) AS o_totalprice,
           CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (SELECT l_orderkey FROM big)
    GROUP BY c_custkey, o_orderkey, o_orderdate, o_totalprice
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 20
    """,
    tags=("relational", "sql", "join", "subquery"),
)
def sql_surface_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape (large-volume customers): HAVING-gated aggregate
    subquery feeding an IN filter over a 3-way join, re-aggregated on the
    survivors. The IN subquery plans as a left-semi join on l_orderkey —
    at 100 TB the semi side is the already-aggregated big-orders set
    (orders of magnitude smaller than lineitem), so AQE broadcasts it and
    the fact table is filtered before the wide join shuffles."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    qty = F.col("l_quantity").cast("decimal(12,2)")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(qty).alias("sq"))
        .filter(F.col("sq") > 250)
        .select("l_orderkey")
    )
    return (
        c.join(o, F.col("c_custkey") == F.col("o_custkey"))
        .join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(big, "l_orderkey", "left_semi")
        .groupBy("c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(F.sum(qty).cast("double").alias("sum_qty"))
        .select(
            "c_custkey",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            F.col("o_totalprice").cast("double").alias("o_totalprice"),
            "sum_qty",
        )
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(20)
    )


@query(
    "sql_surface_q17",
    oracle="""
    WITH pstat AS (
      SELECT l_partkey,
             CAST(COUNT(*) AS BIGINT) AS cnt,
             SUM(CAST(l_quantity AS DECIMAL(12,2))) AS sq
      FROM lineitem GROUP BY l_partkey
    )
    SELECT p_brand,
           CAST(COUNT(*) AS BIGINT) AS n_small,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE)
             / 7.0 AS avg_yearly
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    JOIN pstat ON pstat.l_partkey = lineitem.l_partkey
    WHERE p_size = 5
      AND 5 * CAST(l_quantity AS DECIMAL(12,2)) * cnt < sq
    GROUP BY p_brand
    """,
    tags=("relational", "sql", "join", "subquery", "part"),
)
def sql_surface_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape (small-quantity-order revenue): the classic
    CORRELATED scalar aggregate — ``l_quantity < 0.2 * (SELECT
    AVG(l_quantity) ... WHERE l_partkey = p_partkey)`` — written as the
    correlated subquery on the Spark side so Catalyst's decorrelation
    (RewriteCorrelatedScalarSubquery → per-key aggregate + join) is what
    executes, not a hand-rewrite. Exactness: the float threshold
    ``qty < 0.2 * avg`` is algebraically lifted to the integer-safe
    ``5 * qty * cnt < sum`` (both sides exact DECIMALs — no float
    boundary can flip a row between engines); the oracle materializes
    the same per-partkey statistics as a CTE.

    Scale shape: the correlated aggregate becomes one partial-agg'd
    per-partkey stat table joined back on partkey (both sides shuffle on
    the same key, no re-scan per row); the ``p_size`` filter pushes
    to the part scan and AQE broadcasts the filtered dimension."""
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part")
    li.createOrReplaceTempView("lineitem")
    p.createOrReplaceTempView("part")
    return spark.sql(
        """
        SELECT p_brand,
               CAST(COUNT(*) AS BIGINT) AS n_small,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE)
                 / 7.0 AS avg_yearly
        FROM lineitem
        JOIN part ON p_partkey = l_partkey
        WHERE p_size = 5
          AND 5 * CAST(l_quantity AS DECIMAL(12,2))
                * (SELECT COUNT(*) FROM lineitem l2
                   WHERE l2.l_partkey = part.p_partkey)
              < (SELECT SUM(CAST(l_quantity AS DECIMAL(12,2)))
                 FROM lineitem l3 WHERE l3.l_partkey = part.p_partkey)
        GROUP BY p_brand
        """
    )


@query(
    "sql_parameterized",
    oracle="""
    SELECT o_orderpriority,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS total
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_totalprice < 150000.0
    GROUP BY o_orderpriority
    """,
    tags=("relational", "sql", "orders"),
)
def sql_parameterized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parameterized SQL (Spark 3.4+/4 named parameter markers): values bind
    server-side as typed literals — the injection-safe templating surface a
    query service needs; Catalyst constant-folds them exactly like inline
    literals, so pushdown/pruning are unchanged. The oracle states the same
    query with the parameters inlined."""
    load(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT o_orderpriority,
               COUNT(*) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS total
        FROM orders
        WHERE o_orderdate >= :cutoff AND o_totalprice < :cap
        GROUP BY o_orderpriority
        """,
        args={"cutoff": "1996-01-01", "cap": 150000.0},
    )


@query(
    "sql_surface_q21",
    oracle="""
    SELECT s_name, CAST(numwait AS BIGINT) AS numwait FROM (
      SELECT s_name, COUNT(*) AS numwait
      FROM supplier, lineitem l1, orders, nation
      WHERE s_suppkey = l1.l_suppkey
        AND o_orderkey = l1.l_orderkey
        AND o_orderstatus = 'F'
        AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
        AND EXISTS (SELECT 1 FROM lineitem l2
                    WHERE l2.l_orderkey = l1.l_orderkey
                      AND l2.l_suppkey <> l1.l_suppkey)
        AND NOT EXISTS (SELECT 1 FROM lineitem l3
                        WHERE l3.l_orderkey = l1.l_orderkey
                          AND l3.l_suppkey <> l1.l_suppkey
                          AND l3.l_shipdate > o_orderdate + INTERVAL 60 DAY)
        AND s_nationkey = n_nationkey
      GROUP BY s_name
      ORDER BY numwait DESC, s_name
      LIMIT 100) t
    """,
    tags=("relational", "sql", "join", "subquery", "supplier"),
)
def sql_surface_q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (suppliers who kept orders waiting): the
    hardest decorrelation in the suite — ONE correlated EXISTS (another
    supplier participated in the same order) and ONE correlated NOT
    EXISTS whose inner predicate references a column of a DIFFERENT
    outer table (``l3.l_shipdate > o_orderdate``) — written as the
    textbook nested form on the Spark side so Catalyst's
    RewritePredicateSubquery (EXISTS → LeftSemi, NOT EXISTS → LeftAnti,
    both with the extra non-equi condition folded into the join) is
    what executes. Adaptation to this schema: lineitem carries no
    receiptdate/commitdate, so "kept waiting" is l_shipdate more than
    60 days after o_orderdate — the same late-supplier-is-sole-offender
    semantics on the columns available. Top-100 is deterministic
    (s_name is unique, so (numwait DESC, s_name) is a total order).

    Scale shape: both subqueries become orderkey-keyed semi/anti joins
    against the same lineitem scan — three shuffles on l_orderkey that
    AQE coalesces, never a per-row re-scan; nation broadcasts."""
    for t in ("supplier", "lineitem", "orders", "nation"):
        load(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(
        """
        SELECT s_name, CAST(numwait AS BIGINT) AS numwait FROM (
          SELECT s_name, COUNT(*) AS numwait
          FROM supplier, lineitem l1, orders, nation
          WHERE s_suppkey = l1.l_suppkey
            AND o_orderkey = l1.l_orderkey
            AND o_orderstatus = 'F'
            AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAYS
            AND EXISTS (SELECT 1 FROM lineitem l2
                        WHERE l2.l_orderkey = l1.l_orderkey
                          AND l2.l_suppkey <> l1.l_suppkey)
            AND NOT EXISTS (SELECT 1 FROM lineitem l3
                            WHERE l3.l_orderkey = l1.l_orderkey
                              AND l3.l_suppkey <> l1.l_suppkey
                              AND l3.l_shipdate > o_orderdate + INTERVAL 60 DAYS)
            AND s_nationkey = n_nationkey
          GROUP BY s_name
          ORDER BY numwait DESC, s_name
          LIMIT 100) t
        """
    )


@query(
    "sql_surface_q22",
    oracle="""
    WITH pos AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS cnt,
             SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS total
      FROM customer WHERE c_acctbal > 0
    )
    SELECT c_mktsegment,
           CAST(COUNT(*) AS BIGINT) AS numcust,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
             AS totacctbal
    FROM customer, pos
    WHERE CAST(c_acctbal AS DECIMAL(18,2)) * cnt > total
      AND NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey
                        AND o_orderdate >= TIMESTAMP '2000-01-01')
    GROUP BY c_mktsegment
    """,
    tags=("relational", "sql", "subquery", "customer"),
)
def sql_surface_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape (global sales opportunity): an UNCORRELATED
    scalar aggregate subquery (the corpus-wide positive average
    balance) gating the outer scan, plus a correlated NOT EXISTS
    anti-join against orders — written as the textbook form on the
    Spark side so Catalyst plans the scalar as a 1-row broadcast and
    the NOT EXISTS as a LeftAnti on o_custkey. Adaptations to this
    schema: no c_phone, so the country-code grouping becomes
    c_mktsegment; every customer has SOME order in the synthetic data,
    so "never ordered" becomes "no order since 2000-01-01" (the
    filter pushes into the orders scan before the anti join).
    Exactness: ``c_acctbal > AVG(...)`` is lifted to the integer-safe
    cross-multiplied ``bal * cnt > total`` over exact DECIMALs, so no
    float average can flip a boundary row between engines.

    Scale shape: the scalar pair (cnt, total) partial-aggregates to
    one row and broadcasts; the anti join shuffles on custkey with the
    date filter pushed below it; no subquery re-executes per row."""
    for t in ("customer", "orders"):
        load(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(
        """
        SELECT c_mktsegment,
               CAST(COUNT(*) AS BIGINT) AS numcust,
               CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
                 AS totacctbal
        FROM customer
        WHERE CAST(c_acctbal AS DECIMAL(18,2))
                * (SELECT COUNT(*) FROM customer c2 WHERE c2.c_acctbal > 0)
              > (SELECT SUM(CAST(c_acctbal AS DECIMAL(18,2)))
                 FROM customer c3 WHERE c3.c_acctbal > 0)
          AND NOT EXISTS (SELECT 1 FROM orders
                          WHERE o_custkey = c_custkey
                            AND o_orderdate >= TIMESTAMP '2000-01-01')
        GROUP BY c_mktsegment
        """
    )


@query(
    "sql_surface_q13",
    oracle="""
    SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist FROM (
      SELECT c_custkey, CAST(COUNT(o_orderkey) AS BIGINT) AS c_count
      FROM customer LEFT OUTER JOIN orders
        ON c_custkey = o_custkey
       AND o_orderpriority <> '4-NOT SPECIFIED'
      GROUP BY c_custkey) c_orders
    GROUP BY c_count
    """,
    tags=("relational", "sql", "join", "customer"),
)
def sql_surface_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape (customer order-count distribution): the
    LEFT OUTER join with the filter in the JOIN CONDITION (not WHERE —
    filtering in WHERE would silently drop zero-order customers and
    change the NULL row's meaning), COUNT over a nullable join output
    so never-matched customers land in the c_count=0 bucket, then a
    second aggregation over the first's result — the classic
    histogram-of-group-sizes double groupBy. Adaptation: orders has no
    comment column, so the "not like special requests" predicate
    becomes o_orderpriority <> '4-NOT SPECIFIED'.

    Scale shape: join and first groupBy share the custkey clustering
    (one exchange each side, the aggregate reuses the join's
    partitioning); the second groupBy shuffles only the ~thousands of
    distinct counts. COUNT(o_orderkey) (not COUNT(*)) is what makes
    the outer-join NULLs count as zero identically in both engines."""
    for t in ("customer", "orders"):
        load(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(
        """
        SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist FROM (
          SELECT c_custkey, CAST(COUNT(o_orderkey) AS BIGINT) AS c_count
          FROM customer LEFT OUTER JOIN orders
            ON c_custkey = o_custkey
           AND o_orderpriority <> '4-NOT SPECIFIED'
          GROUP BY c_custkey) c_orders
        GROUP BY c_count
        """
    )
