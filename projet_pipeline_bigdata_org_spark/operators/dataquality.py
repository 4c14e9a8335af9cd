"""Data-quality expectations audit (SURVEY §2.13 [GAP→add]): the
pre-ingestion contract check a production pipeline runs before admitting
a batch — referential integrity, domain ranges, nullability, and key
uniqueness, reported as one bounded violations sheet.

The reference validates nothing beyond Kafka JSON shredding
(`spark/engine.py:101` from_json nulls on malformed rows); a 100 TB
pipeline needs explicit, queryable expectations — this operator is the
Spark-first equivalent of a Great-Expectations-style suite expressed as
ONE declarative plan.

Scale shape: every expectation is either a partial-agg'd single-pass
aggregate over one table or a broadcast/shuffle anti-join for
referential integrity; the result is a union of one-row frames —
bounded output regardless of corpus size, no driver-side iteration
(the union is in the PLAN, not a Python loop over results).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from projet_pipeline_bigdata_org_spark.catalog import load
from projet_pipeline_bigdata_org_spark.plans.registry import query

#: o_orderdate must land inside the generator's population window
#: (TESTDATA.md: 1995-01-01 .. 2001-08-01)
DATE_LO, DATE_HI = "1995-01-01", "2001-12-31"
#: l_quantity domain per the TPC-H spec
QTY_LO, QTY_HI = 1, 50


def _expect(name: str, checked, violations) -> F.Column:
    return F.struct(
        F.lit(name).alias("expectation"),
        checked.cast("long").alias("n_checked"),
        violations.cast("long").alias("n_violations"),
    )


@query(
    "dq_expectations_audit",
    oracle=f"""
    WITH rows_ AS (
      SELECT 'orders.custkey_in_customer' AS expectation,
             (SELECT COUNT(*) FROM orders) AS n_checked,
             (SELECT COUNT(*) FROM orders o
              WHERE NOT EXISTS (SELECT 1 FROM customer c
                                WHERE c.c_custkey = o.o_custkey)) AS n_violations
      UNION ALL
      SELECT 'orders.totalprice_positive',
             (SELECT COUNT(*) FROM orders),
             (SELECT COUNT(*) FROM orders WHERE NOT (o_totalprice > 0))
      UNION ALL
      SELECT 'orders.orderdate_in_range',
             (SELECT COUNT(*) FROM orders),
             (SELECT COUNT(*) FROM orders
              WHERE o_orderdate < DATE '{DATE_LO}'
                 OR o_orderdate > DATE '{DATE_HI}')
      UNION ALL
      SELECT 'orders.orderkey_unique',
             (SELECT COUNT(*) FROM orders),
             (SELECT COUNT(*) - COUNT(DISTINCT o_orderkey) FROM orders)
      UNION ALL
      SELECT 'orders.priority_not_null',
             (SELECT COUNT(*) FROM orders),
             (SELECT COUNT(*) FROM orders WHERE o_orderpriority IS NULL)
      UNION ALL
      SELECT 'lineitem.quantity_in_domain',
             (SELECT COUNT(*) FROM lineitem),
             (SELECT COUNT(*) FROM lineitem
              WHERE l_quantity < {QTY_LO} OR l_quantity > {QTY_HI})
    )
    SELECT expectation, CAST(n_checked AS BIGINT) AS n_checked,
           CAST(n_violations AS BIGINT) AS n_violations,
           n_violations * 1.0 / n_checked AS violation_rate,
           n_violations = 0 AS passed
    FROM rows_
    """,
    tags=("relational", "quality", "orders", "lineitem", "customer"),
)
def dq_expectations_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Six-expectation data-quality suite over orders/lineitem: referential
    integrity (custkey → customer via anti-join count), positive prices,
    date-domain membership, key uniqueness (COUNT vs COUNT DISTINCT),
    nullability, and quantity domain — one row per expectation with
    checked/violation counts, rate, and pass flag.

    Scale shape: the orders expectations share ONE single-pass conditional
    aggregate (not five scans); referential integrity is an anti-join
    against the customer key column only — no forced broadcast hint,
    because customer grows with the corpus: AQE picks broadcast when the
    pruned key column fits under autoBroadcastJoinThreshold and falls
    back to a shuffled hash join when it does not, which is the correct
    behavior at 100 TB; lineitem is one more single-pass agg.
    Output: 6 rows."""
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer").select("c_custkey")
    li = load(spark, sf_dir, "lineitem")

    orphan = (
        o.select("o_custkey")
        .join(c, o.o_custkey == c.c_custkey, "left_anti")
        .agg(F.count(F.lit(1)).alias("v_orphan"))
    )
    # the four single-table orders expectations ride ONE pass
    o_agg = o.agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.count(F.when(~(F.col("o_totalprice") > 0), 1)).alias("v_price"),
        F.count(
            F.when(
                (F.col("o_orderdate") < F.lit(DATE_LO).cast("date"))
                | (F.col("o_orderdate") > F.lit(DATE_HI).cast("date")),
                1,
            )
        ).alias("v_date"),
        (F.count(F.lit(1)) - F.count_distinct(F.col("o_orderkey"))).alias("v_uniq"),
        F.count(F.when(F.col("o_orderpriority").isNull(), 1)).alias("v_null"),
    )
    li_agg = li.agg(
        F.count(F.lit(1)).alias("n_li"),
        F.count(
            F.when(
                (F.col("l_quantity") < QTY_LO) | (F.col("l_quantity") > QTY_HI), 1
            )
        ).alias("v_qty"),
    )
    # assemble the bounded sheet: cross-join the three 1-row aggregates,
    # then explode a struct array — the union lives in the plan
    sheet = (
        o_agg.crossJoin(orphan)
        .crossJoin(li_agg)
        .select(
            F.explode(
                F.array(
                    _expect(
                        "orders.custkey_in_customer",
                        F.col("n_orders"),
                        F.col("v_orphan"),
                    ),
                    _expect(
                        "orders.totalprice_positive",
                        F.col("n_orders"),
                        F.col("v_price"),
                    ),
                    _expect(
                        "orders.orderdate_in_range",
                        F.col("n_orders"),
                        F.col("v_date"),
                    ),
                    _expect(
                        "orders.orderkey_unique", F.col("n_orders"), F.col("v_uniq")
                    ),
                    _expect(
                        "orders.priority_not_null", F.col("n_orders"), F.col("v_null")
                    ),
                    _expect(
                        "lineitem.quantity_in_domain", F.col("n_li"), F.col("v_qty")
                    ),
                )
            ).alias("e")
        )
        .select("e.expectation", "e.n_checked", "e.n_violations")
    )
    return sheet.select(
        "expectation",
        "n_checked",
        "n_violations",
        (F.col("n_violations") * 1.0 / F.col("n_checked")).alias("violation_rate"),
        (F.col("n_violations") == 0).alias("passed"),
    )


# ---------------------------------------------------------------------------
# column profiler (the DISCOVERY side of the expectations audit)
# ---------------------------------------------------------------------------

#: profiled columns of the orders table and the metric slot each type
#: fills: numerics surface min/max as DOUBLE (exact — min/max SELECT an
#: existing value, no arithmetic), strings via binary-collation compare,
#: timestamps formatted to the engine-neutral second grain
PROFILE_COLS: tuple[tuple[str, str], ...] = (
    ("o_orderkey", "num"),
    ("o_custkey", "num"),
    ("o_totalprice", "num"),
    ("o_orderstatus", "str"),
    ("o_orderpriority", "str"),
    ("o_orderdate", "ts"),
)

_TS_FMT_SPARK = "yyyy-MM-dd HH:mm:ss"
_TS_FMT_DUCK = "%Y-%m-%d %H:%M:%S"


def _profile_col_sql(col: str, kind: str) -> str:
    if kind == "num":
        mn = f"CAST(MIN({col}) AS DOUBLE)"
        mx = f"CAST(MAX({col}) AS DOUBLE)"
        ms = "CAST(NULL AS VARCHAR)"
        xs = "CAST(NULL AS VARCHAR)"
    elif kind == "str":
        mn, mx = "CAST(NULL AS DOUBLE)", "CAST(NULL AS DOUBLE)"
        ms, xs = f"MIN({col})", f"MAX({col})"
    else:
        mn, mx = "CAST(NULL AS DOUBLE)", "CAST(NULL AS DOUBLE)"
        ms = f"STRFTIME(MIN({col}), '{_TS_FMT_DUCK}')"
        xs = f"STRFTIME(MAX({col}), '{_TS_FMT_DUCK}')"
    return f"""
    SELECT '{col}' AS col_name,
           COUNT(*) AS n_rows,
           COUNT(*) - COUNT({col}) AS n_nulls,
           COUNT(DISTINCT {col}) AS n_distinct,
           {mn} AS min_num, {mx} AS max_num,
           {ms} AS min_str, {xs} AS max_str
    FROM orders"""


@query(
    "agg_profile_columns",
    oracle=" UNION ALL ".join(
        _profile_col_sql(c, k) for c, k in PROFILE_COLS
    ),
    tags=("llm", "quality", "orders"),
)
def agg_profile_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column profiler over the orders table — the DISCOVERY companion of
    ``dq_expectations_audit`` (Deequ/Great-Expectations 'profile' stage:
    you profile first, then pin expectations): per column, row count,
    null count, exact distinct count, and min/max surfaced in a
    type-appropriate slot (numerics as DOUBLE — exact, min/max select an
    existing value; strings under binary collation, identical in both
    engines; timestamps formatted at second grain).

    Scale shape: ONE scan — all per-column aggregates fold in a single
    partial-agg'd aggregation; the multi-column exact COUNT(DISTINCT)
    plans as Spark's Expand (one input pass multiplied |cols|+1 ways
    map-side), which is the certification-grade form. At 100 TB the
    exact distincts swap for approx_count_distinct or the certified
    register sketch (``agg_hll_registers``) — the profile's other
    metrics are one-pass regardless. Output is |PROFILE_COLS| rows from
    a stack() pivot of the single aggregate row — bounded, no driver
    iteration."""
    from projet_pipeline_bigdata_org_spark.catalog import spread_input

    # r17: the multi-distinct aggregate plans as an Expand that multiplies
    # the scan |cols|+1 ways MAP-SIDE — spread the single-split local scan
    # so the expand+partial-agg uses every core (guide §2.5; no-op on
    # multi-split production inputs)
    o = spread_input(load(spark, sf_dir, "orders"))
    aggs: list[F.Column] = [F.count(F.lit(1)).alias("n_rows")]
    for c, kind in PROFILE_COLS:
        aggs.append(
            (F.count(F.lit(1)) - F.count(c)).cast("long").alias(f"nn_{c}")
        )
        aggs.append(F.count_distinct(F.col(c)).cast("long").alias(f"nd_{c}"))
        if kind == "num":
            aggs.append(F.min(c).cast("double").alias(f"mn_{c}"))
            aggs.append(F.max(c).cast("double").alias(f"mx_{c}"))
        elif kind == "str":
            aggs.append(F.min(c).alias(f"ms_{c}"))
            aggs.append(F.max(c).alias(f"xs_{c}"))
        else:
            aggs.append(
                F.date_format(F.min(c), _TS_FMT_SPARK).alias(f"ms_{c}")
            )
            aggs.append(
                F.date_format(F.max(c), _TS_FMT_SPARK).alias(f"xs_{c}")
            )
    one = o.agg(*aggs)
    parts = []
    for c, kind in PROFILE_COLS:
        # every operand rides inside an explicit CAST so stack() sees
        # uniformly-named struct fields across rows (Spark's
        # STACK_COLUMN_DIFF_TYPES check compares field NAMES too)
        mn = f"CAST({f'mn_{c}' if kind == 'num' else 'NULL'} AS DOUBLE)"
        mx = f"CAST({f'mx_{c}' if kind == 'num' else 'NULL'} AS DOUBLE)"
        ms = f"CAST({f'ms_{c}' if kind != 'num' else 'NULL'} AS STRING)"
        xs = f"CAST({f'xs_{c}' if kind != 'num' else 'NULL'} AS STRING)"
        parts.append(
            f"'{c}', CAST(n_rows AS BIGINT), CAST(nn_{c} AS BIGINT), "
            f"CAST(nd_{c} AS BIGINT), {mn}, {mx}, {ms}, {xs}"
        )
    stacked = one.select(
        F.expr(
            f"stack({len(PROFILE_COLS)}, {', '.join(parts)}) AS "
            "(col_name, n_rows, n_nulls, n_distinct, min_num, max_num, "
            "min_str, max_str)"
        )
    )
    return stacked.select(
        "col_name",
        F.col("n_rows").cast("long").alias("n_rows"),
        F.col("n_nulls").cast("long").alias("n_nulls"),
        F.col("n_distinct").cast("long").alias("n_distinct"),
        "min_num",
        "max_num",
        "min_str",
        "max_str",
    )


# ---------------------------------------------------------------------------
# metric-drift audit (the TIME dimension of data quality: Deequ-style
# anomaly detection on aggregate metrics, week over week — complements
# dq_expectations_audit's static contracts and agg_profile_columns'
# single-snapshot discovery)
# ---------------------------------------------------------------------------

#: relative-change threshold in milli (300 = a 30% week-over-week change in
#: row count or mean value flags the partition)
DRIFT_MILLI = 300

#: crafted drift riders (the KMV fixture discipline): real event volumes are
#: statistically flat week over week, so these certify the FLAGGED branches
#: at any SF — 'zzdrift' holds volume and moves the mean 10x, 'zzcount'
#: holds the mean and drops volume 5x
DRIFT_FIXTURE_ROWS: tuple[tuple[str, str, float], ...] = tuple(
    [(f"2024-01-{d + 1:02d}", "zzdrift", 10.0) for d in range(4)]
    + [(f"2024-01-{d + 8:02d}", "zzdrift", 100.0) for d in range(4)]
    + [(f"2024-01-{d % 4 + 1:02d}", "zzcount", 5.0) for d in range(10)]
    + [("2024-01-08", "zzcount", 5.0), ("2024-01-09", "zzcount", 5.0)]
)
_DRIFT_FIXTURE_SQL = " UNION ALL ".join(
    f"SELECT TIMESTAMP '{ts} 12:00:00' AS ts, '{t}' AS event_type, "
    f"CAST({v} AS DOUBLE) AS value"
    for ts, t, v in DRIFT_FIXTURE_ROWS
)


@query(
    "audit_metric_drift",
    oracle=f"""
    WITH ev AS (
      SELECT ts, event_type, value FROM events
      UNION ALL {_DRIFT_FIXTURE_SQL}
    ), wk AS (
      SELECT event_type, DATE_TRUNC('week', ts) AS week,
             COUNT(*) AS n,
             CAST(FLOOR(SUM(CAST(value AS DECIMAL(18,6))) * 1000) AS BIGINT)
               AS sum_milli
      FROM ev GROUP BY event_type, DATE_TRUNC('week', ts)
    ), lagged AS (
      SELECT event_type, week, n, sum_milli,
             LAG(n) OVER w AS prev_n,
             LAG(sum_milli) OVER w AS prev_sum
      FROM wk
      WINDOW w AS (PARTITION BY event_type ORDER BY week)
    )
    SELECT event_type,
           STRFTIME(week, '%Y-%m-%d') AS week,
           CAST(n AS BIGINT) AS n,
           CAST(prev_n AS BIGINT) AS prev_n,
           CAST(sum_milli // n AS BIGINT) AS mean_milli,
           CAST(prev_sum // prev_n AS BIGINT) AS prev_mean_milli,
           COALESCE(ABS(n - prev_n) * 1000 > prev_n * {DRIFT_MILLI}, FALSE)
             AS count_drift,
           COALESCE(ABS(sum_milli * prev_n - prev_sum * n) * 1000
                      > ABS(prev_sum) * n * {DRIFT_MILLI}, FALSE)
             AS mean_drift
    FROM lagged
    """,
    tags=("dq", "timeseries", "events"),
)
def audit_metric_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Week-over-week metric-drift audit per event type (Deequ's
    AnomalyCheck shape): each (type, week) partition's row count and
    milli-scaled mean value compare against the previous week via LAG;
    a relative change beyond DRIFT_MILLI (30%) flags the partition. The
    drift tests are DIVISION-FREE cross-multiplications over exact
    BIGINTs — count: |n - prev_n| * 1000 > prev_n * 300; mean:
    |sum * prev_n - prev_sum * n| * 1000 > |prev_sum| * n * 300 (the
    mean comparison runs on RAW sums, so a zero or negative baseline
    still flags a real move — a prev-mean-ratio form would go blind at
    zero; review-caught). No floating-point ratio ever exists, and the
    sum itself rides FLOOR(decimal) before the BIGINT cast because the
    engines disagree on decimal->int rounding (DuckDB rounds half away,
    Spark truncates; floor is floor in both). The first week of a type
    never flags (no baseline), pinned via COALESCE(..., FALSE). The
    cross-multiplication needs sum_milli * n < 2^63 — fine to ~10^13
    milli-units per 10^9-row partition; beyond that, widen to
    DECIMAL(38,0) in both engines.

    Scale shape: one partial-agg'd pass folds the stream to
    |types| x |weeks| metric rows; the LAG window sorts only that
    bounded table. This is the audit a 100 TB ingest runs on yesterday's
    partition before publishing it — the metrics table is the thing a
    production deployment PERSISTS per epoch (the rollup_epoch_partials
    discipline), with each new week appending one partial-agg scan."""
    from projet_pipeline_bigdata_org_spark.functions.exact import dec

    fixture = spark.createDataFrame(
        [(f"{ts} 12:00:00", t, v) for ts, t, v in DRIFT_FIXTURE_ROWS],
        "ts string, event_type string, value double",
    ).select(F.col("ts").cast("timestamp"), "event_type", "value")
    ev = (
        load(spark, sf_dir, "events")
        .select("ts", "event_type", "value")
        .unionByName(fixture)
    )
    wk = ev.groupBy(
        "event_type", F.date_trunc("week", "ts").alias("week")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.floor(F.sum(dec("value")) * 1000).cast("long").alias("sum_milli"),
    )
    from pyspark.sql import Window as _W

    w = _W.partitionBy("event_type").orderBy("week")
    lagged = wk.select(
        "event_type",
        "week",
        "n",
        "sum_milli",
        F.lag("n").over(w).alias("prev_n"),
        F.lag("sum_milli").over(w).alias("prev_sum"),
    )
    count_drift = F.coalesce(
        F.abs(F.col("n") - F.col("prev_n")) * 1000
        > F.col("prev_n") * DRIFT_MILLI,
        F.lit(False),
    )
    mean_drift = F.coalesce(
        F.abs(F.col("sum_milli") * F.col("prev_n") - F.col("prev_sum") * F.col("n"))
        * 1000
        > F.abs(F.col("prev_sum")) * F.col("n") * DRIFT_MILLI,
        F.lit(False),
    )
    return lagged.select(
        "event_type",
        F.date_format("week", "yyyy-MM-dd").alias("week"),
        F.col("n").cast("long").alias("n"),
        F.col("prev_n").cast("long").alias("prev_n"),
        F.expr("sum_milli div n").cast("long").alias("mean_milli"),
        F.expr("prev_sum div prev_n").cast("long").alias("prev_mean_milli"),
        count_drift.alias("count_drift"),
        mean_drift.alias("mean_drift"),
    )
