"""Time-series / binning operators: histogram bucketing, dense time-grid
gap filling (sequence + explode + left join — the UDTF-expansion pattern),
and ordinality explode. Rounds out SURVEY.md §2.8/§2.11 analytics the
reference's PowerBI layer implied but never computed in Spark.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from projet_pipeline_bigdata_org_spark.catalog import load
from projet_pipeline_bigdata_org_spark.functions.exact import dec, dsum
from projet_pipeline_bigdata_org_spark.plans.registry import query

BUCKET_WIDTH = 25_000.0
N_BUCKETS = 20


@query(
    "hist_price_buckets",
    oracle=f"""
    SELECT 1 + CAST(FLOOR(o_totalprice / {BUCKET_WIDTH}) AS BIGINT) AS bucket,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS bucket_value
    FROM orders
    GROUP BY 1
    """,
    tags=("relational", "histogram"),
)
def ts_price_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram of order totals (width_bucket semantics via
    floor-division, which DuckDB 1.0 can mirror — it lacks width_bucket).
    Division of 2-decimal doubles by an exact power-of-ten-scaled width is
    IEEE-identical cross-engine."""
    o = load(spark, sf_dir, "orders")
    bucket = (F.floor(F.col("o_totalprice") / BUCKET_WIDTH) + 1).cast("long")
    return o.groupBy(bucket.alias("bucket")).agg(
        F.count(F.lit(1)).alias("n_orders"),
        dsum("o_totalprice", "bucket_value"),
    )


@query(
    "gapfill_hourly_events",
    oracle="""
    WITH grid AS (
      SELECT UNNEST(GENERATE_SERIES(TIMESTAMP '2024-01-01 00:00:00',
                                    TIMESTAMP '2024-01-03 23:00:00',
                                    INTERVAL 1 HOUR)) AS hour_start),
    agg AS (
      SELECT DATE_TRUNC('hour', ts) AS hour_start, COUNT(*) AS n
      FROM events
      WHERE ts < TIMESTAMP '2024-01-04 00:00:00'
      GROUP BY 1)
    SELECT STRFTIME(g.hour_start, '%Y-%m-%d %H:%M:%S') AS hour_start,
           COALESCE(n, 0) AS n_events
    FROM grid g LEFT JOIN agg a ON a.hour_start = g.hour_start
    """,
    tags=("relational", "timeseries", "events"),
)
def ts_hourly_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense hourly series with zero-filled gaps: generate the grid with
    sequence+explode (no driver loop, no data-dependent range scan), left
    join the hourly counts. The standard dashboard/feature-store densify."""
    e = load(spark, sf_dir, "events")
    grid = spark.range(1).select(
        F.explode(
            F.sequence(
                F.lit("2024-01-01 00:00:00").cast("timestamp"),
                F.lit("2024-01-03 23:00:00").cast("timestamp"),
                F.expr("INTERVAL 1 HOUR"),
            )
        ).alias("hour_start")
    )
    agg = (
        e.filter(F.col("ts") < F.lit("2024-01-04 00:00:00").cast("timestamp"))
        .groupBy(F.date_trunc("hour", "ts").alias("hour_start"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return grid.join(agg, "hour_start", "left").select(
        F.date_format("hour_start", "yyyy-MM-dd HH:mm:ss").alias("hour_start"),
        F.coalesce("n", F.lit(0)).alias("n_events"),
    )


@query(
    "ts_posexplode_tokens",
    oracle="""
    SELECT doc_id,
           CAST(GENERATE_SUBSCRIPTS(LIST_FILTER(STRING_SPLIT(text, ' '), x -> x <> ''), 1) AS BIGINT) AS pos,
           UNNEST(LIST_FILTER(STRING_SPLIT(text, ' '), x -> x <> '')) AS token
    FROM documents
    WHERE doc_id < 20
    """,
    tags=("relational", "function", "documents"),
)
def ts_posexplode_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """posexplode (UDTF-style expansion with ordinality) — token stream with
    positions, 1-based to match SQL ordinality."""
    from projet_pipeline_bigdata_org_spark.operators.textops import ws_tokens

    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 20)
    return d.select(
        "doc_id", F.posexplode(ws_tokens("text")).alias("pos0", "token")
    ).select("doc_id", (F.col("pos0") + 1).cast("long").alias("pos"), "token")


INTERP_USERS = 20


@query(
    "ts_linear_interpolate",
    oracle=f"""
    WITH grid AS (
      SELECT UNNEST(GENERATE_SERIES(TIMESTAMP '2024-01-01 00:00:00',
                                    TIMESTAMP '2024-01-03 23:00:00',
                                    INTERVAL 1 HOUR)) AS hour_start),
    users AS (SELECT DISTINCT user_id FROM events WHERE user_id < {INTERP_USERS}),
    closes AS (
      SELECT user_id, hour_start, value FROM (
        SELECT user_id, DATE_TRUNC('hour', ts) AS hour_start, value,
               ROW_NUMBER() OVER (PARTITION BY user_id, DATE_TRUNC('hour', ts)
                                  ORDER BY ts DESC, event_id DESC) AS rn
        FROM events WHERE user_id < {INTERP_USERS}
          AND ts < TIMESTAMP '2024-01-04 00:00:00') t
      WHERE rn = 1),
    dense AS (
      SELECT u.user_id, g.hour_start, c.value
      FROM users u CROSS JOIN grid g
      LEFT JOIN closes c ON c.user_id = u.user_id AND c.hour_start = g.hour_start),
    ctx AS (
      SELECT user_id, hour_start, value,
             LAST_VALUE(value IGNORE NULLS) OVER wp AS prev_val,
             LAST_VALUE(CASE WHEN value IS NOT NULL THEN hour_start END IGNORE NULLS)
               OVER wp AS prev_hour,
             FIRST_VALUE(value IGNORE NULLS) OVER wn AS next_val,
             FIRST_VALUE(CASE WHEN value IS NOT NULL THEN hour_start END IGNORE NULLS)
               OVER wn AS next_hour
      FROM dense
      WINDOW wp AS (PARTITION BY user_id ORDER BY hour_start
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
             wn AS (PARTITION BY user_id ORDER BY hour_start
                    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
    SELECT user_id,
           STRFTIME(hour_start, '%Y-%m-%d %H:%M:%S') AS hour_start,
           value IS NOT NULL AS observed,
           CASE WHEN value IS NOT NULL THEN value
                WHEN prev_val IS NULL THEN next_val
                WHEN next_val IS NULL THEN prev_val
                ELSE prev_val + (next_val - prev_val)
                     * (CAST(EPOCH(hour_start) - EPOCH(prev_hour) AS DOUBLE)
                        / CAST(EPOCH(next_hour) - EPOCH(prev_hour) AS DOUBLE))
           END AS interp_value
    FROM ctx
    """,
    tags=("relational", "timeseries", "events"),
)
def ts_linear_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-fill + LINEAR INTERPOLATION: densify each user's hourly series
    over a fixed grid, then fill missing hours by interpolating between the
    nearest earlier/later observed closes (edge gaps take the nearest
    observation). The resample→interpolate shape every feature-store
    backfill needs.

    Parity: the interpolation ratio is (long epoch deltas → double) with a
    fixed op order, so both engines round identically. Scale: windows and
    the densify join share the user_id key — one shuffle; the grid is a
    tiny broadcast (BOUNDED time range x users)."""
    from pyspark.sql import Window as _W

    e = load(spark, sf_dir, "events").filter(
        (F.col("user_id") < INTERP_USERS)
        & (F.col("ts") < F.lit("2024-01-04 00:00:00").cast("timestamp"))
    )
    grid = spark.range(1).select(
        F.explode(
            F.sequence(
                F.lit("2024-01-01 00:00:00").cast("timestamp"),
                F.lit("2024-01-03 23:00:00").cast("timestamp"),
                F.expr("INTERVAL 1 HOUR"),
            )
        ).alias("hour_start")
    )
    users = e.select("user_id").distinct()
    hour = F.date_trunc("hour", F.col("ts"))
    rn = F.row_number().over(
        _W.partitionBy("user_id", hour).orderBy(
            F.col("ts").desc(), F.col("event_id").desc()
        )
    )
    closes = (
        e.select("user_id", hour.alias("hour_start"), "value", rn.alias("rn"))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
    dense = (
        users.crossJoin(F.broadcast(grid))
        .join(closes, ["user_id", "hour_start"], "left")
    )
    wp = (
        _W.partitionBy("user_id")
        .orderBy("hour_start")
        .rowsBetween(_W.unboundedPreceding, _W.currentRow)
    )
    wn = (
        _W.partitionBy("user_id")
        .orderBy("hour_start")
        .rowsBetween(_W.currentRow, _W.unboundedFollowing)
    )
    observed_hour = F.when(F.col("value").isNotNull(), F.col("hour_start"))
    ctx = dense.select(
        "user_id",
        "hour_start",
        "value",
        F.last("value", ignorenulls=True).over(wp).alias("prev_val"),
        F.last(observed_hour, ignorenulls=True).over(wp).alias("prev_hour"),
        F.first("value", ignorenulls=True).over(wn).alias("next_val"),
        F.first(observed_hour, ignorenulls=True).over(wn).alias("next_hour"),
    )
    ratio = (
        (F.unix_timestamp("hour_start") - F.unix_timestamp("prev_hour")).cast("double")
        / (F.unix_timestamp("next_hour") - F.unix_timestamp("prev_hour")).cast("double")
    )
    interp = (
        F.when(F.col("value").isNotNull(), F.col("value"))
        .when(F.col("prev_val").isNull(), F.col("next_val"))
        .when(F.col("next_val").isNull(), F.col("prev_val"))
        .otherwise(
            F.col("prev_val") + (F.col("next_val") - F.col("prev_val")) * ratio
        )
    )
    return ctx.select(
        "user_id",
        F.date_format("hour_start", "yyyy-MM-dd HH:mm:ss").alias("hour_start"),
        F.col("value").isNotNull().alias("observed"),
        interp.alias("interp_value"),
    )


# ---------------------------------------------------------------------------
# Funnel analysis (SURVEY §2.11 event analytics; [GAP→add] — the reference's
# PowerBI layer charts event volumes but never computes ordered funnels)
# ---------------------------------------------------------------------------

#: ordered funnel stages over the events stream; each stage must occur
#: STRICTLY AFTER the previous stage's first occurrence for the same user
FUNNEL_STAGES = ("view", "click", "purchase")


@query(
    "event_funnel_steps",
    oracle=f"""
    WITH s1 AS (
      SELECT user_id,
             MIN(CASE WHEN event_type = '{FUNNEL_STAGES[0]}' THEN ts END) AS t1
      FROM events GROUP BY user_id),
    s2 AS (
      SELECT e.user_id, MIN(e.ts) AS t2
      FROM events e JOIN s1 ON e.user_id = s1.user_id
      WHERE e.event_type = '{FUNNEL_STAGES[1]}' AND e.ts > s1.t1
      GROUP BY e.user_id),
    s3 AS (
      SELECT e.user_id, MIN(e.ts) AS t3
      FROM events e JOIN s2 ON e.user_id = s2.user_id
      WHERE e.event_type = '{FUNNEL_STAGES[2]}' AND e.ts > s2.t2
      GROUP BY e.user_id)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
           CAST(COUNT(s1.t1) AS BIGINT) AS n_stage1,
           CAST(COUNT(s2.t2) AS BIGINT) AS n_stage2,
           CAST(COUNT(s3.t3) AS BIGINT) AS n_stage3,
           COUNT(s2.t2) * 1.0 / COUNT(s1.t1) AS conv_1_to_2,
           COUNT(s3.t3) * 1.0 / COUNT(s2.t2) AS conv_2_to_3
    FROM s1 LEFT JOIN s2 ON s1.user_id = s2.user_id
            LEFT JOIN s3 ON s1.user_id = s3.user_id
    """,
    tags=("relational", "timeseries", "funnel", "events"),
)
def event_funnel_steps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strictly-ordered conversion funnel (view → click → purchase): a user
    counts for stage k only if their first stage-k event lands AFTER their
    first stage-(k-1) event — the sessionless funnel every product
    analytics stack computes, and the order-sensitive form a naive
    per-type MIN() cannot express.

    Scale shape: each stage is one partial-agg'd groupBy(user_id); the
    stage-gating joins are all keyed on user_id, so every shuffle in the
    chain reuses ONE hash partitioning on user_id (Spark's
    EnsureRequirements elides the re-exchange between co-partitioned
    stages). The funnel summary is a single-row final agg — no per-user
    data leaves the cluster."""
    return funnel_steps(load(spark, sf_dir, "events"))


def funnel_steps(e: DataFrame) -> DataFrame:
    """Tested core of event_funnel_steps over any (user_id, event_type, ts)
    frame — see the query docstring for semantics and scale shape."""
    s1 = e.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == FUNNEL_STAGES[0], F.col("ts"))).alias("t1")
    )
    s2 = (
        e.filter(F.col("event_type") == FUNNEL_STAGES[1])
        .join(s1, "user_id")
        .filter(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    s3 = (
        e.filter(F.col("event_type") == FUNNEL_STAGES[2])
        .join(s2, "user_id")
        .filter(F.col("ts") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    return (
        s1.join(s2, "user_id", "left")
        .join(s3, "user_id", "left")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_users"),
            F.count("t1").cast("long").alias("n_stage1"),
            F.count("t2").cast("long").alias("n_stage2"),
            F.count("t3").cast("long").alias("n_stage3"),
            (F.count("t2") * 1.0 / F.count("t1")).alias("conv_1_to_2"),
            (F.count("t3") * 1.0 / F.count("t2")).alias("conv_2_to_3"),
        )
    )


# ---------------------------------------------------------------------------
# SCD2 interval derivation (SURVEY §2.11 [GAP→add] — the lakehouse
# dimension-versioning pattern; complements sql_merge_upsert's upsert form)
# ---------------------------------------------------------------------------


@query(
    "dim_scd2_intervals",
    oracle="""
    WITH p AS (
      SELECT user_id, ts, value,
             ROW_NUMBER() OVER w AS version,
             LEAD(ts) OVER w AS next_ts
      FROM events
      WHERE event_type = 'purchase'
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT user_id,
           CAST(version AS BIGINT) AS version,
           value,
           STRFTIME(ts, '%Y-%m-%d %H:%M:%S') AS valid_from,
           STRFTIME(next_ts, '%Y-%m-%d %H:%M:%S') AS valid_to,
           next_ts IS NULL AS is_current
    FROM p
    """,
    tags=("relational", "timeseries", "scd2", "events"),
)
def dim_scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type-2 slowly-changing-dimension intervals from an event stream:
    each user's purchase history becomes a versioned chain with
    [valid_from, valid_to) bounds — valid_to is the NEXT version's start
    (LEAD), NULL marks the current version. The derivation step behind
    every dimension-history table in a lakehouse; sql_merge_upsert covers
    the upsert half, this covers interval versioning.

    Scale shape: one filter pushed to the scan, one window partitioned by
    user_id (row_number + lead share the SAME window spec, so Spark plans
    ONE sort+window pass, no second exchange). Output is |purchases|
    rows — bounded by the filtered event count."""
    from pyspark.sql import Window as _W

    e = load(spark, sf_dir, "events")
    w = _W.partitionBy("user_id").orderBy("ts", "event_id")
    p = e.filter(F.col("event_type") == "purchase").select(
        "user_id",
        "ts",
        "value",
        F.row_number().over(w).cast("long").alias("version"),
        F.lead("ts").over(w).alias("next_ts"),
    )
    return p.select(
        "user_id",
        "version",
        "value",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("valid_from"),
        F.date_format("next_ts", "yyyy-MM-dd HH:mm:ss").alias("valid_to"),
        F.col("next_ts").isNull().alias("is_current"),
    )


# ---------------------------------------------------------------------------
# Cohort retention (SURVEY §2.11 [GAP→add] — the weekly-cohort activity
# matrix; complements event_funnel_steps' within-journey ordering)
# ---------------------------------------------------------------------------


@query(
    "event_retention_cohorts",
    oracle="""
    WITH first_seen AS (
      SELECT user_id, DATE_TRUNC('week', MIN(ts)) AS cohort_week
      FROM events GROUP BY user_id),
    activity AS (
      SELECT DISTINCT user_id, DATE_TRUNC('week', ts) AS week FROM events),
    cohort_size AS (
      SELECT cohort_week, COUNT(*) AS n_cohort
      FROM first_seen GROUP BY cohort_week)
    SELECT STRFTIME(f.cohort_week, '%Y-%m-%d') AS cohort_week,
           CAST((EPOCH(a.week) - EPOCH(f.cohort_week)) // 604800 AS BIGINT)
             AS week_offset,
           CAST(COUNT(*) AS BIGINT) AS n_active,
           CAST(MAX(s.n_cohort) AS BIGINT) AS n_cohort,
           COUNT(*) * 1.0 / MAX(s.n_cohort) AS retention
    FROM activity a
    JOIN first_seen f USING (user_id)
    JOIN cohort_size s USING (cohort_week)
    GROUP BY f.cohort_week, (EPOCH(a.week) - EPOCH(f.cohort_week)) // 604800
    """,
    tags=("relational", "timeseries", "retention", "events"),
)
def event_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort-retention matrix: users grouped by first-seen week,
    activity counted per distinct (user, week), offsets in whole weeks
    (both ends week-truncated, so the epoch difference is an exact
    multiple of 604800 — integer division, no rounding). The standard
    product-analytics retention triangle.

    Scale shape: first-seen and activity both shuffle on user_id — ONE
    hash partitioning reused by the cohort join (EnsureRequirements
    elides the re-exchange); cohort sizes are |weeks| rows riding a
    broadcast. Output is |weeks|² / 2 rows — bounded by the calendar, not
    the event count."""
    e = load(spark, sf_dir, "events")
    first = e.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_week")
    )
    activity = e.select(
        "user_id", F.date_trunc("week", "ts").alias("week")
    ).distinct()
    size = first.groupBy("cohort_week").agg(F.count(F.lit(1)).alias("n_cohort"))
    return (
        activity.join(first, "user_id")
        .join(F.broadcast(size), "cohort_week")
        .groupBy(
            "cohort_week",
            F.expr("(unix_timestamp(week) - unix_timestamp(cohort_week)) DIV 604800")
            .cast("long")
            .alias("week_offset"),
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_active"),
            F.max("n_cohort").cast("long").alias("n_cohort"),
        )
        .select(
            F.date_format("cohort_week", "yyyy-MM-dd").alias("cohort_week"),
            "week_offset",
            "n_active",
            "n_cohort",
            (F.col("n_active") * 1.0 / F.col("n_cohort")).alias("retention"),
        )
    )


# ---------------------------------------------------------------------------
# Event-sequence transition matrix (SURVEY §2.11 [GAP→add] — first-order
# Markov view of user journeys; the model behind next-event prediction
# features and journey anomaly detection)
# ---------------------------------------------------------------------------


@query(
    "event_markov_transitions",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type AS from_type,
             LEAD(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS to_type
      FROM events),
    pairs AS (
      SELECT from_type, to_type, COUNT(*) AS n
      FROM seq WHERE to_type IS NOT NULL
      GROUP BY from_type, to_type)
    SELECT from_type, to_type, CAST(n AS BIGINT) AS n,
           n / SUM(n) OVER (PARTITION BY from_type) AS prob
    FROM pairs
    """,
    tags=("relational", "timeseries", "markov", "events"),
)
def event_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event sequences:
    consecutive (from_type → to_type) pairs by event time, with row-
    normalized probabilities. The sequence model behind next-event
    features, journey scoring, and funnel-order sanity checks
    (event_funnel_steps asks "did the order happen"; this asks "how
    likely is each order").

    Scale shape: ONE window pass partitioned by user_id (lead over the
    per-user sort — the same single-sort discipline as
    dim_scd2_intervals), then a partial-agg'd rollup to the ≤|types|²
    transition table; the probability normalization is a window over that
    bounded table. Exactness: counts are integers; prob is the same
    long/long → double division in both engines."""
    from pyspark.sql import Window as _W

    e = load(spark, sf_dir, "events")
    w = _W.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        F.col("event_type").alias("from_type"),
        F.lead("event_type").over(w).alias("to_type"),
    )
    pairs = (
        seq.filter(F.col("to_type").isNotNull())
        .groupBy("from_type", "to_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return pairs.select(
        "from_type",
        "to_type",
        F.col("n").cast("long").alias("n"),
        (F.col("n") / F.sum("n").over(_W.partitionBy("from_type"))).alias("prob"),
    )


# ---------------------------------------------------------------------------
# RFM segmentation (SURVEY §2.11 [GAP→add] — recency/frequency/monetary
# customer scoring, the classic batch-analytics segmentation)
# ---------------------------------------------------------------------------

#: RFM quartile count (scores 1..4 per axis)
RFM_Q = 4
#: fixed "as of" anchor: the day after the event window closes, so recency
#: is a stable positive day count at every SF
RFM_ASOF = "2024-02-01 00:00:00"


@query(
    "event_rfm_segments",
    oracle=f"""
    WITH base AS (
      SELECT user_id,
             -- FLOOR(EPOCH(..)): DuckDB's EPOCH keeps fractional seconds,
             -- Spark's unix_timestamp truncates — align before the day DIV
             CAST((CAST(FLOOR(EPOCH(TIMESTAMP '{RFM_ASOF}')) AS BIGINT)
                   - CAST(FLOOR(EPOCH(MAX(ts))) AS BIGINT)) // 86400
                  AS BIGINT) AS recency_days,
             CAST(COUNT(*) AS BIGINT) AS frequency,
             CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT)
               AS monetary_cents
      FROM events WHERE event_type = 'purchase'
      GROUP BY user_id),
    scored AS (
      SELECT *,
             CAST(NTILE({RFM_Q}) OVER (ORDER BY recency_days DESC, user_id)
                  AS BIGINT) AS r_score,
             CAST(NTILE({RFM_Q}) OVER (ORDER BY frequency, user_id)
                  AS BIGINT) AS f_score,
             CAST(NTILE({RFM_Q}) OVER (ORDER BY monetary_cents, user_id)
                  AS BIGINT) AS m_score
      FROM base)
    SELECT user_id, recency_days, frequency,
           CAST(monetary_cents AS DOUBLE) / 100.0 AS monetary,
           r_score, f_score, m_score,
           r_score * 100 + f_score * 10 + m_score AS rfm
    FROM scored
    """,
    tags=("relational", "timeseries", "segmentation", "events"),
)
def event_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM customer segmentation over the purchase stream: per-user recency
    (whole days before a fixed anchor — both operands second-truncated,
    integer division), frequency, and monetary mass (exact integer
    cents), each scored into quartiles by NTILE with a user_id tie-break
    (total order ⇒ deterministic buckets in both engines; higher score =
    better: most-recent / most-frequent / highest-spend land in bucket
    {RFM_Q}).

    Scale shape: one filter pushed to the scan + one partial-agg'd
    groupBy(user_id); the three NTILEs run over the AGGREGATED per-user
    table (|users| rows, not |events|) — at 100 TB the global sort of a
    bounded user summary is the textbook acceptable global window, and
    the compressed-distribution variant (stat_exact_percentiles) is the
    escape hatch if |users| itself explodes."""
    from pyspark.sql import Window as _W

    e = load(spark, sf_dir, "events")
    base = (
        e.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(
            F.expr(
                f"CAST((unix_timestamp(TIMESTAMP '{RFM_ASOF}') - unix_timestamp(MAX(ts)))"
                " DIV 86400 AS BIGINT)"
            ).alias("recency_days"),
            F.count(F.lit(1)).cast("long").alias("frequency"),
            F.sum(F.round(F.col("value") * 100, 0).cast("long"))
            .cast("long")
            .alias("monetary_cents"),
        )
    )
    r = F.ntile(RFM_Q).over(_W.orderBy(F.col("recency_days").desc(), "user_id"))
    f = F.ntile(RFM_Q).over(_W.orderBy("frequency", "user_id"))
    m = F.ntile(RFM_Q).over(_W.orderBy("monetary_cents", "user_id"))
    scored = base.select(
        "user_id",
        "recency_days",
        "frequency",
        "monetary_cents",
        r.cast("long").alias("r_score"),
        f.cast("long").alias("f_score"),
        m.cast("long").alias("m_score"),
    )
    return scored.select(
        "user_id",
        "recency_days",
        "frequency",
        (F.col("monetary_cents").cast("double") / 100.0).alias("monetary"),
        "r_score",
        "f_score",
        "m_score",
        (F.col("r_score") * 100 + F.col("f_score") * 10 + F.col("m_score")).alias(
            "rfm"
        ),
    )


# ---------------------------------------------------------------------------
# CDC snapshot diff (the change-data-feed derivation: what MERGE consumed;
# complements dim_scd2_intervals' interval versioning and sql_merge_upsert)
# ---------------------------------------------------------------------------

#: snapshot windows over o_orderdate: the OLD state covers [CDC_LO, CDC_OLD_HI),
#: the NEW state [CDC_NEW_LO, CDC_HI). Sliding (not nested) windows so all
#: three change classes occur naturally: customers active only before
#: CDC_NEW_LO surface as deletes, only after CDC_OLD_HI as inserts.
CDC_LO = "1995-01-01"
CDC_NEW_LO = "1996-01-01"
CDC_OLD_HI = "1998-01-01"
CDC_HI = "1999-01-01"


def cdc_snapshot_diff_frame(orders: DataFrame) -> DataFrame:
    """Change-data-capture rows between two per-customer snapshot states
    (order count, exact-decimal total, max order key): ``insert`` when the
    key exists only in the new snapshot, ``delete`` only in the old,
    ``update`` when present in both with ANY state column changed —
    unchanged keys are excluded. This is the diff a lakehouse change feed
    publishes and a MERGE INTO consumes.

    Scale shape: because both snapshots are windows over ONE source, the
    generic two-aggregate FULL OUTER JOIN (the DuckDB twin's formulation —
    deliberately different, as the cross-check) collapses to a single
    conditional aggregation: one scan with the union-window filter pushed
    to parquet, one shuffle on the key, zero joins. State equality is
    exact (BIGINT counts/keys, DECIMAL sums), so 'update' is never a
    floating-point artifact."""
    ts = lambda s: F.lit(s).cast("timestamp")  # noqa: E731
    in_old = F.col("o_orderdate") < ts(CDC_OLD_HI)
    in_new = F.col("o_orderdate") >= ts(CDC_NEW_LO)
    st = (
        orders.filter(
            (F.col("o_orderdate") >= ts(CDC_LO)) & (F.col("o_orderdate") < ts(CDC_HI))
        )
        .groupBy("o_custkey")
        .agg(
            F.count(F.when(in_old, 1)).cast("long").alias("old_n"),
            F.sum(F.when(in_old, dec("o_totalprice"))).alias("old_t"),
            F.max(F.when(in_old, F.col("o_orderkey"))).cast("long").alias("old_m"),
            F.count(F.when(in_new, 1)).cast("long").alias("new_n"),
            F.sum(F.when(in_new, dec("o_totalprice"))).alias("new_t"),
            F.max(F.when(in_new, F.col("o_orderkey"))).cast("long").alias("new_m"),
        )
    )
    unchanged = (
        (F.col("old_n") == F.col("new_n"))
        & F.col("old_t").eqNullSafe(F.col("new_t"))
        & F.col("old_m").eqNullSafe(F.col("new_m"))
    )
    op = (
        F.when(F.col("old_n") == 0, F.lit("insert"))
        .when(F.col("new_n") == 0, F.lit("delete"))
        .otherwise(F.lit("update"))
    )
    return st.filter(~unchanged).select(
        "o_custkey",
        op.alias("change_op"),
        F.col("old_n").alias("old_n_orders"),
        F.col("new_n").alias("new_n_orders"),
        F.col("old_t").cast("double").alias("old_total"),
        F.col("new_t").cast("double").alias("new_total"),
        F.col("old_m").alias("old_max_orderkey"),
        F.col("new_m").alias("new_max_orderkey"),
    )


@query(
    "cdc_snapshot_diff",
    oracle=f"""
    WITH old_s AS (
      SELECT o_custkey, COUNT(*) AS n,
             SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS t,
             MAX(o_orderkey) AS m
      FROM orders
      WHERE o_orderdate >= TIMESTAMP '{CDC_LO}'
        AND o_orderdate < TIMESTAMP '{CDC_OLD_HI}'
      GROUP BY o_custkey
    ), new_s AS (
      SELECT o_custkey, COUNT(*) AS n,
             SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS t,
             MAX(o_orderkey) AS m
      FROM orders
      WHERE o_orderdate >= TIMESTAMP '{CDC_NEW_LO}'
        AND o_orderdate < TIMESTAMP '{CDC_HI}'
      GROUP BY o_custkey
    ), j AS (
      SELECT COALESCE(o.o_custkey, n.o_custkey) AS o_custkey,
             o.n AS old_n, o.t AS old_t, o.m AS old_m,
             n.n AS new_n, n.t AS new_t, n.m AS new_m
      FROM old_s o FULL OUTER JOIN new_s n ON o.o_custkey = n.o_custkey
    )
    SELECT o_custkey,
           CASE WHEN old_n IS NULL THEN 'insert'
                WHEN new_n IS NULL THEN 'delete'
                ELSE 'update' END AS change_op,
           CAST(COALESCE(old_n, 0) AS BIGINT) AS old_n_orders,
           CAST(COALESCE(new_n, 0) AS BIGINT) AS new_n_orders,
           CAST(old_t AS DOUBLE) AS old_total,
           CAST(new_t AS DOUBLE) AS new_total,
           CAST(old_m AS BIGINT) AS old_max_orderkey,
           CAST(new_m AS BIGINT) AS new_max_orderkey
    FROM j
    WHERE old_n IS NULL OR new_n IS NULL
       OR old_n <> new_n OR old_t <> new_t OR old_m <> new_m
    """,
    tags=("relational", "cdc", "orders"),
)
def cdc_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Change feed between two sliding per-customer order-state snapshots
    (see ``cdc_snapshot_diff_frame``). The Spark side is the one-pass
    conditional aggregation; the oracle is the independent generic form —
    two snapshot aggregates FULL OUTER JOINed — so the gate certifies the
    collapse, not just the arithmetic."""
    return cdc_snapshot_diff_frame(load(spark, sf_dir, "orders"))


# ---------------------------------------------------------------------------
# Autocorrelation (seasonality / burstiness diagnostics on event series)
# ---------------------------------------------------------------------------

#: lags (in days) the ACF is evaluated at
ACF_LAGS: tuple[int, ...] = (1, 2, 3, 4, 5, 6, 7)


@query(
    "ts_autocorrelation",
    oracle=f"""
    WITH daily AS (
      SELECT event_type,
             DATE_DIFF('day', DATE '1970-01-01', CAST(ts AS DATE)) AS di,
             COUNT(*) AS cnt
      FROM events GROUP BY event_type, di
    ), lags AS (
      SELECT UNNEST(ARRAY{list(ACF_LAGS)}) AS lag
    ), pairs AS (
      SELECT a.event_type, lags.lag, a.cnt AS x, b.cnt AS y
      FROM daily a
      CROSS JOIN lags
      JOIN daily b
        ON b.event_type = a.event_type AND b.di = a.di + lags.lag
    ), s AS (
      SELECT event_type, lag,
             CAST(COUNT(*) AS HUGEINT) AS n,
             CAST(SUM(x) AS HUGEINT) AS sx, CAST(SUM(y) AS HUGEINT) AS sy,
             SUM(CAST(x AS HUGEINT) * y) AS sxy,
             SUM(CAST(x AS HUGEINT) * x) AS sx2,
             SUM(CAST(y AS HUGEINT) * y) AS sy2
      FROM pairs GROUP BY event_type, lag
    )
    SELECT event_type,
           CAST(lag AS BIGINT) AS lag,
           CAST(n AS BIGINT) AS n_pairs,
           CAST(n * sxy - sx * sy AS BIGINT) AS cov_num,
           CASE WHEN (n * sx2 - sx * sx) * (n * sy2 - sy * sy) = 0 THEN NULL
                ELSE CAST(n * sxy - sx * sy AS DOUBLE)
                     / SQRT(CAST(n * sx2 - sx * sx AS DOUBLE)
                            * CAST(n * sy2 - sy * sy AS DOUBLE))
           END AS acf
    FROM s
    """,
    tags=("timeseries", "events"),
)
def ts_autocorrelation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag-k autocorrelation of per-type daily event counts (the ACF that
    drives seasonality detection and burstiness QA on ingest volumes),
    k = 1..7 days. Pairing is calendar-aware: (x, y) pairs a day with the
    day exactly k later, only when both are observed — pairs, sums, and
    the covariance numerator are exact WIDE-integer arithmetic: the Spark
    side accumulates through DECIMAL(38,0) and the oracle through
    HUGEINT/INT128 (r10 advice: int64 sums would silently wrap at high
    daily volumes, and the engines overflow differently), so the engines
    agree exactly while every term stays below 10^38 — a bound daily
    event counts cannot breach (10^38 requires >10^18 events/day for
    >10^18 days). The displayed ``cov_num`` BIGINT cast bounds that ONE
    column at int64; ``acf`` derives from the wide terms. The single
    inexact step is the final Pearson normalization, which both engines
    evaluate as the IDENTICAL expression tree of correctly-rounded IEEE
    ops (cast, multiply, sqrt, divide — no transcendentals), so even the
    doubles hash-match. Constant series (zero variance) yield NULL via an
    exact integer guard, never a divide-by-zero.

    Scale shape: the daily rollup is one map-side-combined groupBy
    (shuffle bounded by types x days, not events); the lag table is a
    {len(ACF_LAGS)}-row broadcast; the self-join re-shuffles only the
    bounded daily table on its own key; the final aggregate is
    types x lags rows."""
    e = load(spark, sf_dir, "events")
    daily = (
        e.groupBy(
            "event_type",
            F.datediff(F.col("ts").cast("date"), F.lit("1970-01-01").cast("date"))
            .alias("di"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    lags = F.broadcast(
        daily.sparkSession.createDataFrame([(k,) for k in ACF_LAGS], "lag int")
    )
    a = daily.select("event_type", "di", F.col("cnt").alias("x"))
    b = daily.select(
        F.col("event_type").alias("bt"), F.col("di").alias("bdi"),
        F.col("cnt").alias("y"),
    )
    pairs = (
        a.join(lags, how="cross")
        .join(
            b,
            (F.col("bt") == F.col("event_type"))
            & (F.col("bdi") == F.col("di") + F.col("lag")),
        )
    )
    xd = F.col("x").cast("decimal(18,0)")
    yd = F.col("y").cast("decimal(18,0)")
    s = pairs.groupBy("event_type", "lag").agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("n"),
        F.sum(xd).cast("decimal(38,0)").alias("sx"),
        F.sum(yd).cast("decimal(38,0)").alias("sy"),
        F.sum(xd * yd).cast("decimal(38,0)").alias("sxy"),
        F.sum(xd * xd).cast("decimal(38,0)").alias("sx2"),
        F.sum(yd * yd).cast("decimal(38,0)").alias("sy2"),
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    dx = F.col("n") * F.col("sx2") - F.col("sx") * F.col("sx")
    dy = F.col("n") * F.col("sy2") - F.col("sy") * F.col("sy")
    return s.select(
        "event_type",
        F.col("lag").cast("long").alias("lag"),
        F.col("n").cast("long").alias("n_pairs"),
        num.cast("long").alias("cov_num"),
        F.when(dx * dy == 0, F.lit(None).cast("double"))
        .otherwise(
            num.cast("double")
            / F.sqrt(dx.cast("double") * dy.cast("double"))
        )
        .alias("acf"),
    )


# ---------------------------------------------------------------------------
# closed-form OLS trend — exact normal-equation arithmetic per group
# ---------------------------------------------------------------------------


@query(
    "agg_ols_trend",
    oracle="""
    WITH daily AS (
      SELECT event_type,
             DATE_DIFF('day', DATE '1970-01-01', CAST(ts AS DATE)) AS di,
             COUNT(*) AS y
      FROM events GROUP BY event_type, di
    ), rec AS (
      SELECT event_type, di - MIN(di) OVER (PARTITION BY event_type) AS x, y
      FROM daily
    ), s AS (
      SELECT event_type,
             CAST(COUNT(*) AS HUGEINT) AS n,
             CAST(SUM(x) AS HUGEINT) AS sx,
             CAST(SUM(y) AS HUGEINT) AS sy,
             SUM(CAST(x AS HUGEINT) * y) AS sxy,
             SUM(CAST(x AS HUGEINT) * x) AS sx2
      FROM rec GROUP BY event_type
    )
    SELECT event_type,
           CAST(n AS BIGINT) AS n_days,
           CAST(n * sxy - sx * sy AS BIGINT) AS slope_num,
           CAST(n * sx2 - sx * sx AS BIGINT) AS slope_den,
           CASE WHEN n * sx2 - sx * sx = 0 THEN NULL
                ELSE CAST(n * sxy - sx * sy AS DOUBLE)
                     / CAST(n * sx2 - sx * sx AS DOUBLE) END AS slope,
           CASE WHEN n * sx2 - sx * sx = 0 THEN NULL
                ELSE CAST(sy * (n * sx2 - sx * sx)
                          - (n * sxy - sx * sy) * sx AS DOUBLE)
                     / CAST(n * (n * sx2 - sx * sx) AS DOUBLE) END
             AS intercept
    FROM s
    """,
    tags=("timeseries", "events", "agg"),
)
def agg_ols_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type least-squares trend of daily event counts — the
    closed-form normal equations (slope = (nΣxy − ΣxΣy)/(nΣx² − (Σx)²))
    a capacity-planning or drift audit runs over ingest volumes, the
    regression companion of ``ts_autocorrelation``'s correlation.

    Exactness: day indices are RE-CENTERED per type (x = di − min di),
    keeping x small, and every sum accumulates through DECIMAL(38,0) on
    the Spark side / HUGEINT in the oracle (the ts_autocorrelation r11
    discipline — int64 cross terms would wrap at high daily volumes).
    The numerator/denominator pairs are emitted as exact integers;
    slope and intercept are the single inexact step, the IDENTICAL
    correctly-rounded IEEE division tree in both engines. A
    single-distinct-day group (zero x-variance) yields NULLs via the
    exact-integer guard.

    Scale shape: one map-side-combined daily rollup (shuffle bounded by
    types x days); the per-type min rides the same bounded table; the
    final aggregate is |types| rows."""
    return ols_trend_from_daily(ols_daily(load(spark, sf_dir, "events")))


def ols_daily(events: DataFrame) -> DataFrame:
    """(event_type, di, y): per-type daily counts — the MERGEABLE partial
    of the OLS trend (daily counts ADD across epochs, the
    agg_incremental_rollup identity), shared by the batch query and the
    streaming ``OlsTrendSink`` so the two cannot drift."""
    return events.groupBy(
        "event_type",
        F.datediff(F.col("ts").cast("date"), F.lit("1970-01-01").cast("date"))
        .alias("di"),
    ).agg(F.count(F.lit(1)).cast("long").alias("y"))


def ols_trend_from_daily(daily: DataFrame) -> DataFrame:
    """Closed-form normal equations over a (event_type, di, y) daily
    table — the derivation stage both the batch query and the streaming
    sink run (one definition, no drift)."""
    rec = daily.select(
        "event_type",
        (F.col("di") - F.min("di").over(W.partitionBy("event_type"))).alias("x"),
        "y",
    )
    xd = F.col("x").cast("decimal(18,0)")
    yd = F.col("y").cast("decimal(18,0)")
    s = rec.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("n"),
        F.sum(xd).cast("decimal(38,0)").alias("sx"),
        F.sum(yd).cast("decimal(38,0)").alias("sy"),
        F.sum(xd * yd).cast("decimal(38,0)").alias("sxy"),
        F.sum(xd * xd).cast("decimal(38,0)").alias("sx2"),
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    den = F.col("n") * F.col("sx2") - F.col("sx") * F.col("sx")
    inum = F.col("sy") * den - num * F.col("sx")
    iden = F.col("n") * den
    return s.select(
        "event_type",
        F.col("n").cast("long").alias("n_days"),
        num.cast("long").alias("slope_num"),
        den.cast("long").alias("slope_den"),
        F.when(den == 0, F.lit(None).cast("double"))
        .otherwise(num.cast("double") / den.cast("double"))
        .alias("slope"),
        F.when(den == 0, F.lit(None).cast("double"))
        .otherwise(inum.cast("double") / iden.cast("double"))
        .alias("intercept"),
    )


@query(
    "cdc_apply_changes",
    oracle=f"""
    SELECT o_custkey,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS total,
           CAST(MAX(o_orderkey) AS BIGINT) AS max_orderkey
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '{CDC_NEW_LO} 00:00:00'
      AND o_orderdate <  TIMESTAMP '{CDC_HI} 00:00:00'
    GROUP BY o_custkey
    """,
    tags=("relational", "cdc", "orders"),
)
def cdc_apply_changes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE-apply of the change feed — the consuming half of the CDC
    loop (``cdc_snapshot_diff`` derives WHAT changed; this applies it):
    the OLD snapshot state table merged with the published change rows
    under standard MERGE semantics (delete removes the key, insert adds
    it, update replaces the payload, keys without a change row carry
    forward unchanged). The ORACLE computes the NEW snapshot DIRECTLY
    from the raw orders — so a driver match is the ROUNDTRIP PROOF:
    old_state + derived_changes ≡ new_state, certifying both the diff's
    completeness (a missed change would leave a stale carried-forward
    row) and the apply's semantics (a mis-applied op would corrupt a
    payload), row for row, key for key.

    Scale shape: the old snapshot is one windowed-filter groupBy (filter
    pushed to the scan); the change feed reuses
    ``cdc_snapshot_diff_frame`` (single-scan conditional aggregation);
    the apply is ONE full-outer join on the key — exactly the shuffle a
    real MERGE INTO performs — with the carried-forward majority never
    rewritten anywhere but here (at a lakehouse this join is the
    file-rewrite planner's input)."""
    ts = lambda s: F.lit(s).cast("timestamp")  # noqa: E731
    orders = load(spark, sf_dir, "orders")
    old = (
        orders.filter(
            (F.col("o_orderdate") >= ts(CDC_LO))
            & (F.col("o_orderdate") < ts(CDC_OLD_HI))
        )
        .groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).cast("long").alias("old_n"),
            F.sum(dec("o_totalprice")).alias("old_t"),
            F.max("o_orderkey").cast("long").alias("old_m"),
        )
    )
    diff = cdc_snapshot_diff_frame(orders).select(
        F.col("o_custkey").alias("d_custkey"),
        "change_op",
        "new_n_orders",
        "new_total",
        "new_max_orderkey",
    )
    merged = old.join(
        diff, old["o_custkey"] == diff["d_custkey"], "full_outer"
    )
    no_change = F.col("change_op").isNull()
    return (
        merged.filter(F.col("change_op").isNull() | (F.col("change_op") != "delete"))
        .select(
            F.coalesce(F.col("o_custkey"), F.col("d_custkey")).alias("o_custkey"),
            F.when(no_change, F.col("old_n"))
            .otherwise(F.col("new_n_orders"))
            .cast("long")
            .alias("n_orders"),
            F.when(no_change, F.col("old_t").cast("double"))
            .otherwise(F.col("new_total"))
            .alias("total"),
            F.when(no_change, F.col("old_m"))
            .otherwise(F.col("new_max_orderkey"))
            .cast("long")
            .alias("max_orderkey"),
        )
    )
