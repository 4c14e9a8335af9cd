"""Distribution analytics: robust (MAD) outlier detection and the
two-sample Kolmogorov-Smirnov statistic over the events stream.

Both are data-quality gates a training pipeline runs before ingesting a
telemetry batch: MAD flags per-metric anomalies without assuming
normality (reference surfaces raw `value` untouched —
`spark/preprocessor.py` has no outlier handling; this
is a [GAP→add] per SURVEY §2.13), and KS quantifies drift between two
event populations.

Scale shape (shared): the ONLY full-table pass is the distinct-value
compression groupBy (value domain is 2-decimal bounded, so the
compressed distribution is |domain| rows, not |events| rows). Every
median / running-CDF window afterwards runs over the compressed
distribution — the same discipline as stat_exact_percentiles
(analytics_ext.py), which keeps the unpartitioned windows bounded by
construction at any corpus size.

Exactness: values ride as integer cents; medians are the explicit lower
median (MIN x with cume ≥ 0.5) in both engines rather than engine
``median()`` (DuckDB interpolates even-count medians, Spark's
percentile differs — the explicit form is engine-independent); every
division is the same long/long → double tree both engines use.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from projet_pipeline_bigdata_org_spark.catalog import load
from projet_pipeline_bigdata_org_spark.plans.registry import query

#: 3 sigma-equivalents under normality: 3 × 1.4826 (the MAD→sigma
#: consistency constant). A single double literal in both engines.
MAD_K = 4.4478


@query(
    "anomaly_mad_outliers",
    oracle=f"""
    WITH t AS (
      SELECT event_type, CAST(ROUND(value * 100, 0) AS BIGINT) AS cents
      FROM events),
    dist AS (
      SELECT event_type, cents, COUNT(*) AS cnt
      FROM t GROUP BY event_type, cents),
    cd AS (
      SELECT event_type, cents, cnt,
             SUM(cnt) OVER (PARTITION BY event_type ORDER BY cents
                            ROWS UNBOUNDED PRECEDING)
             / SUM(cnt) OVER (PARTITION BY event_type) AS cume
      FROM dist),
    med AS (
      SELECT event_type,
             MIN(CASE WHEN cume >= 0.5 THEN cents END) AS med
      FROM cd GROUP BY event_type),
    dev AS (
      SELECT d.event_type, ABS(d.cents - d.med) AS dev, d.med,
             SUM(d.cnt) AS cnt
      FROM (SELECT dist.event_type, dist.cents, dist.cnt, med.med
            FROM dist JOIN med USING (event_type)) d
      GROUP BY d.event_type, ABS(d.cents - d.med), d.med),
    cd2 AS (
      SELECT event_type, dev, med, cnt,
             SUM(cnt) OVER (PARTITION BY event_type ORDER BY dev
                            ROWS UNBOUNDED PRECEDING)
             / SUM(cnt) OVER (PARTITION BY event_type) AS cume
      FROM dev),
    mad AS (
      SELECT event_type, med,
             MIN(CASE WHEN cume >= 0.5 THEN dev END) AS mad
      FROM cd2 GROUP BY event_type, med)
    SELECT d.event_type,
           CAST(SUM(d.cnt) AS BIGINT) AS n_events,
           CAST(m.med AS DOUBLE) / 100.0 AS median_value,
           CAST(m.mad AS DOUBLE) / 100.0 AS mad_value,
           CAST(SUM(CASE WHEN ABS(d.cents - m.med) > {MAD_K} * m.mad
                         THEN d.cnt ELSE 0 END) AS BIGINT) AS n_outliers,
           SUM(CASE WHEN ABS(d.cents - m.med) > {MAD_K} * m.mad
                    THEN d.cnt ELSE 0 END) * 1.0 / SUM(d.cnt) AS outlier_rate
    FROM dist d JOIN mad m USING (event_type)
    GROUP BY d.event_type, m.med, m.mad
    """,
    tags=("llm", "quality", "outliers", "events"),
)
def anomaly_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type robust outlier audit: median + MAD (median absolute
    deviation), flagging values beyond 3 MAD-sigmas (|x - med| > 4.4478 ×
    MAD). Robust to the very outliers it hunts — unlike z-scores, one
    extreme value cannot inflate its own threshold.

    Scale shape: one full-corpus partial-agg compression to the
    (event_type, cents) distribution; the two median extractions are
    windows OVER THE COMPRESSED distribution (bounded by the value
    domain), and the MAD table broadcast-joins back. Output is
    |event_types| rows."""
    e = load(spark, sf_dir, "events")
    t = e.select(
        "event_type",
        F.round(F.col("value") * 100, 0).cast("long").alias("cents"),
    )
    dist = t.groupBy("event_type", "cents").agg(F.count(F.lit(1)).alias("cnt"))

    def lower_median(df: DataFrame, val: str, out: str) -> DataFrame:
        wo = (
            W.partitionBy("event_type")
            .orderBy(val)
            .rowsBetween(W.unboundedPreceding, W.currentRow)
        )
        cume = F.sum("cnt").over(wo) / F.sum("cnt").over(W.partitionBy("event_type"))
        return (
            df.withColumn("cume", cume)
            .groupBy("event_type")
            .agg(F.min(F.when(F.col("cume") >= 0.5, F.col(val))).alias(out))
        )

    med = lower_median(dist, "cents", "med")
    dev = (
        dist.join(F.broadcast(med), "event_type")
        .groupBy("event_type", F.abs(F.col("cents") - F.col("med")).alias("dev"))
        .agg(F.sum("cnt").alias("cnt"))
    )
    mad = lower_median(dev, "dev", "mad")
    thresholds = med.join(mad, "event_type")
    is_out = F.abs(F.col("cents") - F.col("med")) > F.lit(MAD_K) * F.col("mad")
    return (
        dist.join(F.broadcast(thresholds), "event_type")
        .groupBy("event_type", "med", "mad")
        .agg(
            F.sum("cnt").cast("long").alias("n_events"),
            F.sum(F.when(is_out, F.col("cnt")).otherwise(0)).cast("long").alias("n_outliers"),
        )
        .select(
            "event_type",
            "n_events",
            (F.col("med").cast("double") / 100.0).alias("median_value"),
            (F.col("mad").cast("double") / 100.0).alias("mad_value"),
            "n_outliers",
            (F.col("n_outliers") * 1.0 / F.col("n_events")).alias("outlier_rate"),
        )
    )


#: the two event populations whose value distributions KS compares
KS_A, KS_B = "click", "view"


@query(
    "dist_ks_two_sample",
    oracle=f"""
    WITH t AS (
      SELECT CAST(ROUND(value * 100, 0) AS BIGINT) AS cents,
             CASE WHEN event_type = '{KS_A}' THEN 1 ELSE 0 END AS is_a
      FROM events WHERE event_type IN ('{KS_A}', '{KS_B}')),
    dist AS (
      SELECT cents, SUM(is_a) AS na, SUM(1 - is_a) AS nb
      FROM t GROUP BY cents),
    cum AS (
      SELECT cents,
             SUM(na) OVER (ORDER BY cents ROWS UNBOUNDED PRECEDING)
             / SUM(na) OVER () AS fa,
             SUM(nb) OVER (ORDER BY cents ROWS UNBOUNDED PRECEDING)
             / SUM(nb) OVER () AS fb,
             SUM(na) OVER () AS ta, SUM(nb) OVER () AS tb
      FROM dist)
    SELECT CAST(MAX(ta) AS BIGINT) AS n_{KS_A},
           CAST(MAX(tb) AS BIGINT) AS n_{KS_B},
           MAX(ABS(fa - fb)) AS ks_stat,
           CAST(MIN(CASE WHEN ABS(fa - fb) = (SELECT MAX(ABS(fa - fb)) FROM cum)
                         THEN cents END) AS DOUBLE) / 100.0 AS ks_location
    FROM cum
    """,
    tags=("llm", "quality", "drift", "events"),
)
def dist_ks_two_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov statistic between the value
    distributions of two event populations (click vs view): D = max over x
    of |F_a(x) - F_b(x)| — the standard drift gate between a reference and
    a candidate batch before admitting telemetry into a training mix.

    Scale shape: the empirical CDFs are running sums over the COMPRESSED
    (cents → counts) distribution, so the unpartitioned window's input is
    bounded by the value domain, not the event count (cf. the module
    docstring). The max and its location are one more agg over the same
    bounded frame. Output is a single row.

    Exactness: both CDFs are long/long → double divisions in the same
    shape; the double subtraction/ABS/MAX tree is identical cross-engine,
    so the argmax location (selected by double equality against the max)
    is bit-deterministic too."""
    e = load(spark, sf_dir, "events")
    t = e.filter(F.col("event_type").isin(KS_A, KS_B)).select(
        F.round(F.col("value") * 100, 0).cast("long").alias("cents"),
        F.when(F.col("event_type") == KS_A, 1).otherwise(0).alias("is_a"),
    )
    dist = t.groupBy("cents").agg(
        F.sum("is_a").alias("na"), F.sum(1 - F.col("is_a")).alias("nb")
    )
    wo = W.orderBy("cents").rowsBetween(W.unboundedPreceding, W.currentRow)
    wall = W.partitionBy()
    cum = dist.select(
        "cents",
        (F.sum("na").over(wo) / F.sum("na").over(wall)).alias("fa"),
        (F.sum("nb").over(wo) / F.sum("nb").over(wall)).alias("fb"),
        F.sum("na").over(wall).alias("ta"),
        F.sum("nb").over(wall).alias("tb"),
    )
    diff = F.abs(F.col("fa") - F.col("fb"))
    # ks rides a second bounded window so the argmax row can compare
    # against it without a self-join
    with_max = cum.withColumn("ks", F.max(diff).over(wall))
    return with_max.agg(
        F.max("ta").cast("long").alias(f"n_{KS_A}"),
        F.max("tb").cast("long").alias(f"n_{KS_B}"),
        F.max(diff).alias("ks_stat"),
        (
            F.min(F.when(diff == F.col("ks"), F.col("cents"))).cast("double") / 100.0
        ).alias("ks_location"),
    )


# ---------------------------------------------------------------------------
# Chi-square independence (SURVEY §2.13 [GAP→add] — completes the drift/
# quality trio with MAD and KS; also demonstrates the deterministic-order
# double summation technique for non-decimal-expressible aggregates)
# ---------------------------------------------------------------------------

#: user-bucket fan-out for the contingency table's second axis
CHI_BUCKETS = 4


@query(
    "dist_chi_square_independence",
    oracle=f"""
    WITH cells AS (
      SELECT event_type, user_id % {CHI_BUCKETS} AS bucket,
             COUNT(*) AS observed
      FROM events GROUP BY event_type, user_id % {CHI_BUCKETS}),
    margins AS (
      SELECT event_type, bucket, observed,
             SUM(observed) OVER (PARTITION BY event_type) AS row_total,
             SUM(observed) OVER (PARTITION BY bucket) AS col_total,
             SUM(observed) OVER () AS grand
      FROM cells),
    contrib AS (
      SELECT event_type, bucket, observed,
             CAST(row_total * col_total AS DOUBLE) / CAST(grand AS DOUBLE)
               AS expected
      FROM margins),
    ordered AS (
      SELECT
        SUM((CAST(observed AS DOUBLE) - expected)
            * (CAST(observed AS DOUBLE) - expected) / expected)
          OVER (ORDER BY event_type, bucket ROWS UNBOUNDED PRECEDING)
          AS chi2_running,
        ROW_NUMBER() OVER (ORDER BY event_type, bucket) AS rn,
        COUNT(*) OVER () AS n_cells
      FROM contrib)
    SELECT chi2_running AS chi2,
           CAST(n_cells AS BIGINT) AS n_cells
    FROM ordered WHERE rn = n_cells
    """,
    tags=("llm", "quality", "drift", "events"),
)
def dist_chi_square_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square statistic for independence of event_type × user-bucket —
    the contingency-table drift gate beside the MAD and KS audits. All
    counts and margins are exact integers; the per-cell contribution
    (O−E)²/E is a fixed double tree; and because chi² is a sum of
    non-decimal doubles, it accumulates via a RUNNING-SUM WINDOW in a
    fixed (event_type, bucket) order over the bounded cell table — both
    engines add the same terms in the same order, so the total is
    bit-identical without decimal casts (the technique for
    order-sensitive double aggregation over bounded frames).

    Scale shape: the only full-corpus pass is the partial-agg'd cell
    compression (|types| × CHI_BUCKETS rows); margins and the ordered
    accumulation are windows over that bounded table. Output: one row."""
    e = load(spark, sf_dir, "events")
    cells = e.groupBy(
        "event_type", (F.col("user_id") % CHI_BUCKETS).alias("bucket")
    ).agg(F.count(F.lit(1)).alias("observed"))
    margins = cells.select(
        "event_type",
        "bucket",
        "observed",
        F.sum("observed").over(W.partitionBy("event_type")).alias("row_total"),
        F.sum("observed").over(W.partitionBy("bucket")).alias("col_total"),
        F.sum("observed").over(W.partitionBy()).alias("grand"),
    )
    expected = (F.col("row_total") * F.col("col_total")).cast("double") / F.col(
        "grand"
    ).cast("double")
    contrib = margins.select(
        "event_type",
        "bucket",
        "observed",
        expected.alias("expected"),
    )
    term = (
        (F.col("observed").cast("double") - F.col("expected"))
        * (F.col("observed").cast("double") - F.col("expected"))
        / F.col("expected")
    )
    wo = W.orderBy("event_type", "bucket").rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    ordered = contrib.select(
        F.sum(term).over(wo).alias("chi2_running"),
        F.row_number().over(W.orderBy("event_type", "bucket")).alias("rn"),
        F.count(F.lit(1)).over(W.partitionBy()).alias("n_cells"),
    )
    return ordered.filter(F.col("rn") == F.col("n_cells")).select(
        F.col("chi2_running").alias("chi2"),
        F.col("n_cells").cast("long").alias("n_cells"),
    )


#: rolling window length (strictly-prior events) and the minimum history
#: before a z-score is meaningful
ZS_WINDOW = 50
ZS_MIN_N = 10
#: saturating domain clamp (+-10^7 cents = +-100,000.00 units): with
#: |cents| <= CAP and n <= ZS_WINDOW, the largest intermediate of the
#: multiplied-through test is 9 * n^2 * CAP^2 ~ 2.3e18 < 2^63 — the proof
#: that the BIGINT arithmetic cannot overflow on ANY input (fuzz-caught:
#: an un-clamped 1e9 reading overflowed Spark's ANSI multiply; a reading
#: beyond the cap is a domain-range defect for the DQ expectations gate,
#: not a distribution-drift signal for this one)
ZS_CENT_CAP = 10_000_000

#: the ONE definition of the NULL-safe saturating cents conversion shared
#: by every rolling gate over events.value (zscore, EWMA): NULL readings
#: stay NULL (inert in window statistics), finite readings saturate at
#: +-ZS_CENT_CAP so downstream BIGINT products cannot overflow
SQL_CLAMPED_CENTS = (
    "CASE WHEN value IS NULL THEN NULL"
    " ELSE LEAST(GREATEST(CAST(ROUND(value * 100, 0) AS BIGINT),"
    f" -{ZS_CENT_CAP}), {ZS_CENT_CAP}) END"
)


def clamped_cents() -> F.Column:
    """Spark twin of SQL_CLAMPED_CENTS. least/greatest SKIP null
    arguments in both engines, which would otherwise turn missing data
    into the extreme -CAP value and poison the window statistics."""
    return F.when(
        F.col("value").isNotNull(),
        F.least(
            F.greatest(
                F.round(F.col("value") * 100, 0).cast("long"),
                F.lit(-ZS_CENT_CAP).cast("long"),
            ),
            F.lit(ZS_CENT_CAP).cast("long"),
        ),
    )


@query(
    "anomaly_rolling_zscore",
    oracle=f"""
    WITH t AS (
      SELECT event_id, event_type,
             CAST(ts AS DATE) AS day,
             ts,
             {SQL_CLAMPED_CENTS} AS cents
      FROM events),
    w AS (
      SELECT event_id, event_type, cents,
             COUNT(cents) OVER win AS n_prior,
             SUM(cents)  OVER win AS s1,
             SUM(cents * cents) OVER win AS s2
      FROM t
      WINDOW win AS (PARTITION BY event_type, day ORDER BY ts, event_id
                     ROWS BETWEEN {ZS_WINDOW} PRECEDING AND 1 PRECEDING))
    SELECT event_id, event_type, cents,
           CAST(n_prior AS BIGINT) AS n_prior,
           CAST((cents * n_prior - s1) * (cents * n_prior - s1) AS BIGINT)
             AS dev2_scaled,
           CAST(9 * (n_prior * s2 - s1 * s1) AS BIGINT) AS thr2_scaled
    FROM w
    WHERE n_prior >= {ZS_MIN_N}
      AND (cents * n_prior - s1) * (cents * n_prior - s1)
            > 9 * (n_prior * s2 - s1 * s1)
    """,
    tags=("llm", "events", "anomaly", "timeseries"),
)
def anomaly_rolling_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling three-sigma gate over the event stream — the ONLINE
    counterpart of anomaly_mad_outliers: each event is tested against the
    mean/variance of its own strictly-prior ZS_WINDOW events (prior-only,
    so an anomaly cannot damp its own threshold), flagged when
    (x - mean)^2 > 9 * var.

    Exactness: the test multiplies through by n^2 —
    (x*n - s1)^2 > 9 * (n*s2 - s1^2) — so it is PURE BIGINT arithmetic:
    no division, no sqrt, no doubles anywhere, hence bit-identical across
    engines and partitionings. Bounds: values SATURATE at +-ZS_CENT_CAP
    cents, making the largest intermediate 9 * n^2 * CAP^2 ~ 2.3e18 < 2^63
    for ANY input at ANY corpus size (window length and clamp, not the
    data, bound the sums — an unbounded reading would overflow the ANSI
    multiply, fuzz-caught; beyond-cap readings are the DQ range gate's
    job).

    Scale shape: the window partitions by (event_type, DAY) — rolling
    state resets at day boundaries (documented semantic), which keeps
    each window partition bounded by a day's volume per type instead of
    an unbounded per-type total order; a production deployment tightens
    the bucket to the hour. One scan, one window, flagged rows only
    out."""
    t = load(spark, sf_dir, "events").select(
        "event_id",
        "event_type",
        F.col("ts").cast("date").alias("day"),
        "ts",
        clamped_cents().alias("cents"),
    )
    win = (
        W.partitionBy("event_type", "day")
        .orderBy("ts", "event_id")
        .rowsBetween(-ZS_WINDOW, -1)
    )
    w = t.select(
        "event_id",
        "event_type",
        "cents",
        # count CENTS, not rows: NULL readings contribute to neither the
        # sums nor the sample size (they are inert, the DQ gate's class)
        F.count("cents").over(win).alias("n_prior"),
        F.sum("cents").over(win).alias("s1"),
        F.sum(F.col("cents") * F.col("cents")).over(win).alias("s2"),
    )
    dev = F.col("cents") * F.col("n_prior") - F.col("s1")
    thr = 9 * (F.col("n_prior") * F.col("s2") - F.col("s1") * F.col("s1"))
    return (
        w.filter((F.col("n_prior") >= ZS_MIN_N) & (dev * dev > thr))
        .select(
            "event_id",
            "event_type",
            "cents",
            F.col("n_prior").cast("long").alias("n_prior"),
            (dev * dev).cast("long").alias("dev2_scaled"),
            thr.cast("long").alias("thr2_scaled"),
        )
    )


# ---------------------------------------------------------------------------
# EWMA residual gate — exponential smoothing in exact power-of-two weights
# ---------------------------------------------------------------------------

#: number of strictly-prior readings the EWMA folds (alpha = 1/2, so the
#: i-th most recent prior carries weight 2^(EWMA_LAGS - i) — EXACT
#: power-of-two integers, no float decay anywhere)
EWMA_LAGS = 8
#: minimum prior readings before a residual is meaningful
EWMA_MIN_N = 4
#: absolute residual threshold, in cents (150.00 units)
EWMA_THRESHOLD_CENTS = 15_000

_EWMA_W = [1 << (EWMA_LAGS - i) for i in range(1, EWMA_LAGS + 1)]

_EWMA_NUM_SQL = " + ".join(
    f"COALESCE(l{i}, 0) * {w}" for i, w in enumerate(_EWMA_W, start=1)
)
_EWMA_DEN_SQL = " + ".join(
    f"CASE WHEN l{i} IS NOT NULL THEN {w} ELSE 0 END"
    for i, w in enumerate(_EWMA_W, start=1)
)
_EWMA_N_SQL = " + ".join(
    f"CASE WHEN l{i} IS NOT NULL THEN 1 ELSE 0 END"
    for i in range(1, EWMA_LAGS + 1)
)


@query(
    "anomaly_ewma_residual",
    oracle=f"""
    WITH t AS (
      SELECT event_id, event_type,
             CAST(ts AS DATE) AS day,
             ts,
             {SQL_CLAMPED_CENTS} AS cents
      FROM events),
    l AS (
      SELECT event_id, event_type, cents,
             {", ".join(f"LAG(cents, {i}) OVER win AS l{i}"
                        for i in range(1, EWMA_LAGS + 1))}
      FROM t
      WINDOW win AS (PARTITION BY event_type, day ORDER BY ts, event_id)),
    w AS (
      SELECT event_id, event_type, cents,
             CAST({_EWMA_NUM_SQL} AS BIGINT) AS ewma_num,
             CAST({_EWMA_DEN_SQL} AS BIGINT) AS ewma_den,
             CAST({_EWMA_N_SQL} AS BIGINT) AS n_prior
      FROM l)
    SELECT event_id, event_type, cents, ewma_num, ewma_den, n_prior
    FROM w
    WHERE n_prior >= {EWMA_MIN_N}
      AND ABS(cents * ewma_den - ewma_num) > {EWMA_THRESHOLD_CENTS} * ewma_den
    """,
    tags=("llm", "events", "anomaly", "timeseries"),
)
def anomaly_ewma_residual(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EWMA residual gate over the event stream — exponential smoothing
    (alpha = 1/2) of each event's strictly-prior readings, flagging
    events whose value departs the smoothed level by more than
    EWMA_THRESHOLD_CENTS. Complements anomaly_rolling_zscore: the
    z-score gate adapts its threshold to local variance, this one holds
    an absolute band around a recency-weighted level (the SRE latency /
    spend-monitor shape), so a regime where variance inflates first
    cannot mask a level shift.

    Exactness: with alpha = 1/2 the lag weights are exact powers of two
    (128, 64, ..., 1), so the smoothed level is the integer pair
    (ewma_num, ewma_den) and the band test multiplies through by the
    denominator — |cents*den - num| > T*den. PURE BIGINT: no float
    decay, no division, bit-identical across engines and partitionings.
    NULL readings occupy their lag slot but carry zero weight and zero
    denominator (positional priors, value-missing); the clamp
    (SQL_CLAMPED_CENTS, shared with the z-score gate) bounds every
    product: |cents|*den <= 1e7 * 255 ~ 2.6e9 << 2^63.

    Scale shape: identical to the z-score gate — one scan, one window
    partitioned by (event_type, day) so per-partition state is bounded
    by a day's volume per type, flagged rows only out; the EWMA_LAGS
    LAGs share ONE window frame (a single sort per partition in both
    engines)."""
    t = load(spark, sf_dir, "events").select(
        "event_id",
        "event_type",
        F.col("ts").cast("date").alias("day"),
        "ts",
        clamped_cents().alias("cents"),
    )
    return (
        ewma_components(t)
        .filter(ewma_is_anomalous())
        .select(
            "event_id", "event_type", "cents", "ewma_num", "ewma_den", "n_prior"
        )
    )


def ewma_components(df: DataFrame) -> DataFrame:
    """Append ``ewma_num`` / ``ewma_den`` / ``n_prior`` to a frame carrying
    (event_id, event_type, day, ts, cents) — the ONE definition of the
    power-of-two lag fold, shared by the batch ``anomaly_ewma_residual``
    query and the streaming ``AnomalyGateSink`` so the smoothing
    arithmetic cannot drift between modes. Extra columns (e.g. the sink's
    ``is_batch`` tag) pass through untouched; the EWMA_LAGS LAGs share
    ONE window frame."""
    win = W.partitionBy("event_type", "day").orderBy("ts", "event_id")
    lags = [F.lag("cents", i).over(win) for i in range(1, EWMA_LAGS + 1)]
    num = sum(
        (F.coalesce(lag, F.lit(0)) * w for lag, w in zip(lags, _EWMA_W)),
        F.lit(0),
    )
    den = sum(
        (F.when(lag.isNotNull(), w).otherwise(0) for lag, w in zip(lags, _EWMA_W)),
        F.lit(0),
    )
    n_prior = sum(
        (F.when(lag.isNotNull(), 1).otherwise(0) for lag in lags), F.lit(0)
    )
    return df.select(
        "*",
        num.cast("long").alias("ewma_num"),
        den.cast("long").alias("ewma_den"),
        n_prior.cast("long").alias("n_prior"),
    )


def ewma_is_anomalous() -> F.Column:
    """The band test over :func:`ewma_components` output — multiplied
    through by the denominator, NULL cents rows evaluate NULL and are
    filtered (never flagged)."""
    resid = F.abs(F.col("cents") * F.col("ewma_den") - F.col("ewma_num"))
    return (F.col("n_prior") >= EWMA_MIN_N) & (
        resid > EWMA_THRESHOLD_CENTS * F.col("ewma_den")
    )


# ---------------------------------------------------------------------------
# CUSUM level-shift gate — Page's cumulative-sum control chart as a
# running-sum/running-min window rewrite (no recursion needed)
# ---------------------------------------------------------------------------

#: days whose mean establishes the in-control baseline level
CUSUM_BASELINE_DAYS = 7
#: slack (allowance) k, in cents: drift below this per day is absorbed
CUSUM_SLACK_CENTS = 500
#: decision threshold H, in cents of accumulated excess
CUSUM_THRESHOLD_CENTS = 20_000


@query(
    "anomaly_cusum_gate",
    oracle=f"""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(SUM(COALESCE({SQL_CLAMPED_CENTS}, 0)) AS HUGEINT)
               AS daily_cents
      FROM events GROUP BY event_type, CAST(ts AS DATE)),
    r AS (
      SELECT event_type, day, daily_cents,
             ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY day)
               AS day_rank
      FROM daily),
    base AS (
      SELECT event_type,
             CAST(SUM(daily_cents) AS HUGEINT) AS base_num,
             CAST(COUNT(*) AS HUGEINT) AS base_den
      FROM r WHERE day_rank <= {CUSUM_BASELINE_DAYS} GROUP BY event_type),
    y AS (
      SELECT r.event_type, r.day, r.day_rank, r.daily_cents,
             base.base_num, base.base_den,
             r.daily_cents * base.base_den - base.base_num
               - {CUSUM_SLACK_CENTS} * base.base_den AS y_scaled
      FROM r JOIN base ON base.event_type = r.event_type),
    p AS (
      SELECT event_type, day, day_rank, daily_cents, base_num, base_den,
             SUM(y_scaled) OVER w AS cum
      FROM y
      WINDOW w AS (PARTITION BY event_type ORDER BY day
                   ROWS UNBOUNDED PRECEDING)),
    c AS (
      SELECT event_type, day, day_rank, daily_cents, base_num, base_den,
             cum,
             MIN(cum) OVER w AS runmin
      FROM p
      WINDOW w AS (PARTITION BY event_type ORDER BY day
                   ROWS UNBOUNDED PRECEDING))
    SELECT event_type,
           STRFTIME(day, '%Y-%m-%d') AS day,
           CAST(day_rank AS BIGINT) AS day_rank,
           CAST(daily_cents AS BIGINT) AS daily_cents,
           CAST(cum - LEAST(0, runmin) AS BIGINT) AS cusum_scaled,
           CAST(base_num AS BIGINT) AS base_num,
           CAST(base_den AS BIGINT) AS base_den,
           day_rank > {CUSUM_BASELINE_DAYS}
             AND cum - LEAST(0, runmin)
                 > {CUSUM_THRESHOLD_CENTS} * base_den AS is_shift
    FROM c
    """,
    tags=("llm", "events", "anomaly", "timeseries"),
)
def anomaly_cusum_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM level-shift detection (Page 1954 — the control chart SRE
    and data-quality pipelines run on daily volume/spend series) over
    per-type daily event-value totals. The third member of the gate
    family: the z-score gate adapts to local variance, the EWMA gate
    holds an absolute band around a recency-weighted level, CUSUM
    accumulates small persistent drifts that neither flags — a +6%/day
    shift that never breaches a per-day band trips the cumulative sum.

    The textbook recursion S_i = max(0, S_{i-1} + y_i) needs no
    recursion relationally: with partial sums P_i (P_0 = 0),
    S_i = P_i − min(0, min_{j<=i} P_j) — ONE running-sum window and ONE
    running-min over it, both in the same frame. The baseline level is
    the first CUSUM_BASELINE_DAYS days' mean held as the exact integer
    pair (base_num, base_den); every term is multiplied through by
    base_den so the whole chart is division-free integer arithmetic
    (daily sums fold as HUGEINT/decimal wide integers — the
    ts_autocorrelation discipline; displayed columns cast to BIGINT,
    exact to 2^63 of scaled cents).

    Flags only after the baseline window (day_rank > baseline); all
    (type, day) rows are emitted with their chart state so the oracle
    certifies the rewrite on every row, not just the shifts.

    Scale shape: the ONLY stream-sized op is the map-side-combined
    daily rollup (shuffle bounded by types x days); baseline is a
    per-type broadcast; both windows run over the bounded daily table
    partitioned by type. Reference has no anomaly surface
    (spark/preprocessor.py passes value through) — SURVEY §2.13
    [GAP→add] family."""
    return cusum_chart(cusum_daily(load(spark, sf_dir, "events")))


def cusum_daily(events_df: DataFrame) -> DataFrame:
    """Per-(type, day) clamped-cents totals as DECIMAL(38,0) — the ONE
    stream-sized rollup, and the mergeable partial the streaming
    ``CusumGateSink`` stores per epoch (daily sums ADD across epochs,
    so the sink's merged deltas reproduce this table exactly for any
    micro-batch split, in-order or not)."""
    return events_df.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(
        F.sum(F.coalesce(clamped_cents(), F.lit(0)).cast("decimal(18,0)"))
        .cast("decimal(38,0)")
        .alias("daily_cents")
    )


def cusum_chart(daily: DataFrame) -> DataFrame:
    """The full CUSUM chart over a (event_type, day, daily_cents) table
    — shared by the batch operator and the streaming sink (one
    definition, no drift). See ``anomaly_cusum_gate`` for semantics."""
    wr = W.partitionBy("event_type").orderBy("day")
    r = daily.select(
        "event_type", "day", "daily_cents",
        F.row_number().over(wr).alias("day_rank"),
    )
    base = (
        r.filter(F.col("day_rank") <= CUSUM_BASELINE_DAYS)
        .groupBy("event_type")
        .agg(
            F.sum("daily_cents").cast("decimal(38,0)").alias("base_num"),
            F.count(F.lit(1)).cast("decimal(38,0)").alias("base_den"),
        )
    )
    y = r.join(F.broadcast(base), "event_type").select(
        "event_type", "day", "day_rank", "daily_cents", "base_num", "base_den",
        (
            F.col("daily_cents") * F.col("base_den")
            - F.col("base_num")
            - F.lit(CUSUM_SLACK_CENTS) * F.col("base_den")
        ).alias("y_scaled"),
    )
    wc = (
        W.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    cum = F.sum("y_scaled").over(wc)
    c = y.select(
        "event_type", "day", "day_rank", "daily_cents", "base_num", "base_den",
        cum.alias("cum"),
        F.min(cum).over(wc).alias("runmin"),
    )
    s = F.col("cum") - F.least(F.lit(0).cast("decimal(38,0)"), F.col("runmin"))
    return c.select(
        "event_type",
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        F.col("day_rank").cast("long").alias("day_rank"),
        F.col("daily_cents").cast("long").alias("daily_cents"),
        s.cast("long").alias("cusum_scaled"),
        F.col("base_num").cast("long").alias("base_num"),
        F.col("base_den").cast("long").alias("base_den"),
        (
            (F.col("day_rank") > CUSUM_BASELINE_DAYS)
            & (s > F.lit(CUSUM_THRESHOLD_CENTS) * F.col("base_den"))
        ).alias("is_shift"),
    )


# ---------------------------------------------------------------------------
# weekday-profile residual gate — calendar-aware seasonality baseline
# ---------------------------------------------------------------------------

#: absolute residual threshold vs the weekday profile, in cents
SEASONAL_THRESHOLD_CENTS = 25_000


@query(
    "anomaly_seasonal_residual",
    oracle=f"""
    WITH daily AS (
      SELECT event_type,
             DATE_DIFF('day', DATE '1970-01-01', CAST(ts AS DATE)) AS di,
             CAST(SUM(COALESCE({SQL_CLAMPED_CENTS}, 0)) AS HUGEINT)
               AS daily_cents
      FROM events GROUP BY event_type, di),
    prof AS (
      SELECT event_type, di % 7 AS dow,
             CAST(SUM(daily_cents) AS HUGEINT) AS s_num,
             CAST(COUNT(*) AS HUGEINT) AS s_den
      FROM daily GROUP BY event_type, di % 7)
    SELECT d.event_type,
           CAST(d.di AS BIGINT) AS di,
           CAST(d.di % 7 AS BIGINT) AS dow,
           CAST(d.daily_cents AS BIGINT) AS daily_cents,
           CAST(p.s_num AS BIGINT) AS s_num,
           CAST(p.s_den AS BIGINT) AS s_den,
           CAST(d.daily_cents * p.s_den - p.s_num AS BIGINT)
             AS resid_scaled,
           p.s_den > 1
             AND ABS(d.daily_cents * p.s_den - p.s_num)
                 > {SEASONAL_THRESHOLD_CENTS} * p.s_den AS is_anomaly
    FROM daily d JOIN prof p
      ON p.event_type = d.event_type AND p.dow = d.di % 7
    """,
    tags=("llm", "events", "anomaly", "timeseries"),
)
def anomaly_seasonal_residual(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonality-aware residual gate — the fourth member of the gate
    family: z-score adapts to local variance, EWMA tracks a recency
    level, CUSUM accumulates drifts, and THIS one removes the weekly
    profile first, so a quiet-Sunday / busy-Monday corpus doesn't page
    on every Monday (the classic false-positive of level-based gates).
    Each (type, day)'s total is compared against the mean of ITS OWN
    weekday class; the residual is the division-free pair
    (x·s_den − s_num) tested against T·s_den.

    The weekday class is di % 7 (epoch-day modulo), NOT the engines'
    dayofweek() — Spark numbers Sunday 1 and DuckDB numbers Sunday 0,
    so the modulo is the only engine-portable spelling (and the gate
    needs a stable 7-class partition, not a named weekday). Sums fold
    as wide integers (HUGEINT / DECIMAL(38,0) — the r11 discipline).
    A class observed once compares a day against only itself (residual
    identically 0), so it can never flag; the s_den > 1 guard states
    that explicitly rather than relying on the identity.

    Scale shape: one map-side-combined daily rollup (types x days),
    profile is a types x 7 aggregate riding a broadcast join back;
    every (type, day) row is emitted with its profile evidence so the
    oracle certifies the de-seasonalization on every row."""
    return seasonal_flags(seasonal_daily(load(spark, sf_dir, "events")))


def seasonal_daily(events_df: DataFrame) -> DataFrame:
    """Per-(type, epoch-day-index) clamped-cents totals as DECIMAL(38,0)
    — the mergeable partial the streaming ``SeasonalGateSink`` stores
    per epoch (the ``cusum_daily`` discipline keyed by the integer day
    index the weekday classes derive from)."""
    return events_df.groupBy(
        "event_type",
        F.datediff(F.col("ts").cast("date"), F.lit("1970-01-01").cast("date"))
        .alias("di"),
    ).agg(
        F.sum(F.coalesce(clamped_cents(), F.lit(0)).cast("decimal(18,0)"))
        .cast("decimal(38,0)")
        .alias("daily_cents")
    )


def seasonal_flags(daily: DataFrame) -> DataFrame:
    """The weekday-profile residual gate over a (event_type, di,
    daily_cents) table — shared by the batch operator and the streaming
    sink (one definition, no drift). See ``anomaly_seasonal_residual``
    for semantics."""
    prof = (
        daily.groupBy("event_type", (F.col("di") % 7).alias("dow"))
        .agg(
            F.sum("daily_cents").cast("decimal(38,0)").alias("s_num"),
            F.count(F.lit(1)).cast("decimal(38,0)").alias("s_den"),
        )
    )
    j = (
        daily.alias("d")
        .join(
            F.broadcast(prof.alias("p")),
            (F.col("d.event_type") == F.col("p.event_type"))
            & (F.col("p.dow") == F.col("d.di") % 7),
        )
        .select(
            F.col("d.event_type").alias("event_type"),
            F.col("d.di").alias("di"),
            F.col("p.dow").alias("dow"),
            F.col("d.daily_cents").alias("daily_cents"),
            F.col("p.s_num").alias("s_num"),
            F.col("p.s_den").alias("s_den"),
        )
    )
    resid = F.col("daily_cents") * F.col("s_den") - F.col("s_num")
    return j.select(
        "event_type",
        F.col("di").cast("long").alias("di"),
        F.col("dow").cast("long").alias("dow"),
        F.col("daily_cents").cast("long").alias("daily_cents"),
        F.col("s_num").cast("long").alias("s_num"),
        F.col("s_den").cast("long").alias("s_den"),
        resid.cast("long").alias("resid_scaled"),
        (
            (F.col("s_den") > 1)
            & (F.abs(resid) > F.lit(SEASONAL_THRESHOLD_CENTS) * F.col("s_den"))
        ).alias("is_anomaly"),
    )


# ---------------------------------------------------------------------------
# row-pattern recognition — MATCH_RECOGNIZE semantics as LEAD chains
# ---------------------------------------------------------------------------


@query(
    "agg_match_recognize",
    oracle=f"""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(SUM(COALESCE({SQL_CLAMPED_CENTS}, 0)) AS HUGEINT)
               AS daily_cents
      FROM events GROUP BY event_type, CAST(ts AS DATE)),
    l AS (
      SELECT event_type, day, daily_cents,
             LEAD(daily_cents, 1) OVER w AS d1,
             LEAD(daily_cents, 2) OVER w AS d2,
             LEAD(daily_cents, 3) OVER w AS d3,
             LEAD(daily_cents, 4) OVER w AS d4,
             LEAD(day, 2) OVER w AS trough_day,
             LEAD(day, 4) OVER w AS end_day
      FROM daily
      WINDOW w AS (PARTITION BY event_type ORDER BY day))
    SELECT event_type,
           STRFTIME(day, '%Y-%m-%d') AS start_day,
           STRFTIME(trough_day, '%Y-%m-%d') AS trough_day,
           STRFTIME(end_day, '%Y-%m-%d') AS end_day,
           CAST(daily_cents AS BIGINT) AS start_cents,
           CAST(d2 AS BIGINT) AS trough_cents,
           CAST(d4 AS BIGINT) AS end_cents,
           CAST(daily_cents - d2 AS BIGINT) AS depth_cents,
           CAST(d4 - d2 AS BIGINT) AS recovery_cents
    FROM l
    WHERE d4 IS NOT NULL
      AND daily_cents > d1 AND d1 > d2
      AND d3 > d2 AND d4 > d3
    """,
    tags=("events", "window", "timeseries", "agg"),
)
def agg_match_recognize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-pattern recognition — SQL:2016 MATCH_RECOGNIZE's
    ``PATTERN (STRT DOWN DOWN UP UP)`` over per-type daily totals,
    provided as a composition since NEITHER engine ships the clause
    (Spark has no MATCH_RECOGNIZE; DuckDB likewise): a fixed-length
    pattern over ROW adjacency compiles to a LEAD chain sharing ONE
    window — row i opens a match iff the next four rows satisfy the
    per-step predicates (strict fall, strict fall, strict rise, strict
    rise). This is the V-shape / dip-and-recovery detector a spend or
    volume monitor runs; emitted evidence (start/trough/end days and
    cents, depth, recovery) is exactly MATCH_RECOGNIZE's MEASURES
    clause. ALL overlapping matches are reported (AFTER MATCH SKIP TO
    NEXT ROW semantics — the most informative default; consumers
    wanting SKIP PAST LAST ROW filter on start_day spacing downstream).

    Adjacency is ROW adjacency in the ordered daily series (the
    MATCH_RECOGNIZE contract), not calendar adjacency — a missing day
    simply does not produce a row, like a gap in a ticker. Wide-integer
    daily sums (the r11 discipline); every comparison and measure is
    exact integer arithmetic.

    Scale shape: one map-side-combined daily rollup (types x days), the
    four LEADs share one window partitioned by type over the bounded
    daily table, matches filter map-side."""
    daily = cusum_daily(load(spark, sf_dir, "events"))
    wl = W.partitionBy("event_type").orderBy("day")
    l = daily.select(
        "event_type",
        "day",
        "daily_cents",
        F.lead("daily_cents", 1).over(wl).alias("d1"),
        F.lead("daily_cents", 2).over(wl).alias("d2"),
        F.lead("daily_cents", 3).over(wl).alias("d3"),
        F.lead("daily_cents", 4).over(wl).alias("d4"),
        F.lead("day", 2).over(wl).alias("trough_day"),
        F.lead("day", 4).over(wl).alias("end_day"),
    )
    return l.filter(
        F.col("d4").isNotNull()
        & (F.col("daily_cents") > F.col("d1"))
        & (F.col("d1") > F.col("d2"))
        & (F.col("d3") > F.col("d2"))
        & (F.col("d4") > F.col("d3"))
    ).select(
        "event_type",
        F.date_format("day", "yyyy-MM-dd").alias("start_day"),
        F.date_format("trough_day", "yyyy-MM-dd").alias("trough_day"),
        F.date_format("end_day", "yyyy-MM-dd").alias("end_day"),
        F.col("daily_cents").cast("long").alias("start_cents"),
        F.col("d2").cast("long").alias("trough_cents"),
        F.col("d4").cast("long").alias("end_cents"),
        (F.col("daily_cents") - F.col("d2")).cast("long").alias("depth_cents"),
        (F.col("d4") - F.col("d2")).cast("long").alias("recovery_cents"),
    )
