"""Fixed-point Lloyd's k-means over the embeddings table (SURVEY §2.12
[GAP→add]) — the third exact-iterative exemplar beside `algo_pagerank`
and `embed_power_iteration`, and the oracle-checkable counterpart of the
sample-fit KMeans used by `sim_ann_ivf` / `embed_semdedup` (pyspark.ml
KMeans is seeded-random and engine-specific; this one is bit-exact in
ANY engine).

Exactness: embeddings quantize to integer millionths; squared distances
are exact BIGINT sums (≤ 64·(2.4e6)² ≈ 3.7e14 per pair); assignments
break ties on (dist, cid) — a total order over integers, so every
assignment is deterministic; centroid updates are exact integer mean
(SUM DIV COUNT, truncation identical in Spark DIV and DuckDB //).
Init is the first K vectors by id (deterministic, no RNG).

Scale shape: the points triples are scope-persisted and shuffle once;
each iteration joins the K×64-row centroid table in BROADCAST, computes
per-(point, centroid) distances with map-side partial aggregation, picks
the argmin with a per-point window over K rows (bounded fan-in), and
re-aggregates centroids as one partial-agg'd groupBy. Nothing quadratic,
nothing driver-side; iterations unroll in the plan like algo_pagerank.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from projet_pipeline_bigdata_org_spark.catalog import load
from projet_pipeline_bigdata_org_spark.operators.similarity import PW_XS
from projet_pipeline_bigdata_org_spark.plans.registry import query

KM_K = 4
KM_ITERS = 2


def _km_iteration_sql(prev_c: str, idx: int) -> str:
    """One Lloyd iteration: exact distances → deterministic argmin →
    exact integer centroid update (empty clusters keep their centroid)."""
    return f"""
    d{idx} AS (
      SELECT p.vec_id, c.cid,
             CAST(SUM((p.xs - c.cs) * (p.xs - c.cs)) AS BIGINT) AS dist
      FROM pts p JOIN {prev_c} c USING (dim)
      GROUP BY p.vec_id, c.cid),
    a{idx} AS (
      SELECT vec_id, cid, dist FROM (
        SELECT vec_id, cid, dist,
               ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
        FROM d{idx})
      WHERE rn = 1),
    c{idx} AS (
      SELECT g.cid, g.dim, COALESCE(u.cs, g.cs) AS cs
      FROM {prev_c} g
      LEFT JOIN (
        SELECT a.cid, p.dim, CAST(SUM(p.xs) AS BIGINT) // COUNT(*) AS cs
        FROM pts p JOIN a{idx} a USING (vec_id)
        GROUP BY a.cid, p.dim) u
      ON u.cid = g.cid AND u.dim = g.dim)"""


@query(
    "cluster_kmeans_fixed_point",
    oracle=f"""
    WITH pts AS (
      SELECT vec_id, i - 1 AS dim,
             CAST(ROUND(CAST(embedding[i] AS DOUBLE) * {PW_XS}, 0) AS BIGINT) AS xs
      FROM embeddings, UNNEST(GENERATE_SERIES(1, LEN(embedding))) AS t(i)),
    c0 AS (
      SELECT vec_id AS cid, dim, xs AS cs FROM pts WHERE vec_id < {KM_K}),
    {_km_iteration_sql('c0', 1)},
    {_km_iteration_sql('c1', 2)}
    SELECT a.vec_id, CAST(a.cid AS BIGINT) AS cluster, a.dist,
           CAST(COUNT(*) OVER (PARTITION BY a.cid) AS BIGINT) AS cluster_size
    FROM a{KM_ITERS} a
    """,
    tags=("llm", "embedding", "clustering", "iterative", "embeddings"),
)
def cluster_kmeans_fixed_point(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two unrolled Lloyd iterations of k-means (K=4) in exact integer
    arithmetic — per-point final assignment, its exact squared distance,
    and the cluster population. See the module docstring for the
    exactness and scale rationale."""
    from projet_pipeline_bigdata_org_spark.operators.dedup import _persist_scoped

    e = load(spark, sf_dir, "embeddings")
    pts = _persist_scoped(
        "kmeans_pts",
        e.select("vec_id", F.posexplode("embedding").alias("dim", "xv")).select(
            "vec_id",
            "dim",
            F.round(F.col("xv").cast("double") * PW_XS, 0).cast("long").alias("xs"),
        ),
    )
    cent = pts.filter(F.col("vec_id") < KM_K).select(
        F.col("vec_id").alias("cid"), "dim", F.col("xs").alias("cs")
    )
    assign = None
    for _ in range(KM_ITERS):
        dist = (
            pts.join(F.broadcast(cent), "dim")
            .groupBy("vec_id", "cid")
            .agg(
                F.sum((F.col("xs") - F.col("cs")) * (F.col("xs") - F.col("cs")))
                .cast("long")
                .alias("dist")
            )
        )
        rn = F.row_number().over(W.partitionBy("vec_id").orderBy("dist", "cid"))
        assign = dist.withColumn("rn", rn).filter(F.col("rn") == 1).drop("rn")
        updated = (
            pts.join(assign.select("vec_id", "cid"), "vec_id")
            .groupBy("cid", "dim")
            .agg(F.expr("CAST(SUM(xs) AS BIGINT) DIV COUNT(*)").alias("cs_new"))
        )
        cent = (
            cent.join(updated, ["cid", "dim"], "left")
            .select("cid", "dim", F.coalesce("cs_new", "cs").alias("cs"))
        )
    return assign.select(
        "vec_id",
        F.col("cid").cast("long").alias("cluster"),
        "dist",
        F.count(F.lit(1))
        .over(W.partitionBy("cid"))
        .cast("long")
        .alias("cluster_size"),
    )
