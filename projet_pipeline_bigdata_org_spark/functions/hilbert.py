"""Hilbert-curve key for multi-dimensional lake clustering — the
locality-preserving sibling of the Morton interleave (functions/zorder.py).

Z-order is cheap (pure bit interleave) but jumps: consecutive keys can sit
in distant cells at quadrant boundaries, so a file covering a key range
can cover TWO distant rectangles and footer stats prune less than the
range suggests. The Hilbert curve (Hilbert 1891; Butz 1971 algorithm) has
the adjacency property — consecutive keys are ALWAYS unit-adjacent cells —
so every key range covers one contiguous blob, the reason Delta liquid
clustering moved from Z-order to Hilbert. The cost is that the key is an
iterated rotation, not a single expression.

Engine-portable by construction, the zorder discipline: the transform is
HILBERT_BITS unrolled rounds of shift/mask/CASE arithmetic over clamped
16-bit dimensions. :func:`with_hilbert_key` chains one projection per
round on the Spark side (Catalyst collapses them into one codegen stage —
chaining avoids the 2^rounds expression-tree blowup a single Column would
suffer); :func:`sql_hilbert_ctes` emits the identical rounds as chained
DuckDB CTEs, so an oracle replays the exact bits. :func:`xy2d_ref` is the
pure-Python reference both are tested against, including the small-grid
bijection + unit-adjacency proof that *defines* the curve.

NULL discipline: a NULL in either dimension must yield a NULL key. That
needs an EXPLICIT seed guard — inside the rounds a NULL coordinate pushes
every CASE to its ELSE arm (rx/ry compare NULL), which would silently
alias NULL rows to key 0; seeding the accumulator as NULL instead lets
``NULL + x`` propagate through every round.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: bits per dimension (2 x 16 -> 32-bit key, the zorder grid exactly)
HILBERT_BITS = 16
HILBERT_N = 1 << HILBERT_BITS
HILBERT_MAX = HILBERT_N - 1


def xy2d_ref(n: int, x: int, y: int) -> int:
    """Pure-Python reference transform (Butz/Wikipedia xy2d, reflection by
    n-1 so coordinates stay in [0, n) every round)."""
    d = 0
    s = n // 2
    while s > 0:
        rx = 1 if (x & s) > 0 else 0
        ry = 1 if (y & s) > 0 else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                x = n - 1 - x
                y = n - 1 - y
            x, y = y, x
        s //= 2
    return d


def clamp_dim(c: Column) -> Column:
    """Clamp a dimension to the 16-bit grid, preserving NULL."""
    v = c.cast("long")
    return F.when(v.isNull(), F.lit(None).cast("long")).otherwise(
        F.least(F.greatest(v, F.lit(0)), F.lit(HILBERT_MAX))
    )


def sql_clamp_dim(v: str) -> str:
    """DuckDB twin of :func:`clamp_dim`."""
    return (
        f"CASE WHEN {v} IS NULL THEN NULL "
        f"ELSE LEAST(GREATEST(CAST({v} AS BIGINT), 0), {HILBERT_MAX}) END"
    )


def _quad_when(rx: Column, ry: Column) -> Column:
    # (3*rx) XOR ry as an explicit CASE (identical text semantics in SQL)
    return (
        F.when((rx == 1) & (ry == 1), 2)
        .when(rx == 1, 3)
        .when(ry == 1, 1)
        .otherwise(0)
    )


def with_hilbert_key(
    df: DataFrame, x: Column, y: Column, out: str = "h"
) -> DataFrame:
    """Append the Hilbert key of (x, y) as column ``out`` — one chained
    projection per round (Catalyst collapses the chain; a single nested
    Column expression would double in size every round). NULL in either
    dimension yields a NULL key via the seeded-NULL accumulator."""
    cx, cy = clamp_dim(x), clamp_dim(y)
    df = df.withColumns(
        {
            "_hx": cx,
            "_hy": cy,
            out: F.when(cx.isNull() | cy.isNull(), F.lit(None))
            .otherwise(F.lit(0))
            .cast("long"),
        }
    )
    for k in range(HILBERT_BITS - 1, -1, -1):
        s = 1 << k
        rx = F.shiftright(F.col("_hx"), k).bitwiseAND(F.lit(1))
        ry = F.shiftright(F.col("_hy"), k).bitwiseAND(F.lit(1))
        nx = F.when(
            ry == 0,
            F.when(rx == 1, F.lit(HILBERT_N - 1) - F.col("_hy")).otherwise(
                F.col("_hy")
            ),
        ).otherwise(F.col("_hx"))
        ny = F.when(
            ry == 0,
            F.when(rx == 1, F.lit(HILBERT_N - 1) - F.col("_hx")).otherwise(
                F.col("_hx")
            ),
        ).otherwise(F.col("_hy"))
        df = df.withColumns(
            {
                # s*s reaches 2^30; the long cast keeps the quad multiply
                # out of int32 (ANSI overflow at k=15 otherwise)
                out: F.col(out)
                + F.lit(s * s).cast("long") * _quad_when(rx, ry).cast("long"),
                "_hx": nx,
                "_hy": ny,
            }
        )
    return df.drop("_hx", "_hy")


def sql_hilbert_ctes(
    src: str, carried: list[str], cx: str, cy: str, out_cte: str
) -> str:
    """DuckDB twin of :func:`with_hilbert_key`: chained CTE text
    computing the identical rounds. ``src`` must expose ``carried``
    columns plus pre-clamped BIGINT dims ``cx``/``cy``; the final CTE
    ``out_cte`` exposes ``carried`` + ``h``. Returns the CTE list
    fragment to splice after a WITH (no leading/trailing comma)."""
    keep = ", ".join(carried)
    seed = (
        f"h_r{HILBERT_BITS} AS (SELECT {keep}, {cx} AS hx, {cy} AS hy, "
        f"CASE WHEN {cx} IS NULL OR {cy} IS NULL THEN NULL ELSE 0 END AS hd "
        f"FROM {src})"
    )
    ctes = [seed]
    for k in range(HILBERT_BITS - 1, -1, -1):
        s = 1 << k
        rx = f"((hx >> {k}) & 1)"
        ry = f"((hy >> {k}) & 1)"
        quad = (
            f"CASE WHEN {rx} = 1 AND {ry} = 1 THEN 2 "
            f"WHEN {rx} = 1 THEN 3 WHEN {ry} = 1 THEN 1 ELSE 0 END"
        )
        nx = (
            f"CASE WHEN {ry} = 0 THEN "
            f"(CASE WHEN {rx} = 1 THEN {HILBERT_N - 1} - hy ELSE hy END) "
            f"ELSE hx END"
        )
        ny = (
            f"CASE WHEN {ry} = 0 THEN "
            f"(CASE WHEN {rx} = 1 THEN {HILBERT_N - 1} - hx ELSE hx END) "
            f"ELSE hy END"
        )
        ctes.append(
            f"h_r{k} AS (SELECT {keep}, {nx} AS hx, {ny} AS hy, "
            f"hd + CAST({s * s} AS BIGINT) * ({quad}) AS hd FROM h_r{k + 1})"
        )
    ctes.append(f"{out_cte} AS (SELECT {keep}, hd AS h FROM h_r0)")
    return ",\n    ".join(ctes)
