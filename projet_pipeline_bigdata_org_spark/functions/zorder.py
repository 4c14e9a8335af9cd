"""Morton (Z-order) interleave key for multi-dimensional lake clustering.

A lake table is physically ordered by ONE sort key; queries that box-filter
on TWO dimensions (customer x date, user x time) prune almost nothing under
a single-column sort. Interleaving the bits of both dimensions into one
key (Morton 1966 — the technique behind Delta/Iceberg OPTIMIZE ZORDER)
makes files cover small axis-aligned rectangles of the value space, so
min/max footer stats skip most files for any 2-D box predicate.

Engine-portable by construction: the key is plain BIGINT shift/mask/add
arithmetic over clamped 16-bit dimension values — ``morton_key`` builds the
Spark column, ``sql_clamp16``/``sql_morton_key`` the identical DuckDB
expression, so an oracle can replay the exact bits (the repo's hash_coin /
SQL_TOK_NULLSAFE shared-constant discipline).

NULL discipline (see cross-engine notes): LEAST/GREATEST skip NULL
arguments in BOTH engines, so clamping must explicitly guard NULL dims —
a NULL dimension yields a NULL key (callers route NULL-keyed rows to a
dedicated file / bucket rather than aliasing them to coordinate 0).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: bits kept per dimension; 2 x 16 interleave to a 32-bit key (exact BIGINT)
ZORDER_BITS = 16
ZORDER_MAX = (1 << ZORDER_BITS) - 1


def clamp16(c: Column) -> Column:
    """Clamp a dimension to the 16-bit grid, preserving NULL (LEAST/GREATEST
    would silently turn NULL into an extreme coordinate)."""
    v = c.cast("long")
    return F.when(
        v.isNull(), F.lit(None).cast("long")
    ).otherwise(F.least(F.greatest(v, F.lit(0)), F.lit(ZORDER_MAX)))


def morton_key(x: Column, y: Column) -> Column:
    """Interleave: bit i of x lands at bit 2i, bit i of y at bit 2i+1.

    32 shift-mask-multiply terms summed — pure BIGINT, exact and identical
    in any engine; NULL in either dimension propagates to a NULL key."""
    cx, cy = clamp16(x), clamp16(y)
    z: Column | None = None
    for i in range(ZORDER_BITS):
        tx = F.shiftright(cx, i).bitwiseAND(F.lit(1)) * F.lit(1 << (2 * i))
        ty = F.shiftright(cy, i).bitwiseAND(F.lit(1)) * F.lit(1 << (2 * i + 1))
        z = tx + ty if z is None else z + tx + ty
    assert z is not None
    return z


def sql_clamp16(v: str) -> str:
    """DuckDB twin of :func:`clamp16` (explicit NULL guard)."""
    return (
        f"CASE WHEN {v} IS NULL THEN NULL "
        f"ELSE LEAST(GREATEST(CAST({v} AS BIGINT), 0), {ZORDER_MAX}) END"
    )


def sql_morton_key(cx: str, cy: str) -> str:
    """DuckDB twin of :func:`morton_key` over pre-clamped BIGINT columns
    (clamp once in a CTE via :func:`sql_clamp16`, then interleave)."""
    terms = []
    for i in range(ZORDER_BITS):
        terms.append(f"((({cx} >> {i}) & 1) * {1 << (2 * i)})")
        terms.append(f"((({cy} >> {i}) & 1) * {1 << (2 * i + 1)})")
    return "(" + " + ".join(terms) + ")"
