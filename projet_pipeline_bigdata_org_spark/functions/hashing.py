"""Deterministic, engine-portable pseudo-random coin: ``(key·K) mod P``
with K = Knuth's multiplicative constant and P the largest 32-bit prime.
Unlike ``rand()``/TABLESAMPLE, both engines, every task retry, and every
resample agree on the value — the ordering/selection primitive behind
``sample_fixed_per_group``, ``mix_temperature_sources``.

Overflow safety: a raw ``key * K`` wraps int64 once key exceeds ~3.5e9 —
and it wraps *differently* across engines (Spark non-ANSI wraps silently,
DuckDB raises). The coin therefore reduces ``key mod P`` first and
multiplies in two 16-bit limbs of K, keeping every intermediate below
2^49, so the result equals the mathematical ``(key·K) mod P`` at ANY key
magnitude, identically in Spark and DuckDB. (K < P, so the mod-P
reduction of the key loses nothing.)

Sign safety: both Spark and DuckDB ``%`` follow the dividend's sign, so a
bare ``key % P`` on a negative key would yield a negative coin that sorts
below every threshold — a silently biased keep/holdout decision. The coin
therefore canonicalizes with ``((key % P) + P) % P`` in both twins, which
is the mathematical residue for any sign and a no-op for the nonnegative
ids every current caller feeds (values unchanged, no oracle churn).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Knuth multiplicative constant / largest 32-bit prime
KNUTH = 2654435761
PRIME32 = 4294967291

_K_HI, _K_LO = KNUTH >> 16, KNUTH & 0xFFFF


def hash_coin(key: Column | str) -> Column:
    """``(key·KNUTH) mod PRIME32`` — uniform over [0, PRIME32), wrap-free,
    sign-safe (nonnegative residue for negative keys too)."""
    k = F.col(key) if isinstance(key, str) else key
    d0 = (k % PRIME32 + PRIME32) % PRIME32
    hi = (d0 * _K_HI) % PRIME32
    return (hi * 65536 + d0 * _K_LO) % PRIME32


def hash_coin_int(key: int) -> int:
    """The identical coin on plain Python integers (exact, unbounded
    arithmetic) — for kernels that precompute coin-derived constants
    process-side (e.g. the JL sign matrix) instead of evaluating the
    expression per row."""
    d0 = (key % PRIME32 + PRIME32) % PRIME32
    hi = (d0 * _K_HI) % PRIME32
    return (hi * 65536 + d0 * _K_LO) % PRIME32


def sql_hash_coin(key: str) -> str:
    """The identical coin as DuckDB SQL (same limb decomposition and the
    same sign canonicalization). Fully parenthesized so the fragment
    composes safely into any surrounding arithmetic."""
    d0 = f"(({key} % {PRIME32} + {PRIME32}) % {PRIME32})"
    return f"(((({d0} * {_K_HI}) % {PRIME32}) * 65536 + {d0} * {_K_LO}) % {PRIME32})"
