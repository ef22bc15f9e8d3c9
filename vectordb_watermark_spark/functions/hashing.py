"""Keyed-hash randomness — the engine's only source of "random".

The reference uses stateful seeded RNGs (``random.Random(seed)`` sequential
draws, reference: database/pgvector/pg_func.py:236-241; ``np.random.choice``
in the attack scripts).  Stateful sequential RNG is order-dependent and
therefore not reproducible under distributed execution (SURVEY.md §2.3 J5).

This module replaces every random draw with a *keyed hash*: per-row
``sha2(key || '|' || id || ...)`` -> hex -> uniform in (0,1) -> whatever
distribution is needed.  Properties:

- deterministic under any partitioning / task order / retry,
- embarrassingly parallel (no coordination, no broadcast RNG state),
- identical in Spark (``sha2``) and DuckDB (``sha256``) — both emit lowercase
  hex — so even "random" operators are oracle-checkable.

Both a Spark ``Column`` builder and a DuckDB SQL-string builder are provided
for each primitive; tests assert they produce identical values.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

TWO_32 = 4294967296.0  # 2**32
TWO_30 = 1073741824.0  # 2**30
MASK30 = (1 << 30) - 1
TWO_PI = 6.283185307179586


# ---------------------------------------------------------------------------
# Spark Column builders
# ---------------------------------------------------------------------------

def keyed_hash_hex(*parts: Column | str) -> Column:
    """sha2-256 hex (64 lowercase chars) of parts joined with '|'.

    Only hash strings and integers — float rendering differs across engines.
    String literals are passed as ``F.lit``; Columns used as-is.
    """
    cols = [F.lit(p) if isinstance(p, str) else p.cast("string") for p in parts]
    return F.sha2(F.concat_ws("|", *cols), 256)


def hash_uniform(hex_col: Column, offset: int = 1) -> Column:
    """8 hex chars starting at 1-based ``offset`` -> uniform double in (0,1).

    (h + 0.5) / 2^32 keeps the value strictly inside (0,1) so log() is safe.
    """
    h = F.conv(F.substring(hex_col, offset, 8), 16, 10).cast("double")
    return (h + F.lit(0.5)) / F.lit(TWO_32)


def hash_gauss(hex_col: Column, offset: int = 1) -> Column:
    """Standard normal via Box-Muller from two disjoint 8-hex-char windows."""
    u1 = hash_uniform(hex_col, offset)
    u2 = hash_uniform(hex_col, offset + 8)
    return F.sqrt(F.lit(-2.0) * F.log(u1)) * F.cos(F.lit(TWO_PI) * u2)


def keyed_uniform(*parts: Column | str) -> Column:
    """Convenience: uniform(0,1) keyed by the given parts."""
    return hash_uniform(keyed_hash_hex(*parts))


def word60(hex_col: Column, offset: int = 1) -> Column:
    """15 hex chars starting at 1-based ``offset`` -> 60-bit BIGINT word.
    One string->int conversion yields two 30-bit uniform lanes; a 64-hex
    sha256 digest holds four disjoint words."""
    return F.conv(F.substring(hex_col, offset, 15), 16, 10).cast("long")


def hash_gauss_word(word: Column) -> Column:
    """Standard normal from a 60-bit word: Box-Muller on its 30-bit halves.

    Cheaper than :func:`hash_gauss` in bulk — one hex conversion per gaussian
    (vs two), and four gaussians per sha256 digest via :func:`word60`."""
    u1 = (F.shiftright(word, 30).cast("double") + F.lit(0.5)) / F.lit(TWO_30)
    u2 = (word.bitwiseAND(F.lit(MASK30)).cast("double") + F.lit(0.5)) / F.lit(TWO_30)
    return F.sqrt(F.lit(-2.0) * F.log(u1)) * F.cos(F.lit(TWO_PI) * u2)


# ---------------------------------------------------------------------------
# DuckDB SQL-string builders (must mirror the Column builders exactly)
# ---------------------------------------------------------------------------

def sql_keyed_hash_hex(*parts: str) -> str:
    """DuckDB SQL for :func:`keyed_hash_hex`. ``parts`` are raw SQL
    expressions (quote string literals yourself)."""
    cast_parts = ", ".join(f"CAST({p} AS VARCHAR)" for p in parts)
    return f"sha256(concat_ws('|', {cast_parts}))"

def sql_hash_uniform(hex_sql: str, offset: int = 1) -> str:
    """DuckDB SQL for :func:`hash_uniform`."""
    return (
        f"((CAST(('0x' || substr({hex_sql}, {offset}, 8)) AS UBIGINT) + 0.5) / {TWO_32!r})"
    )

def sql_hash_gauss(hex_sql: str, offset: int = 1) -> str:
    """DuckDB SQL for :func:`hash_gauss` (Box-Muller)."""
    u1 = sql_hash_uniform(hex_sql, offset)
    u2 = sql_hash_uniform(hex_sql, offset + 8)
    return f"(sqrt(-2.0 * ln({u1})) * cos({TWO_PI!r} * {u2}))"

def sql_keyed_uniform(*parts: str) -> str:
    return sql_hash_uniform(sql_keyed_hash_hex(*parts))


def sql_word60(hex_sql: str, offset: str | int = 1) -> str:
    """DuckDB SQL for :func:`word60`; ``offset`` may be a SQL expression."""
    return f"CAST(CAST(('0x' || substr({hex_sql}, CAST({offset} AS INT), 15)) AS UBIGINT) AS BIGINT)"


def sql_hash_gauss_word(word_sql: str) -> str:
    """DuckDB SQL for :func:`hash_gauss_word`."""
    u1 = f"((({word_sql}) >> 30) + 0.5) / {TWO_30!r}"
    u2 = f"((({word_sql}) & {MASK30}) + 0.5) / {TWO_30!r}"
    return f"(sqrt(-2.0 * ln({u1})) * cos({TWO_PI!r} * {u2}))"
