"""Helpers for partitioning-independent (exact) numeric aggregation.

Floating-point SUM/AVG is order-dependent, and Spark's partial aggregation
order varies with partitioning — so a double aggregate can differ between
a 1-partition DuckDB oracle run and a 32-partition Spark run (and between
two Spark runs at different scale). Every oracle-checked aggregate in this
engine therefore:

  1. casts inputs to DECIMAL (exact, deterministic),
  2. aggregates in DECIMAL (associative and exact),
  3. ROUNDs and casts to DOUBLE only at the output boundary.

Division of two identical exact values is a single IEEE754 op and is
bit-identical across engines.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dec(col: Column | str, precision: int = 18, scale: int = 6) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(f"decimal({precision},{scale})")


def one() -> Column:
    return F.lit(1).cast("decimal(12,6)")


def out_double(c: Column, digits: int = 6) -> Column:
    """Output boundary: ROUND the exact decimal, cast to DOUBLE."""
    return F.round(c, digits).cast("double")


def disc_price() -> Column:
    """l_extendedprice * (1 - l_discount), exact decimal."""
    return dec("l_extendedprice") * (one() - dec("l_discount", 12))


def charge() -> Column:
    """disc_price * (1 + l_tax), exact decimal (re-scaled to stay <= 38 digits;
    inputs have <= 4 real decimal places so the rescale is lossless)."""
    return disc_price().cast("decimal(24,8)") * (one() + dec("l_tax", 12))


# The identical expressions for the DuckDB oracle side.
SQL_DISC_PRICE = (
    "CAST(l_extendedprice AS DECIMAL(18,6))"
    " * (CAST(1 AS DECIMAL(12,6)) - CAST(l_discount AS DECIMAL(12,6)))"
)
SQL_CHARGE = (
    f"CAST({SQL_DISC_PRICE} AS DECIMAL(24,8))"
    " * (CAST(1 AS DECIMAL(12,6)) + CAST(l_tax AS DECIMAL(12,6)))"
)


def sql_out(expr: str, digits: int = 6) -> str:
    """Output boundary for the DuckDB oracle: ROUND the exact decimal,
    then reach DOUBLE **through VARCHAR**. DuckDB's direct
    decimal->double cast converts the UNSCALED int128 to double first
    and then scales — two roundings, off by 1 ulp-of-2^53 once the
    unscaled value passes 2^53 (~9e9 at 6 digits; q08's sum of squared
    balances hit it at sf0.1, caught by tools/sweep_oracles.py). The
    VARCHAR hop parses with strtod, which is correctly rounded to the
    closest double — the same contract as Spark's
    BigDecimal.doubleValue, so the two engines agree at ANY
    magnitude."""
    return f"CAST(CAST(ROUND({expr}, {digits}) AS VARCHAR) AS DOUBLE)"
