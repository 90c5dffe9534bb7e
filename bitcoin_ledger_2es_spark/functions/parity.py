"""Cross-engine float parity helpers.

Spark's ``round()`` is decimal-exact HALF_UP (BigDecimal); DuckDB's
``round(x, n)`` for doubles is ``std::round(x * 10^n) / 10^n`` — they
disagree whenever ``x * 10^n`` lands exactly on .5 after f64
multiplication while the decimal expansion is just below it (observed:
0.5834374999999999 -> Spark 0.583437, DuckDB 0.583438).

``duck_round`` reproduces DuckDB's semantics JVM-side so driver-contract
queries emit bit-identical rounded values to their DuckDB oracles.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def duck_round(c: Column | str, n: int = 6) -> Column:
    """DuckDB-compatible rounding: round-half-away-from-zero applied to
    the f64-scaled value (NOT decimal-exact)."""
    if isinstance(c, str):
        c = F.col(c)
    scale = float(10**n)
    scaled = c * F.lit(scale)
    r = F.when(scaled >= 0, F.floor(scaled + 0.5)).otherwise(F.ceil(scaled - 0.5))
    return r / F.lit(scale)
