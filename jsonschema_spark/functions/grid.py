"""Cross-engine-stable display rounding.

``round(double, n)`` is NOT a correctly-rounded IEEE operation and its
semantics differ BETWEEN ENGINES AND BUILDS: Spark rounds via exact
BigDecimal HALF_UP, DuckDB via a float-scaled ``std::round`` whose
tie behavior depends on the build — the round-2 driver hash failure on
``reconcile_orders_lineitem`` was exactly this (values bit-identical
locally, divergent on the driver's DuckDB). Every contract query that
needs display rounding therefore uses the explicit integer grid

    floor(x * 10^k + 0.5) / 10^k

spelled IDENTICALLY in the Spark plan and the oracle SQL. Multiply,
add, floor and divide are all correctly-rounded IEEE ops, so given
bit-identical input both engines produce bit-identical output on any
build. (Half-ties round toward +inf for negatives — a deliberate,
engine-independent choice; SQL ``round``'s away-from-zero ties are the
thing being avoided.)

The SQL spelling for ``grid_round(x, 6)`` is::

    floor((x) * 1e6 + 5e-1) / 1e6

(scientific literals, so DuckDB types them DOUBLE, not DECIMAL).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def grid_round(col: Column | str, digits: int) -> Column:
    """floor(x * 10^digits + 0.5) / 10^digits as a double Column.

    NULL in -> NULL out (floor propagates NULL). Exact for |x|*10^digits
    < 2^53; contract columns are ratios/statistics far below that."""
    c = F.col(col) if isinstance(col, str) else col
    s = float(10**digits)
    return F.floor(c * F.lit(s) + F.lit(0.5)) / F.lit(s)


def grid_round_sql(expr: str, digits: int) -> str:
    """The identical spelling for oracle SQL (DuckDB DOUBLE literals)."""
    return f"floor(({expr}) * 1e{digits} + 5e-1) / 1e{digits}"
