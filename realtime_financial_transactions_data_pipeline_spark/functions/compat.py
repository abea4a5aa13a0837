"""Cross-engine numeric compatibility helpers.

Spark's ``round(double, n)`` rounds the *shortest decimal representation*
of the double (BigDecimal.valueOf semantics); DuckDB computes
``std::round(x * 10^n) / 10^n`` on the raw binary value. For doubles that
sit just below a half-increment (e.g. 74721.52499999999) the two differ
by one cent. ``dround`` reproduces the multiply-round-divide form with
Spark built-ins so probe outputs hash identically to the DuckDB oracle —
and it is also the form most engines (C++, NumPy) use, which makes it the
right default for an engine whose results get cross-checked.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dround(col: Column | str, scale: int = 0) -> Column:
    """Round a double like DuckDB/C++: round(x * 10^scale) / 10^scale,
    half away from zero. JVM-side only — stays inside codegen."""
    if isinstance(col, str):
        col = F.col(col)
    if scale == 0:
        return F.round(col, 0)
    factor = F.lit(float(10**scale))
    return F.round(col * factor, 0) / factor
