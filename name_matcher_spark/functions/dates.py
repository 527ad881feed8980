"""Birthdate similarity ladder — Algorithm 7 support (reference
src/matching/mod.rs:1118-1136).

The reference DEPRECATES Algorithm 7 (mod.rs:933-936, main.rs:169
rejects it); per SURVEY §2.4 we implement the scalar ladder for
completeness/documentation but do NOT ship an Algo-7 pipeline. The
ladder, on two non-null dates:

    100  exact equality
     90  +/- 1 day
     85  same year and day/month swapped (when the swap is a valid date)
     70  same year and month
     50  same year
     40  +/- 1 year
      0  otherwise

Pure JVM expressions (when-chain + datediff + make_date), so it is
also DuckDB-oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def birthdate_similarity_pct(a: Column, b: Column) -> Column:
    days = F.abs(F.datediff(a, b))
    same_year = F.year(a) == F.year(b)
    # try_to_date of the swapped components -> NULL for invalid swaps
    # (e.g. day 31 as a month), mirroring from_ymd_opt in the reference.
    def _swap(c: Column) -> Column:
        return F.try_to_date(
            F.concat_ws("-", F.year(c), F.dayofmonth(c), F.month(c))
        )

    swap_a = _swap(a)
    swap_b = _swap(b)
    swapped = (swap_a.isNotNull() & (swap_a == b)) | (
        swap_b.isNotNull() & (swap_b == a)
    )
    return (
        F.when(a == b, 100.0)
        .when(days == 1, 90.0)
        .when(same_year & swapped, 85.0)
        .when(same_year & (F.month(a) == F.month(b)), 70.0)
        .when(same_year, 50.0)
        .when(F.abs(F.year(a) - F.year(b)) == 1, 40.0)
        .otherwise(0.0)
    )


def algo7_score(name_score: Column, bd_pct: Column) -> Column:
    """0.7 * name + 0.3 * date, percent scale (mod.rs:1147)."""
    return 0.7 * name_score + 0.3 * bd_pct
