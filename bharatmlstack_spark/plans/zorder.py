"""Z-order (Morton) multi-dimensional clustering — the data-layout
optimization behind Delta/Iceberg ``ZORDER BY``.

Sorting a table by the bit-interleaved key of two (or more) columns keeps
rows that are close in EITHER dimension close on disk, so parquet
row-group min/max stats prune scans filtered on either column — the
property a single-column sort only gives one dimension. At 100 TB this is
the difference between "point queries on user_id read every file the
ts-sort produced" and "they read O(1) files".

The z-value is pure integer bit arithmetic (shift/and/or), identical in
Spark and DuckDB, so layouts built on it are oracle-checkable exactly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def z_value(a: Column | str, b: Column | str, bits: int = 16) -> Column:
    """Interleave the low ``bits`` bits of two non-negative ints: bit i of
    ``a`` lands at position 2i, bit i of ``b`` at 2i+1."""
    ca = F.col(a) if isinstance(a, str) else a
    cb = F.col(b) if isinstance(b, str) else b
    ca, cb = ca.cast("long"), cb.cast("long")
    z = F.lit(0).cast("long")
    for i in range(bits):
        z = z.bitwiseOR(
            F.shiftleft(F.shiftright(ca, i).bitwiseAND(F.lit(1)), 2 * i)
        )
        z = z.bitwiseOR(
            F.shiftleft(F.shiftright(cb, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
    return z


def z_value_sql(a: str, b: str, bits: int = 16) -> str:
    """The identical interleave as a SQL expression string (DuckDB &
    Spark SQL share the <</>>/&/| operators on BIGINT)."""
    terms = []
    for i in range(bits):
        terms.append(f"((({a} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({b} >> {i}) & 1) << {2 * i + 1})")
    return " | ".join(terms)


def zorder_layout(df: DataFrame, a: str, b: str, n_files: int, bits: int = 16) -> DataFrame:
    """Range-partition by z-value and sort within partitions — one write
    of this layout serves point/range filters on BOTH columns with
    file-level pruning."""
    with_z = df.withColumn("__z", z_value(a, b, bits))
    return (
        with_z.repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
    )
