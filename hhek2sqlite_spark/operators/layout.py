"""Z-order (Morton-curve) clustering for multi-dimensional data skipping.

Reference anchor: the reference's composite index
`Transaktioner.idx(FrånKonto,TillKonto)` (/root/reference/
hhek2sqlite.go:183) serves lookups on EITHER account column; a linear
sort on (a, b) only clusters the leading column. The lakehouse answer
(Delta OPTIMIZE ZORDER BY / Iceberg sort-order analog) interleaves the
bits of both keys so files cover small hyper-rectangles — min/max
row-group stats then prune scans filtered on ANY of the z-ordered
columns, not just the first.

Design rules (100 TB):
- The z-value is a pure column expression (rank-normalize each column
  to ``bits`` via ntile, then interleave with shiftleft/OR — all
  codegen, no UDF), so computing it is a projection; the only data
  movement is the range-repartition + in-file sort the layout job pays
  by definition.
- Rank normalization (ntile over a sample-free window would be a global
  sort itself) uses ntile over an UNPARTITIONED window — acceptable in
  the write job at moderate bits because the window input is just the
  column being ranked; for petabyte inputs swap in approxQuantile
  bucket boundaries (same z-value contract, sampled edges).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def zvalue(df: DataFrame, cols: Sequence[str], *, bits: int = 8) -> DataFrame:
    """Attach ``_z``: the Morton interleave of the ``bits``-bit rank
    buckets of each column in ``cols``. Total z-width = bits * len(cols)
    (keep <= 63)."""
    if bits * len(cols) > 63:
        raise ValueError("z-value wider than 63 bits")
    out = df
    buckets = 1 << bits
    for c in cols:
        # ntile gives equi-height buckets 1..2^bits -> 0-based
        out = out.withColumn(
            f"_zb_{c}",
            (F.ntile(buckets).over(Window.orderBy(F.col(c))) - 1).cast("long"),
        )
    z: Column = F.lit(0).cast("long")
    for bit in range(bits):
        for i, c in enumerate(cols):
            pos = bit * len(cols) + i
            z = z.bitwiseOR(
                F.shiftleft(
                    F.shiftright(F.col(f"_zb_{c}"), bit).bitwiseAND(F.lit(1)), pos
                )
            )
    return out.withColumn("_z", z).drop(*[f"_zb_{c}" for c in cols])


def zorder_write(
    df: DataFrame,
    path: str,
    cols: Sequence[str],
    *,
    bits: int = 8,
    n_files: int = 8,
) -> None:
    """Write ``df`` clustered on the Morton curve of ``cols``: range-
    partition by the z-value into ``n_files`` files, sort within each,
    drop the helper column. Readers filtering on ANY of ``cols`` then
    skip most files on min/max stats (asserted in tests/test_layout.py)."""
    zdf = zvalue(df, cols, bits=bits)
    (
        zdf.repartitionByRange(n_files, F.col("_z"))
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(path)
    )
