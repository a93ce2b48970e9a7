"""Z-order layout: files must cover small rectangles in BOTH clustered
dimensions (the data-skipping property), where a linear sort clusters
only its leading column."""

from __future__ import annotations

import glob

import pyarrow.parquet as pq

from hhek2sqlite_spark.operators.layout import zorder_write, zvalue


def _file_ranges(path: str, col: str) -> list[tuple[int, int]]:
    out = []
    for f in sorted(glob.glob(f"{path}/part-*.parquet")):
        md = pq.ParquetFile(f).metadata
        idx = [md.schema.column(i).name for i in range(md.num_columns)].index(col)
        lo, hi = None, None
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            lo = st.min if lo is None else min(lo, st.min)
            hi = st.max if hi is None else max(hi, st.max)
        out.append((lo, hi))
    return out


def _mean_span(ranges, full):
    return sum(hi - lo for lo, hi in ranges) / len(ranges) / full


def test_zorder_files_cover_small_rectangles_in_both_dims(spark, tmp_path):
    n = 1 << 14
    df = spark.range(n).selectExpr(
        "id",
        "CAST(hash(id) & 65535 AS LONG) AS x",
        "CAST(hash(id + 999) & 65535 AS LONG) AS y",
    )
    zpath = str(tmp_path / "zordered")
    lpath = str(tmp_path / "linear")
    zorder_write(df, zpath, ["x", "y"], bits=8, n_files=16)
    # baseline: linear sort on x — same file count, same data
    df.repartitionByRange(16, "x").sortWithinPartitions("x").write.parquet(lpath)

    zx = _mean_span(_file_ranges(zpath, "x"), 65535)
    zy = _mean_span(_file_ranges(zpath, "y"), 65535)
    lx = _mean_span(_file_ranges(lpath, "x"), 65535)
    ly = _mean_span(_file_ranges(lpath, "y"), 65535)
    # z-order: BOTH dims clustered (16 files ~ 4x4 grid -> ~1/4 span + slop)
    assert zx < 0.5 and zy < 0.5, (zx, zy)
    # linear: leading column tightly clustered, second essentially unclustered
    assert lx < 0.2, lx
    assert ly > 0.8, ly
    # no rows lost
    assert spark.read.parquet(zpath).count() == n


def test_zvalue_width_guard(spark):
    import pytest

    df = spark.range(4).selectExpr("id AS a", "id AS b")
    with pytest.raises(ValueError):
        zvalue(df, ["a", "b"], bits=32)  # 64 bits > 63
