"""Compaction rewrites a many-file parquet dataset into the computed
file count without changing its rows."""

from __future__ import annotations

import glob

from hhek2sqlite_spark.sources.compact import compact_parquet, dataset_bytes


def test_compact_reduces_file_count_preserves_rows(spark, tmp_path):
    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    df = spark.range(0, 10_000).selectExpr("id", "id % 7 AS grp")
    df.repartition(64).write.parquet(src)  # simulate small-file accretion
    assert len(glob.glob(f"{src}/part-*")) == 64

    n = compact_parquet(spark, src, dst, target_file_mb=256)
    assert n == 1  # tiny dataset -> one target file
    assert len(glob.glob(f"{dst}/part-*")) == 1
    back = spark.read.parquet(dst)
    assert back.count() == 10_000
    assert back.selectExpr("sum(id) s").collect()[0].s == df.selectExpr("sum(id) s").collect()[0].s


def test_compact_respects_partitioning(spark, tmp_path):
    src = str(tmp_path / "psrc")
    dst = str(tmp_path / "pdst")
    spark.range(0, 1000).selectExpr("id", "id % 3 AS grp").repartition(8).write.parquet(src)
    compact_parquet(spark, src, dst, partition_by=("grp",))
    assert len(glob.glob(f"{dst}/grp=*")) == 3
    assert spark.read.parquet(dst).count() == 1000


def test_dataset_bytes_skips_metadata_files(tmp_path):
    (tmp_path / "_SUCCESS").write_bytes(b"")
    (tmp_path / ".hidden.crc").write_bytes(b"xxxx")
    (tmp_path / "part-0.parquet").write_bytes(b"abcd" * 10)
    assert dataset_bytes(str(tmp_path)) == 40
