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


def test_compact_partitioned_sizes_files_per_partition(spark, tmp_path):
    """Skewed Hive partitions: the big partition gets more output files,
    the small ones get one each, and the TOTAL equals the returned
    count — round-robin+partitionBy would instead write up to
    n_files x n_partitions files (round-5 advice)."""
    src = str(tmp_path / "ssrc")
    dst = str(tmp_path / "sdst")
    # grp=0 holds ~10x the rows of grp=1/grp=2; md5 payload defeats
    # compression so the byte skew matches the row skew
    df = spark.range(0, 360_000).selectExpr(
        "id",
        "md5(CAST(id AS STRING)) AS payload",
        "CASE WHEN id % 12 < 10 THEN 0 ELSE id % 12 - 9 END AS grp",
    )
    df.repartition(16).write.parquet(src)

    n = compact_parquet(spark, src, dst, target_file_mb=1, partition_by=("grp",))
    files = {g: glob.glob(f"{dst}/grp={g}/part-*") for g in (0, 1, 2)}
    total = sum(len(v) for v in files.values())
    # planned count bounds actual files (slot hash collisions can merge
    # a few); crucially NOT the old n_files x n_partitions explosion
    assert 3 <= total <= n
    assert total < n + 3  # nothing like the 3x blowup round-robin gave
    # per-partition sizing: the 10x partition gets proportionally more
    # files than the small ones (round-robin gave every partition the
    # same n_files-task fan-out regardless of its size)
    assert len(files[1]) <= 3 and len(files[2]) <= 3
    assert len(files[0]) >= 3 * max(len(files[1]), len(files[2]))
    back = spark.read.parquet(dst)
    assert back.count() == 360_000
    assert back.selectExpr("sum(id) s").collect()[0].s == df.selectExpr("sum(id) s").collect()[0].s


def test_compact_partitioned_keeps_null_partition_rows(spark, tmp_path):
    """NULL is a legal Hive partition value; the slots join must be
    null-safe or those rows are silently dropped (round-6 advice)."""
    src = str(tmp_path / "nsrc")
    dst = str(tmp_path / "ndst")
    df = spark.range(0, 300).selectExpr(
        "id", "CASE WHEN id % 3 = 0 THEN NULL ELSE id % 3 END AS grp"
    )
    df.repartition(4).write.parquet(src)
    compact_parquet(spark, src, dst, partition_by=("grp",))
    back = spark.read.parquet(dst)
    assert back.count() == 300  # the 100 NULL-grp rows survived
    assert back.filter("grp IS NULL").count() == 100
    assert (
        back.selectExpr("sum(id) s").collect()[0].s
        == df.selectExpr("sum(id) s").collect()[0].s
    )


def test_dataset_bytes_skips_metadata_files(tmp_path):
    (tmp_path / "_SUCCESS").write_bytes(b"")
    (tmp_path / ".hidden.crc").write_bytes(b"xxxx")
    (tmp_path / "part-0.parquet").write_bytes(b"abcd" * 10)
    assert dataset_bytes(str(tmp_path)) == 40
