"""Round-7 advice fixes: crash-atomic commits-table migration,
zero-norm guard in the LSH verify kernel, raw-decode trailer bound."""

from __future__ import annotations

import sqlite3

import pytest

from hhek2sqlite_spark.streaming.sink import COMMITS_TABLE, _ensure_commits_table


def _old_layout_db(path: str) -> None:
    con = sqlite3.connect(path)
    con.execute(
        f'CREATE TABLE "{COMMITS_TABLE}"'
        " (sink_table TEXT NOT NULL, batch_id INTEGER NOT NULL,"
        " PRIMARY KEY (sink_table, batch_id))"
    )
    con.execute(f'INSERT INTO "{COMMITS_TABLE}" VALUES (?, ?)', ("t", 7))
    con.commit()
    con.close()


def test_commits_migration_upgrades_old_layout(tmp_path):
    db = str(tmp_path / "m.db")
    _old_layout_db(db)
    con = sqlite3.connect(db)
    _ensure_commits_table(con)
    rows = con.execute(
        f'SELECT app_id, sink_table, batch_id FROM "{COMMITS_TABLE}"'
    ).fetchall()
    con.close()
    assert rows == [("", "t", 7)]  # old commit visible under default identity


def test_commits_migration_crash_rolls_back(tmp_path):
    """A crash mid-migration (e.g. between RENAME and the backfill) must
    leave the OLD layout fully intact — otherwise prior commit records
    are stranded in _v1 and replayed batches re-apply as duplicates."""
    db = str(tmp_path / "c.db")
    _old_layout_db(db)
    con = sqlite3.connect(db)

    class Boom(RuntimeError):
        pass

    real_execute = con.execute

    class FaultyCon:
        def __getattr__(self, name):
            return getattr(con, name)

        def execute(self, sql, *a):
            if sql.startswith("DROP TABLE"):
                raise Boom("crash before DROP")
            return real_execute(sql, *a)

    with pytest.raises(Boom):
        _ensure_commits_table(FaultyCon())
    # rollback restored the pre-migration layout: old table, old rows,
    # no stranded _v1
    names = {
        r[0]
        for r in con.execute(
            "SELECT name FROM sqlite_master WHERE type='table'"
        ).fetchall()
    }
    assert names == {COMMITS_TABLE}
    cols = [r[1] for r in con.execute(f'PRAGMA table_info("{COMMITS_TABLE}")')]
    assert cols == ["sink_table", "batch_id"]
    assert con.execute(f'SELECT * FROM "{COMMITS_TABLE}"').fetchall() == [("t", 7)]
    # a clean retry then completes the migration with the rows preserved
    _ensure_commits_table(con)
    assert con.execute(
        f'SELECT app_id, sink_table, batch_id FROM "{COMMITS_TABLE}"'
    ).fetchall() == [("", "t", 7)]
    con.close()


def test_lsh_zero_norm_vectors_never_pair(spark):
    """All-zero embeddings share identical sign bits, so they collide in
    every band and reach the verify with denom 0; the kernel must emit a
    below-threshold sentinel, not floor(nan) (platform-arbitrary int)."""
    from hhek2sqlite_spark.operators.similarity import lsh_bucket_pairs

    rows = [
        (1, [0.0] * 8),
        (2, [0.0] * 8),
        (3, [1.0, 2.0, 3.0, 4.0, 1.0, 2.0, 3.0, 4.0]),
        (4, [1.0, 2.0, 3.0, 4.0, 1.0, 2.0, 3.0, 4.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id int, embedding array<double>")
    got = lsh_bucket_pairs(df, dim=8, min_sim_e6=400_000).collect()
    pairs = {(r.id_a, r.id_b) for r in got}
    assert (1, 2) not in pairs  # zero-norm pair suppressed, not nan-cast
    assert (3, 4) in pairs
    assert all(r.sim_e6 >= 400_000 for r in got)


def test_sample_frames_avi_demuxes_real_container(spark):
    """The frame-sampling fan-out over REAL uncompressed-AVI bytes: the
    fake fixed-width splitter is retired for container payloads."""
    from hhek2sqlite_spark.operators import multimodal as mm

    docs = spark.range(0, 6).withColumnRenamed("id", "doc_id")
    videos = mm.synthesize_videos(docs)
    got = mm.sample_frames(videos, every_nth=2, decoder="avi").collect()
    by_doc = {}
    for r in got:
        by_doc.setdefault(r.doc_id, []).append(r)
    for doc_id, rows in by_doc.items():
        n = 2 + doc_id % 3
        assert sorted(r.frame_idx for r in rows) == list(range(0, n, 2))
        w, h = 4 + doc_id % 3, 2 + doc_id % 2
        stride = (w * 3 + 3) & ~3
        assert all(len(r.frame) == stride * h for r in rows)
    # and the decoded-stats operator agrees with the analytic formula
    stats = mm.video_frame_stats(videos, every_nth=2).collect()
    for r in stats:
        w, h = 4 + r.doc_id % 3, 2 + r.doc_id % 2
        expect = sum(
            (y * w + x)
            * ((r.doc_id * 31 + r.frame_idx * 19 + x * 7 + y * 13) % 256)
            for y in range(h)
            for x in range(w)
        )
        assert r.px_moment == expect


def test_raw_decode_no_var_cols_excludes_trailer():
    """Schema-less decode of a row with n_var == 0 must bound the fixed
    slice at the trailer start, not the buffer end."""
    import struct

    from hhek2sqlite_spark.sources.jet2 import TableSchema, _decode_row, _encode_row

    schema = TableSchema([("A", "long"), ("B", "long")], [])
    buf = _encode_row(schema, {"A": 17, "B": 42})
    raw = _decode_row(buf, None)
    assert raw["_var"] == []
    assert raw["_fixed"] == struct.pack("<ii", 17, 42)  # no trailer bytes
