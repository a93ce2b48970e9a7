"""Semantic tests for the round-5 operators: inverted index, PageRank,
SCD2 history, exact z-score outliers, decayed counts. Oracle parity is
covered by test_oracle_parity; these pin semantics on constructed inputs
where the right answer is known by hand (or by a pure-python re-derivation
for the iterative PageRank)."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from hhek2sqlite_spark.operators.graph import RANK_SCALE, cooccurrence_edges, pagerank
from hhek2sqlite_spark.operators.scd import scd2_merge
from hhek2sqlite_spark.operators.stats import decayed_counts, value_outliers
from hhek2sqlite_spark.operators.text import inverted_index


def _docs(spark, texts):
    return spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")


# inverted index -------------------------------------------------------------


def test_inverted_index_postings_sorted_and_capped(spark):
    docs = _docs(
        spark,
        [
            "alpha beta",  # doc 0
            "alpha gamma",  # doc 1
            "alpha beta",  # doc 2
            "delta",  # doc 3
        ],
    )
    out = inverted_index(docs, min_len=4, min_df=2, max_df=2, k_postings=2)
    rows = {r.token: r for r in out.collect()}
    # alpha: df=3 > max_df -> dropped (stopword-grade); delta: df=1 < min_df
    assert set(rows) == {"beta"}
    assert rows["beta"].n_docs == 2
    assert rows["beta"].postings == "0,2"


def test_inverted_index_caps_postings_but_keeps_full_df(spark):
    docs = _docs(spark, ["word"] * 5)
    out = inverted_index(docs, min_len=4, min_df=1, max_df=10, k_postings=3)
    row = out.collect()[0]
    assert row.n_docs == 5  # df counted over ALL docs
    assert row.postings == "0,1,2"  # lowest three ids only


# pagerank -------------------------------------------------------------------


def _py_pagerank(edges, iterations=5, damping_num=85, damping_den=100):
    """Pure-python re-derivation of the integer-quantized recurrence."""
    from collections import defaultdict

    base = ((damping_den - damping_num) * RANK_SCALE) // damping_den
    deg = defaultdict(int)
    for s, _ in edges:
        deg[s] += 1
    rank = {n: RANK_SCALE for n in deg}
    for _ in range(iterations):
        incoming = defaultdict(int)
        for s, d in edges:
            incoming[d] += rank[s] // deg[s]
        rank = {n: base + (damping_num * c) // damping_den for n, c in incoming.items()}
    return rank


def test_pagerank_symmetric_triangle_is_fixed_point(spark):
    edges_py = [(a, b) for a in (1, 2, 3) for b in (1, 2, 3) if a != b]
    edges = spark.createDataFrame(edges_py, "src long, dst long")
    out = {r.node: r.rank_micros for r in pagerank(edges).collect()}
    assert out == {1: RANK_SCALE, 2: RANK_SCALE, 3: RANK_SCALE}


def test_pagerank_star_matches_python_recurrence(spark):
    # center 0 <-> leaves 1..3: asymmetric degrees exercise the floor
    # divisions; compare bit-exactly against the python re-derivation
    edges_py = [(0, i) for i in (1, 2, 3)] + [(i, 0) for i in (1, 2, 3)]
    edges = spark.createDataFrame(edges_py, "src long, dst long")
    out = {r.node: r.rank_micros for r in pagerank(edges).collect()}
    assert out == _py_pagerank(edges_py)
    assert out[0] > out[1]  # the hub outranks the leaves


def test_cooccurrence_edges_symmetric_distinct(spark):
    items = spark.createDataFrame(
        [("A", 1), ("A", 2), ("A", 3), ("B", 3), ("B", 4), ("B", 3)],
        "g string, item long",
    )
    got = {(r.src, r.dst) for r in cooccurrence_edges(items, group_col="g", item_col="item").collect()}
    want = {(1, 2), (1, 3), (2, 3), (3, 4)}
    assert got == want | {(b, a) for a, b in want}


# scd2 -----------------------------------------------------------------------


def test_scd2_collapses_noops_and_chains_intervals(spark):
    base = spark.createDataFrame([(1, "X"), (2, "K")], "k long, seg string")
    updates = spark.createDataFrame(
        [(1, "X", "1996-06-01"), (1, "Y", "1997-03-01")],  # first is a NO-OP
        "k long, seg string, eff string",
    )
    out = scd2_merge(base, updates, key="k", attr="seg", base_from="1992-01-01")
    rows = sorted(out.collect(), key=lambda r: (r.k, r.valid_from))
    assert [(r.k, r.seg, r.valid_from, r.valid_to, r.is_current) for r in rows] == [
        (1, "X", "1992-01-01", "1997-03-01", False),  # no-op collapsed away
        (1, "Y", "1997-03-01", "9999-12-31", True),
        (2, "K", "1992-01-01", "9999-12-31", True),  # untouched key: one row
    ]


def test_scd2_reverting_to_original_value_is_a_new_version(spark):
    base = spark.createDataFrame([(1, "A")], "k long, seg string")
    updates = spark.createDataFrame(
        [(1, "B", "1995-01-01"), (1, "A", "1996-01-01")],
        "k long, seg string, eff string",
    )
    out = scd2_merge(base, updates, key="k", attr="seg", base_from="1992-01-01")
    assert out.count() == 3  # A, B, A — the revert is a distinct version


def test_scd2_null_attribute_transitions_are_real_versions(spark):
    """A -> NULL -> A must produce three versions: a non-null-safe
    `_prev != attr` filter drops both NULL-adjacent transitions
    (round-5 advice); eqNullSafe + the first-row marker keeps them."""
    base = spark.createDataFrame([(1, "A")], "k long, seg string")
    updates = spark.createDataFrame(
        [(1, None, "1995-01-01"), (1, "A", "1996-01-01")],
        "k long, seg string, eff string",
    )
    out = scd2_merge(base, updates, key="k", attr="seg", base_from="1992-01-01")
    rows = sorted(out.collect(), key=lambda r: r.valid_from)
    assert [(r.seg, r.valid_from, r.valid_to) for r in rows] == [
        ("A", "1992-01-01", "1995-01-01"),
        (None, "1995-01-01", "1996-01-01"),
        ("A", "1996-01-01", "9999-12-31"),
    ]


def test_scd2_base_null_then_value(spark):
    """First version may itself be NULL; the following non-null update
    is a change, and two NULL rows in a row collapse as a no-op."""
    base = spark.createDataFrame([(1, None)], "k long, seg string")
    updates = spark.createDataFrame(
        [(1, None, "1995-01-01"), (1, "B", "1996-01-01")],  # NULL no-op collapses
        "k long, seg string, eff string",
    )
    out = scd2_merge(base, updates, key="k", attr="seg", base_from="1992-01-01")
    rows = sorted(out.collect(), key=lambda r: r.valid_from)
    assert [(r.seg, r.valid_from, r.valid_to) for r in rows] == [
        (None, "1992-01-01", "1996-01-01"),
        ("B", "1996-01-01", "9999-12-31"),
    ]


# stats ----------------------------------------------------------------------


def test_value_outliers_flags_only_the_spike(spark):
    rows = [(i, "t", 10.0) for i in range(20)] + [(99, "t", 1000.0)]
    events = spark.createDataFrame(rows, "event_id long, event_type string, value double")
    out = value_outliers(events)
    assert [r.event_id for r in out.collect()] == [99]


def test_value_outliers_zero_variance_group_flags_nothing(spark):
    rows = [(i, "t", 42.5) for i in range(10)]
    events = spark.createDataFrame(rows, "event_id long, event_type string, value double")
    assert value_outliers(events).count() == 0


def test_decayed_counts_power_of_two_weights(spark):
    d0 = datetime.datetime(2024, 1, 10, 12, 0, 0)
    d1 = datetime.datetime(2024, 1, 9, 3, 0, 0)
    far = datetime.datetime(2020, 1, 1, 0, 0, 0)  # past max_age -> weight 0
    events = spark.createDataFrame(
        [(1, "a", d0), (2, "a", d0), (3, "a", d1), (4, "a", far)],
        "event_id long, event_type string, ts timestamp",
    )
    row = decayed_counts(events, max_age_days=30, unit_bits=30).collect()[0]
    assert row.n_events == 4
    assert row.decayed_units == 2 * 2**30 + 2**29


# merge upsert ---------------------------------------------------------------


def test_merge_upsert_update_insert_keep_and_null_overwrite(spark):
    target = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)],
        "k long, seg string, bal double",
    )
    source = spark.createDataFrame(
        [(2, "B", None), (9, "new", 90.0)], "k long, seg string, bal double"
    )
    from hhek2sqlite_spark.operators.scd import merge_upsert

    out = {r.k: (r.seg, r.bal) for r in merge_upsert(target, source, key="k").collect()}
    assert out == {
        1: ("a", 10.0),  # untouched target survives
        2: ("B", None),  # matched: source wins WHOLESALE, incl. its NULL
        3: ("c", 30.0),
        9: ("new", 90.0),  # not-matched source inserts
    }


def test_merge_upsert_rejects_schema_mismatch(spark):
    import pytest as _pytest

    t = spark.createDataFrame([(1, "a")], "k long, seg string")
    s = spark.createDataFrame([(1, 2.0)], "k long, bal double")
    from hhek2sqlite_spark.operators.scd import merge_upsert

    with _pytest.raises(ValueError):
        merge_upsert(t, s, key="k")


# streaming sqlite sink ------------------------------------------------------


def test_streaming_sqlite_sink_exactly_once(spark, tmp_path):
    import sqlite3

    from hhek2sqlite_spark.streaming.sink import (
        COMMITS_TABLE,
        _checkpoint_app_id,
        stream_to_sqlite,
        write_batch_idempotent,
    )

    src = str(tmp_path / "src")
    db = str(tmp_path / "out.db")
    ckpt = str(tmp_path / "ckpt")
    spark.range(0, 100).selectExpr("id", "CAST(id % 3 AS STRING) AS grp").write.parquet(src)
    batch_schema = spark.read.parquet(src)
    stream = spark.readStream.schema(batch_schema.schema).parquet(src)
    q = stream_to_sqlite(stream, db_path=db, table="events_out", checkpoint_dir=ckpt)
    q.awaitTermination(120)
    app_id = _checkpoint_app_id(ckpt)  # reads the marker the stream wrote
    con = sqlite3.connect(db)
    assert con.execute('SELECT COUNT(*) FROM "events_out"').fetchone()[0] == 100
    committed = con.execute(
        f'SELECT batch_id FROM "{COMMITS_TABLE}" WHERE sink_table = ?', ("events_out",)
    ).fetchall()
    con.close()
    assert committed  # bookkeeping row written atomically with the data

    # replay the SAME batch id under the SAME stream identity (what a
    # post-crash restart does): no dupes
    n = write_batch_idempotent(
        batch_schema, committed[0][0], db_path=db, table="events_out", app_id=app_id
    )
    assert n == 0
    con = sqlite3.connect(db)
    assert con.execute('SELECT COUNT(*) FROM "events_out"').fetchone()[0] == 100
    con.close()

    # a NEW batch id appends
    n = write_batch_idempotent(
        batch_schema.limit(5), 9999, db_path=db, table="events_out", app_id=app_id
    )
    assert n == 5
    con = sqlite3.connect(db)
    assert con.execute('SELECT COUNT(*) FROM "events_out"').fetchone()[0] == 105
    con.close()


def test_streaming_sink_checkpoint_reset_does_not_drop_data(spark, tmp_path):
    """A deleted+recreated checkpoint restarts batch_id at 0; with the
    (app_id, table, batch_id) key the fresh batch 0 must still be
    WRITTEN, not skipped as the old stream's committed batch 0
    (the round-5 advice's silent-data-loss scenario)."""
    import shutil
    import sqlite3

    from hhek2sqlite_spark.streaming.sink import stream_to_sqlite

    src = str(tmp_path / "src")
    db = str(tmp_path / "out.db")
    ckpt = str(tmp_path / "ckpt")
    spark.range(0, 50).selectExpr("id").write.parquet(src)
    schema = spark.read.parquet(src).schema

    def drain():
        stream = spark.readStream.schema(schema).parquet(src)
        q = stream_to_sqlite(stream, db_path=db, table="t", checkpoint_dir=ckpt)
        q.awaitTermination(120)

    drain()
    con = sqlite3.connect(db)
    assert con.execute('SELECT COUNT(*) FROM "t"').fetchone()[0] == 50
    con.close()

    # reset the checkpoint: Spark reprocesses everything as batch 0 again —
    # a (table, batch_id)-only key would return 0 rows and drop the data
    shutil.rmtree(ckpt)
    drain()
    con = sqlite3.connect(db)
    # the rerun APPENDS (new stream identity, so its batch 0 is fresh);
    # duplicates here are correct at-least-once semantics across distinct
    # streams — the bug being guarded against is silent LOSS
    assert con.execute('SELECT COUNT(*) FROM "t"').fetchone()[0] == 100
    con.close()


# count-min sketch -----------------------------------------------------------


def test_cms_never_undercounts_and_bounds_overcount(spark):
    # stream with known exact counts: 'hot' x 500, 50 singletons
    items = ["hot"] * 500 + [f"rare{i}" for i in range(50)]
    df = spark.createDataFrame([(x,) for x in items], "token string")
    from hhek2sqlite_spark.operators.stats import CMS_WIDTH, cms_sketch

    sketch = {(r.hash_row, r.cell): r.cnt for r in cms_sketch(df, item_col="token").collect()}
    assert sum(v for (r, _), v in sketch.items() if r == 0) == len(items)  # each row sees every item

    def estimate(token):
        import hashlib

        hx = hashlib.md5(token.encode()).hexdigest()
        h1, h2 = int(hx[:15], 16), int(hx[15:30], 16)
        est = None
        for r in range(4):
            h = (h1 + r * h2) % CMS_WIDTH
            est = min(est, sketch.get((r, h), 0)) if est is not None else sketch.get((r, h), 0)
        return est

    n = len(items)
    assert estimate("hot") >= 500  # never undercounts
    assert estimate("hot") <= 500 + 3 * n // CMS_WIDTH + 3  # tight at this width
    for i in range(0, 50, 10):
        e = estimate(f"rare{i}")
        assert 1 <= e <= 1 + 3 * n // CMS_WIDTH + 3


# ngram LM counts ------------------------------------------------------------


def test_ngram_lm_counts_orders_and_min_count(spark):
    docs = _docs(spark, ["a b c", "a b d", "x"])
    from hhek2sqlite_spark.operators.text import ngram_lm_counts

    out = {(r.n, r.gram): r.cnt for r in ngram_lm_counts(docs, min_count=2).collect()}
    assert out == {(1, "a"): 2, (1, "b"): 2, (2, "a b"): 2}  # trigrams unique -> dropped
    # min_count=1 keeps the full table, incl. the order-3 grams
    all_ = {(r.n, r.gram): r.cnt for r in ngram_lm_counts(docs, min_count=1).collect()}
    assert all_[(3, "a b c")] == 1
    assert all_[(1, "x")] == 1


def test_ngram_lm_counts_doc_shorter_than_order(spark):
    docs = _docs(spark, ["solo"])
    from hhek2sqlite_spark.operators.text import ngram_lm_counts

    out = {(r.n, r.gram): r.cnt for r in ngram_lm_counts(docs, min_count=1).collect()}
    assert out == {(1, "solo"): 1}  # no phantom 2/3-grams from the guard


# embedding quantization -----------------------------------------------------


def test_quantize_profile_error_bound_and_scale(spark):
    from hhek2sqlite_spark.operators.similarity import quantize_profile

    emb = spark.createDataFrame(
        [(1, [1.0, -0.5, 0.25, 0.0]), (2, [0.1, 0.1, 0.1, 0.1])],
        "vec_id long, embedding array<float>",
    )
    rows = {r.vec_id: r for r in quantize_profile(emb, bits=8).collect()}
    assert rows[1].scale_e6 == 1_000_000  # max|x| = 1.0
    # int8 reconstruction error is bounded by scale/(2*127)
    for r in rows.values():
        assert 0 <= r.max_err_e9 <= int(1e9 * (r.scale_e6 / 1e6) / (2 * 127)) + 1


def test_sink_failure_mid_batch_leaves_no_partial_state(spark, tmp_path, monkeypatch):
    # crash INSIDE a batch (after some executemany calls): the shared
    # transaction must roll back BOTH the rows and the bookkeeping, so
    # the replay redoes the batch from zero instead of double-writing
    import sqlite3

    from hhek2sqlite_spark.streaming import sink as sinkmod

    db = str(tmp_path / "crash.db")
    df = spark.range(0, 250).selectExpr("id")

    real_connect = sqlite3.connect

    class FlakyCon:
        def __init__(self, con):
            self._con = con
            self._inserts = 0

        def executemany(self, *a, **kw):
            self._inserts += 1
            if self._inserts == 2:  # fail after the first 100-row chunk
                raise RuntimeError("injected crash")
            return self._con.executemany(*a, **kw)

        def __getattr__(self, name):
            return getattr(self._con, name)

    monkeypatch.setattr(
        sinkmod.sqlite3, "connect", lambda p: FlakyCon(real_connect(p))
    )
    import pytest as _pytest

    with _pytest.raises(RuntimeError, match="injected crash"):
        sinkmod.write_batch_idempotent(df, 0, db_path=db, table="t", batch_size=100)
    monkeypatch.setattr(sinkmod.sqlite3, "connect", real_connect)

    con = real_connect(db)
    assert con.execute('SELECT COUNT(*) FROM "t"').fetchone()[0] == 0  # rolled back
    assert con.execute(f'SELECT COUNT(*) FROM "{sinkmod.COMMITS_TABLE}"').fetchone()[0] == 0
    con.close()
    # the replay now succeeds and writes exactly once
    assert sinkmod.write_batch_idempotent(df, 0, db_path=db, table="t", batch_size=100) == 250
    con = real_connect(db)
    assert con.execute('SELECT COUNT(*) FROM "t"').fetchone()[0] == 250
    con.close()


def test_streaming_running_counts_incremental_view(spark, tmp_path):
    import sqlite3

    from hhek2sqlite_spark.streaming.sink import (
        _checkpoint_app_id,
        merge_counts_idempotent,
        stream_running_counts,
    )

    src = str(tmp_path / "ev")
    db = str(tmp_path / "view.db")
    base = spark.range(0, 300).selectExpr("id", "CAST(id % 4 AS STRING) AS typ")
    # two source files -> maxFilesPerTrigger=1 forces >= 2 micro-batches,
    # so the additive merge across batches is actually exercised
    base.filter("id < 150").coalesce(1).write.parquet(src)
    base.filter("id >= 150").coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema(base.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = stream_running_counts(
        stream,
        group_cols=("typ",),
        db_path=db,
        table="type_counts",
        checkpoint_dir=str(tmp_path / "ck"),
    )
    q.awaitTermination(120)

    con = sqlite3.connect(db)
    got = dict(con.execute('SELECT typ, n FROM "type_counts"').fetchall())
    batches = con.execute(
        'SELECT COUNT(*) FROM "_stream_commits" WHERE sink_table = ?',
        ("type_counts",),
    ).fetchone()[0]
    con.close()
    assert batches >= 2  # merged across micro-batches, not one big batch
    want = {r.typ: r.n for r in base.groupBy("typ").count().withColumnRenamed("count", "n").collect()}
    assert got == want

    # replaying a committed batch (same stream identity) must NOT double-add
    partial = base.limit(10).groupBy("typ").count().withColumnRenamed("count", "n")
    assert (
        merge_counts_idempotent(
            partial,
            0,
            db_path=db,
            table="type_counts",
            key_cols=("typ",),
            app_id=_checkpoint_app_id(str(tmp_path / "ck")),
        )
        == 0
    )
    con = sqlite3.connect(db)
    assert dict(con.execute('SELECT typ, n FROM "type_counts"').fetchall()) == want
    con.close()


def test_streaming_running_counts_resumes_from_checkpoint(spark, tmp_path):
    import sqlite3

    from hhek2sqlite_spark.streaming.sink import stream_running_counts

    src = str(tmp_path / "ev2")
    db = str(tmp_path / "view2.db")
    ck = str(tmp_path / "ck2")
    base = spark.range(0, 100).selectExpr("id", "CAST(id % 2 AS STRING) AS typ")
    base.coalesce(1).write.parquet(src)

    def drain():
        stream = spark.readStream.schema(base.schema).parquet(src)
        q = stream_running_counts(
            stream, group_cols=("typ",), db_path=db, table="tc", checkpoint_dir=ck
        )
        q.awaitTermination(120)

    drain()
    # RESTART with the same checkpoint after new data lands: only the
    # new file may be processed — a recount of the old one would show up
    # as typ-counts > the true totals
    spark.range(100, 160).selectExpr("id", "CAST(id % 2 AS STRING) AS typ").coalesce(
        1
    ).write.mode("append").parquet(src)
    drain()

    con = sqlite3.connect(db)
    got = dict(con.execute('SELECT typ, n FROM "tc"').fetchall())
    con.close()
    assert got == {"0": 80, "1": 80}


def test_key_skew_profile_buckets_by_bit_length(spark):
    from hhek2sqlite_spark.operators.stats import key_skew_profile

    # key A x1 (bucket 0), B x2, C x3 (bucket 1), D x8 (bucket 3)
    rows = [("A",)] + [("B",)] * 2 + [("C",)] * 3 + [("D",)] * 8
    df = spark.createDataFrame(rows, "k string")
    got = {r.log2_bucket: (r.n_keys, r.n_rows, r.max_cnt) for r in key_skew_profile(df, key_col="k").collect()}
    assert got == {0: (1, 1, 1), 1: (2, 5, 3), 3: (1, 8, 8)}


def test_null_text_documents_handled_not_ok(spark):
    # real corpora contain NULL text rows; they must never grade 'ok',
    # never vanish from dedup, and must split deterministically
    from hhek2sqlite_spark.operators import dedup, pipeline
    from hhek2sqlite_spark.operators.text import document_profile

    docs = spark.createDataFrame(
        [(0, None, "en", "s", 0), (1, "", "en", "s", 0),
         (2, "real content here with enough words to pass", "en", "s", 44),
         (3, None, "en", "s", 0)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    prof = {r.doc_id: r.quality for r in document_profile(docs).collect()}
    assert prof[0] == "null" and prof[3] == "null"
    assert prof[0] != "ok"

    kept = sorted(r.doc_id for r in dedup.exact_dedup(docs).collect())
    assert kept == [0, 1, 2]  # one NULL doc kept (first), none silently dropped

    splits = {r.doc_id: r.split for r in pipeline.dataset_split(docs).collect()}
    assert splits[0] == splits[1] == splits[3]  # NULL routed with empty content


def test_value_outliers_null_values_do_not_shift_moments(spark):
    # 20 tight values + 1 spike + NULLs: the NULLs must not inflate n
    # (sums skip them, so a count(*) n would understate the variance
    # threshold and misflag)
    rows = (
        [(i, "t", 10.0) for i in range(20)]
        + [(99, "t", 1000.0)]
        + [(200 + i, "t", None) for i in range(30)]
    )
    events = spark.createDataFrame(rows, "event_id long, event_type string, value double")
    from hhek2sqlite_spark.operators.stats import value_outliers

    assert [r.event_id for r in value_outliers(events).collect()] == [99]


def test_table_stats_counts_nulls_and_distinct(spark):
    from hhek2sqlite_spark.operators.stats import table_stats

    df = spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, None), (None, "b")], "k long, s string"
    )
    got = {r.col_name: r for r in table_stats(df, columns=("k", "s")).collect()}
    assert got["k"].n_rows == 4 and got["k"].n_nonnull == 3 and got["k"].n_distinct == 3
    assert got["k"].min_value == "1" and got["k"].max_value == "3"
    assert got["s"].n_nonnull == 3 and got["s"].n_distinct == 2
    assert got["s"].min_value == "a" and got["s"].max_value == "b"


def test_daily_gapfill_locf_semantics(spark):
    import datetime

    from hhek2sqlite_spark.operators.timeseries import daily_gapfill_locf

    def ts(d):
        return datetime.datetime(2024, 1, d, 12, 0, 0)

    # user 1: events on days 1 (v=2.0) and 4 (v=5.0) -> gaps on 2,3
    # user 2: single day -> no gaps
    events = spark.createDataFrame(
        [(1, ts(1), 2.0), (1, ts(4), 5.0), (2, ts(9), 7.0)],
        "user_id long, ts timestamp, value double",
    )
    rows = sorted(
        daily_gapfill_locf(events).collect(), key=lambda r: (r.user_id, r.day)
    )
    got = [(r.user_id, r.day.isoformat(), r.n_events, r.sum_q_filled, r.is_gap) for r in rows]
    assert got == [
        (1, "2024-01-01", 1, 2000, False),
        (1, "2024-01-02", 0, 2000, True),   # carried forward
        (1, "2024-01-03", 0, 2000, True),
        (1, "2024-01-04", 1, 5000, False),
        (2, "2024-01-09", 1, 7000, False),
    ]


def test_daily_ohlc_bars(spark):
    import datetime

    from hhek2sqlite_spark.operators.timeseries import daily_ohlc

    d = datetime.datetime
    events = spark.createDataFrame(
        [
            (1, "t", d(2024, 1, 1, 9), 10.0),   # open
            (2, "t", d(2024, 1, 1, 12), 50.0),  # high
            (3, "t", d(2024, 1, 1, 13), 5.0),   # low
            (4, "t", d(2024, 1, 1, 17), 20.0),  # close
            (5, "t", d(2024, 1, 2, 9), 7.0),    # next day, single event
        ],
        "event_id long, event_type string, ts timestamp, value double",
    )
    rows = {r.day.isoformat(): r for r in daily_ohlc(events).collect()}
    b = rows["2024-01-01"]
    assert (b.open_q, b.high_q, b.low_q, b.close_q, b.n_events) == (10000, 50000, 5000, 20000, 4)
    b2 = rows["2024-01-02"]
    assert (b2.open_q, b2.close_q, b2.n_events) == (7000, 7000, 1)


def test_equi_depth_bins_quartiles_and_null_bucket(spark):
    from hhek2sqlite_spark.operators.stats import equi_depth_bins

    rows = [(i, "t", float(i)) for i in range(1, 9)] + [(99, "t", None)]
    events = spark.createDataFrame(rows, "event_id long, event_type string, value double")
    got = {r.event_id: r.bucket for r in equi_depth_bins(events).collect()}
    # fences fit over the 8 NON-null values (the null is excluded, r5
    # advice): p25 = value at rank ceil(8*.25)=2 -> 2.0, p50 at rank 4
    # -> 4.0, p75 at rank 6 -> 6.0
    assert got[99] == "null"
    assert [got[i] for i in range(1, 9)] == ["q1", "q1", "q2", "q2", "q3", "q3", "q4", "q4"]


def test_equi_depth_bins_high_null_fraction_still_quarters(spark):
    """With 60% NULLs, NULL-inclusive fences would land every rank in
    the NULL tail (NULL fences -> everything q4). Non-null-only fences
    keep the quartiles balanced over the real values."""
    from hhek2sqlite_spark.operators.stats import equi_depth_bins

    rows = [(i, "t", float(i)) for i in range(1, 9)] + [
        (100 + i, "t", None) for i in range(12)
    ]
    events = spark.createDataFrame(rows, "event_id long, event_type string, value double")
    got = {r.event_id: r.bucket for r in equi_depth_bins(events).collect()}
    assert [got[i] for i in range(1, 9)] == ["q1", "q1", "q2", "q2", "q3", "q3", "q4", "q4"]
    assert all(got[100 + i] == "null" for i in range(12))


def test_equi_depth_bins_all_null_group_keeps_rows(spark):
    from hhek2sqlite_spark.operators.stats import equi_depth_bins

    rows = [(1, "t", 5.0), (2, "t", 6.0), (10, "u", None), (11, "u", None)]
    events = spark.createDataFrame(rows, "event_id long, event_type string, value double")
    got = {r.event_id: r.bucket for r in equi_depth_bins(events).collect()}
    # group 'u' has no fences row; its rows must still appear as 'null'
    assert got[10] == "null" and got[11] == "null"
    assert len(got) == 4
