"""Property-based tests (hypothesis): roundtrip invariants the reference
asserts only pointwise (/root/reference/db_test.go:262-267, :548's
untested-special-characters TODO) hold for *arbitrary* inputs here.

Strategy: generate a batch of adversarial values per property, run ONE
Spark job over the whole batch (hypothesis drives generation; Spark
round-trips are too slow to run per-example), compare element-wise
against the Python-side ground truth.
"""

from __future__ import annotations

from decimal import Decimal

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from hhek2sqlite_spark.functions import scalars

# every windows-1252-encodable codepoint, including the 0x80-0x9F block
# (euro etc.), quotes, and the Swedish å/ä/ö the fixture stresses
_CP1252_CHARS = [
    chr(cp)
    for cp in range(32, 0x250)
    if chr(cp).encode("cp1252", errors="ignore")
    and len(chr(cp).encode("cp1252", errors="ignore")) == 1
]

cp1252_text = st.text(alphabet=_CP1252_CHARS, min_size=0, max_size=40)

money = st.decimals(
    min_value=Decimal("-999999999999999.9999"),
    max_value=Decimal("999999999999999.9999"),
    places=4,
    allow_nan=False,
    allow_infinity=False,
)

_SETTINGS = settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)


@given(st.lists(cp1252_text, min_size=1, max_size=50))
@_SETTINGS
def test_cp1252_roundtrip(spark, strings):
    """decode(encode(s)) == s for every cp1252-encodable string — the
    reference's toUtf8 transcode (F1) must never corrupt data, including
    the 0x80-0x9F block where cp1252 diverges from latin-1."""
    df = spark.createDataFrame([(s,) for s in strings], "s string")
    out = df.select(
        "s",
        scalars.decode_cp1252(scalars.encode_cp1252("s")).alias("rt"),
        scalars.encode_cp1252("s").alias("enc"),
    ).collect()
    for r in out:
        assert r.rt == r.s
        assert bytes(r.enc) == r.s.encode("cp1252")


@given(st.lists(money, min_size=1, max_size=50))
@_SETTINGS
def test_money_locale_roundtrip(spark, amounts):
    """money_from_locale_string(money_to_locale_string(d)) == d exactly,
    in both the comma (Jet/sv_SE) and point (SQLite) renderings — the
    comma2point/point2comma pair (F3) with exact-decimal fidelity."""
    df = spark.createDataFrame(
        [(d,) for d in amounts], f"d {scalars.MONEY_TYPE}"
    )
    out = df.select(
        "d",
        scalars.money_from_locale_string(
            scalars.money_to_locale_string("d", comma=True)
        ).alias("rt_comma"),
        scalars.money_from_locale_string(
            scalars.money_to_locale_string("d", comma=False)
        ).alias("rt_point"),
    ).collect()
    for r in out:
        assert r.rt_comma == r.d
        assert r.rt_point == r.d


@given(st.lists(st.text(max_size=8), min_size=1, max_size=50))
@_SETTINGS
def test_empty_to_null(spark, strings):
    """F8/P3: exactly the zero-length string becomes NULL, nothing else."""
    df = spark.createDataFrame([(s,) for s in strings], "s string")
    out = df.select("s", scalars.empty_to_null("s").alias("n")).collect()
    for r in out:
        assert r.n == (r.s if r.s != "" else None)


@given(
    st.lists(
        st.dates(min_value=__import__("datetime").date(1900, 1, 1)),
        min_size=1,
        max_size=50,
    )
)
@_SETTINGS
def test_iso_date_roundtrip(spark, dates):
    """F9/F12: iso_format(iso_date(s)) == s for valid yyyy-MM-dd strings."""
    strs = [d.isoformat() for d in dates]
    df = spark.createDataFrame([(s,) for s in strs], "s string")
    out = df.select(
        "s", scalars.iso_format(scalars.iso_date("s")).alias("rt")
    ).collect()
    for r in out:
        assert r.rt == r.s


# ---------------------------------------------------------------------------
# Round-4 operator invariants (batch-style: one Spark job per property)
# ---------------------------------------------------------------------------

doc_text = st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=0x17F),
    min_size=0,
    max_size=300,
)


@given(st.lists(doc_text, min_size=1, max_size=25))
@_SETTINGS
def test_pack_chunks_offsets_contiguous(spark, texts):
    """Within every shard, pack offsets are exactly the running sum of
    chunk lengths in (doc, chunk) order — no gaps, no overlaps — and a
    pack never starts at a non-boundary the budget math wouldn't give."""
    from hhek2sqlite_spark.operators.pipeline import doc_chunks, pack_chunks

    docs = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    out = pack_chunks(
        doc_chunks(docs, size=50, overlap=10), budget=120, n_shards=4
    ).collect()
    by_shard: dict[int, list] = {}
    for r in out:
        by_shard.setdefault(r.shard, []).append(r)
    for shard, rows in by_shard.items():
        rows.sort(key=lambda r: (r.doc_id, r.chunk_idx))
        run = 0
        for r in rows:
            assert r.offset_in_shard == run, (shard, r)
            assert r.pack_id == run // 120, (shard, r)
            run += r.chunk_len


@given(st.lists(doc_text, min_size=1, max_size=25))
@_SETTINGS
def test_repetition_profile_count_invariants(spark, texts):
    """0 <= distinct <= total, and total == max(0, len(norm)-7) computed
    from the Python-side normalization ground truth. NOTE: the ground
    truth must use ASCII whitespace semantics — Java regex and RE2 agree
    that \\s is [ \\t\\n\\r\\f\\x0b] while PYTHON's \\s also matches
    \\xa0 (NBSP) and other unicode spaces; Spark and DuckDB match each
    other (which is why oracle parity holds), Python is the outlier."""
    import re

    from hhek2sqlite_spark.operators.pipeline import repetition_profile

    docs = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    got = {r.doc_id: r for r in repetition_profile(docs, n=8).collect()}
    ws = " \t\n\r\f\x0b"
    for i, t in enumerate(texts):
        norm = re.sub(f"[{ws}]+", " ", t.lower()).strip(ws)
        expect_total = max(0, len(norm) - 7)
        r = got[i]
        assert r.n_shingles == expect_total, (t, r)
        assert 0 <= r.n_distinct_shingles <= max(r.n_shingles, 0)
        if r.n_shingles == 0:
            assert r.rep_bucket == "empty"


@given(st.lists(st.tuples(doc_text, st.sampled_from("abc")), min_size=1, max_size=30))
@_SETTINGS
def test_stratified_sample_ranks_dense_and_bounded(spark, rows):
    from hhek2sqlite_spark.operators.pipeline import stratified_sample

    docs = spark.createDataFrame(
        [(i, t, s) for i, (t, s) in enumerate(rows)],
        "doc_id long, text string, source string",
    )
    n = 3
    out = stratified_sample(docs, n_per_stratum=n, stratum_col="source").collect()
    by_stratum: dict[str, list[int]] = {}
    for r in out:
        assert 1 <= r.sample_rank <= n
        by_stratum.setdefault(r.source, []).append(r.sample_rank)
    from collections import Counter

    totals = Counter(s for _, s in rows)
    for s, ranks in by_stratum.items():
        # ranks are dense 1..min(n, stratum size), each exactly once
        assert sorted(ranks) == list(range(1, min(n, totals[s]) + 1)), (s, ranks)
