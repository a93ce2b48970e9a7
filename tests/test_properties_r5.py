"""Property-based tests (hypothesis) for the round-5 operators: SCD2
history, MERGE upsert, and integer-quantized PageRank are each checked
against an independent pure-python re-derivation on arbitrary inputs.

Same batching strategy as test_properties.py: hypothesis generates the
case, ONE Spark job evaluates it, python computes the ground truth —
few examples, each adversarially shrunk by hypothesis on failure."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from hhek2sqlite_spark.operators.graph import RANK_SCALE, pagerank
from hhek2sqlite_spark.operators.scd import merge_upsert, scd2_merge

_SETTINGS = settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)

_DATES = st.sampled_from(
    [f"199{y}-0{m}-01" for y in range(3, 9) for m in range(1, 7)]
)
_VALS = st.sampled_from(["A", "B", "C"])


def _py_scd2(base_val, updates, base_from="1992-01-01", eot="9999-12-31"):
    """Ground truth: sort by (eff, attr), collapse runs, chain intervals."""
    rows = sorted([(base_from, base_val)] + [(e, v) for v, e in updates])
    kept = []
    prev = None
    for eff, val in rows:
        if prev is None or val != prev:
            kept.append((eff, val))
        prev = val
    out = []
    for i, (eff, val) in enumerate(kept):
        valid_to = kept[i + 1][0] if i + 1 < len(kept) else eot
        out.append((val, eff, valid_to, valid_to == eot))
    return out


@given(
    st.lists(
        st.tuples(_VALS, st.lists(st.tuples(_VALS, _DATES), max_size=6)),
        min_size=1,
        max_size=8,
    )
)
@_SETTINGS
def test_scd2_matches_python_reference(spark, keys):
    base_rows, upd_rows, want = [], [], {}
    for k, (base_val, updates) in enumerate(keys):
        # dedupe same-date updates: order within a date is tie-broken by
        # attr in BOTH implementations, but duplicate (val, date) pairs
        # would make run-collapse ambiguous only in the python ref
        seen_dates = {}
        for v, e in updates:
            seen_dates[e] = v
        updates = [(v, e) for e, v in seen_dates.items()]
        base_rows.append((k, base_val))
        upd_rows.extend((k, v, e) for v, e in updates)
        want[k] = _py_scd2(base_val, updates)
    base = spark.createDataFrame(base_rows, "k long, seg string")
    updates_df = spark.createDataFrame(
        upd_rows or [(None, None, None)], "k long, seg string, eff string"
    ).filter("k IS NOT NULL")
    out = scd2_merge(base, updates_df, key="k", attr="seg", base_from="1992-01-01")
    got: dict[int, list] = {}
    for r in out.collect():
        got.setdefault(r.k, []).append((r.seg, r.valid_from, r.valid_to, r.is_current))
    for k in want:
        assert sorted(got.get(k, [])) == sorted(want[k]), (k, got.get(k), want[k])


@given(
    st.lists(st.tuples(st.integers(0, 9), _VALS), min_size=1, max_size=12),
    st.lists(st.tuples(st.integers(0, 12), _VALS), max_size=8),
)
@_SETTINGS
def test_merge_upsert_matches_dict_semantics(spark, target_rows, source_rows):
    tgt = {k: v for k, v in target_rows}
    src = {k: v for k, v in source_rows}
    want = {**tgt, **src}
    target = spark.createDataFrame(list(tgt.items()), "k long, seg string")
    source = spark.createDataFrame(
        list(src.items()) or [(None, None)], "k long, seg string"
    ).filter("k IS NOT NULL")
    got = {r.k: r.seg for r in merge_upsert(target, source, key="k").collect()}
    assert got == want


def _py_pagerank(edges, iterations=3):
    from collections import defaultdict

    deg = defaultdict(int)
    for s, _ in edges:
        deg[s] += 1
    rank = {n: RANK_SCALE for n in deg}
    for _ in range(iterations):
        incoming = defaultdict(int)
        for s, d in edges:
            incoming[d] += rank[s] // deg[s]
        rank = {n: 150000 + (85 * c) // 100 for n, c in incoming.items()}
    return rank


@given(
    st.sets(
        st.tuples(st.integers(0, 7), st.integers(0, 7)).filter(lambda e: e[0] != e[1]),
        min_size=1,
        max_size=20,
    )
)
@_SETTINGS
def test_pagerank_matches_python_on_random_graphs(spark, directed):
    # symmetrize so no node dangles (the operator's documented contract)
    edges = sorted(set(directed) | {(b, a) for a, b in directed})
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r.node: r.rank_micros for r in pagerank(df, iterations=3).collect()}
    assert got == _py_pagerank(edges, iterations=3)
