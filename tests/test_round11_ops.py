"""Hand-computed value tests for the round-11 corpus-analysis operators
(vocab_growth, dice_collocations, ngram_novelty, source_vocab_overlap)
and the Q21-shaped supplier_wait_chain rollup."""

from __future__ import annotations

from datetime import datetime

from hhek2sqlite_spark.operators.text import (
    dice_collocations,
    ngram_novelty,
    source_vocab_overlap,
    vocab_growth,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string, source string")


def test_vocab_growth_hand_computed(spark):
    df = _docs(
        spark,
        [
            (0, "a b", "s"),
            (1, "b c", "s"),
            (2, "a d", "s"),
            (3, "d e e", "s"),
        ],
    )
    got = {
        r["bucket"]: r.asDict()
        for r in vocab_growth(df, n_buckets=2).collect()
    }
    # buckets: doc 0,1 -> 0 ; doc 2,3 -> 1 (doc_id*2 DIV 4)
    assert got[0]["new_types"] == 3  # a, b, c first seen in bucket 0
    assert got[0]["bucket_tokens"] == 4
    assert got[0]["cum_vocab"] == 3 and got[0]["cum_tokens"] == 4
    assert got[1]["new_types"] == 2  # d, e
    assert got[1]["bucket_tokens"] == 5
    assert got[1]["cum_vocab"] == 5 and got[1]["cum_tokens"] == 9


def test_vocab_growth_empty_bucket_kept_at_zero(spark):
    # bucket 1 (doc_id 2..3) has tokens but introduces no new types
    df = _docs(spark, [(0, "a b c", "s"), (3, "a b", "s")])
    got = {r["bucket"]: r.asDict() for r in vocab_growth(df, n_buckets=2).collect()}
    assert got[1]["new_types"] == 0
    assert got[1]["cum_vocab"] == 3


def test_dice_collocations_hand_computed(spark):
    df = _docs(spark, [(0, "x y x y", "s"), (1, "x y z", "s")])
    rows = dice_collocations(df, min_count=2, k=10).collect()
    assert len(rows) == 1  # only (x,y) reaches count 2
    r = rows[0].asDict()
    # c_bg("x y") = 3 (two in doc0, one in doc1); c(x) = c(y) = 3
    assert r == {
        "bigram": "x y",
        "c_bg": 3,
        "c1": 3,
        "c2": 3,
        "dice_e6": 1000000,  # 2*3/(3+3) = 1.0
    }


def test_dice_collocations_tie_break_and_k(spark):
    # two bigrams with identical dice; ascending bigram breaks the tie
    df = _docs(spark, [(0, "a b a b", "s"), (1, "c d c d", "s")])
    rows = dice_collocations(df, min_count=2, k=1).collect()
    assert len(rows) == 1 and rows[0]["bigram"] == "a b"


def test_ngram_novelty_hand_computed(spark):
    df = _docs(spark, [(0, "a b c", "s"), (1, "a b d", "s")])
    got = {r["doc_id"]: r.asDict() for r in ngram_novelty(df, n=2).collect()}
    assert got[0] == {
        "doc_id": 0,
        "n_grams": 2,
        "n_novel": 2,
        "novelty_e6": 1000000,
    }
    # doc 1: "a b" first seen in doc 0, "b d" is new -> 1/2
    assert got[1] == {
        "doc_id": 1,
        "n_grams": 2,
        "n_novel": 1,
        "novelty_e6": 500000,
    }


def test_ngram_novelty_short_docs_excluded(spark):
    df = _docs(spark, [(0, "solo", "s"), (1, "a b c", "s")])
    got = ngram_novelty(df, n=3).collect()
    assert [r["doc_id"] for r in got] == [1]


def test_source_vocab_overlap_hand_computed(spark):
    df = _docs(
        spark,
        [(0, "a b", "s1"), (1, "b c", "s2"), (2, "x", "s3")],
    )
    got = {
        (r["source_a"], r["source_b"]): r.asDict()
        for r in source_vocab_overlap(df).collect()
    }
    assert set(got) == {("s1", "s2"), ("s1", "s3"), ("s2", "s3")}
    assert got[("s1", "s2")]["inter"] == 1  # {b}
    assert got[("s1", "s2")]["jaccard_e6"] == 333333  # 1/3 half-up
    # zero-intersection pairs are KEPT at 0, not dropped
    assert got[("s1", "s3")]["inter"] == 0
    assert got[("s1", "s3")]["jaccard_e6"] == 0


def test_supplier_wait_chain_hand_computed(spark, sf_dir, tmp_path):
    import pandas as pd

    li = pd.DataFrame(
        {
            "l_orderkey": [1, 1, 2, 2, 3, 3],
            "l_suppkey": [10, 20, 10, 10, 10, 20],
            "l_shipdate": [
                datetime(2024, 1, 1),
                datetime(2024, 1, 5),  # o1: supp 20 ships last
                datetime(2024, 2, 1),
                datetime(2024, 2, 9),  # o2: single supplier -> excluded
                datetime(2024, 3, 3),
                datetime(2024, 3, 3),  # o3: tie -> both qualify
            ],
        }
    )
    d = tmp_path / "sf"
    d.mkdir()
    li.to_parquet(d / "lineitem.parquet")
    from hhek2sqlite_spark.plans.extensions import q_supplier_wait_chain

    got = {
        r["suppkey"]: r["numwait"]
        for r in q_supplier_wait_chain(spark, str(d)).collect()
    }
    assert got == {10: 1, 20: 2}


# ---------------------------------------------------------------- batch 2


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts timestamp"
    )


def test_funnel_stages_hand_computed(spark):
    from hhek2sqlite_spark.operators.funnel import funnel_stages

    rows = [
        # u1 converts every stage in order
        (1, 1, "view", datetime(2024, 1, 1, 10)),
        (2, 1, "click", datetime(2024, 1, 1, 11)),
        (3, 1, "purchase", datetime(2024, 1, 1, 12)),
        # u2: click BEFORE the first view -> click stage not reached
        (4, 2, "click", datetime(2024, 1, 2, 9)),
        (5, 2, "view", datetime(2024, 1, 2, 10)),
        # u3: view + click, purchase NOT strictly after the click
        (6, 3, "view", datetime(2024, 1, 3, 9)),
        (7, 3, "click", datetime(2024, 1, 3, 10)),
        (8, 3, "purchase", datetime(2024, 1, 3, 10)),
        # u4: never views
        (9, 4, "error", datetime(2024, 1, 4, 9)),
    ]
    got = funnel_stages(_events(spark, rows)).collect()[0].asDict()
    assert got == {
        "users_total": 4,
        "users_view": 3,
        "users_click": 2,
        "users_purchase": 1,
    }


def test_funnel_single_exchange_for_stacked_windows(spark):
    from hhek2sqlite_spark.operators.funnel import funnel_stages

    df = funnel_stages(
        _events(spark, [(1, 1, "view", datetime(2024, 1, 1))])
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    # the three per-user window minima must share ONE hashpartitioning
    # exchange on user_id (plus the final single-row aggregate)
    assert plan.count("hashpartitioning(user_id") <= 1, plan


def test_retention_cohorts_hand_computed(spark):
    from hhek2sqlite_spark.operators.funnel import retention_cohorts

    rows = [
        (1, 1, "view", datetime(2024, 1, 2)),   # week 0
        (2, 1, "view", datetime(2024, 1, 16)),  # week 2
        (3, 2, "view", datetime(2024, 1, 17)),  # week 2 (new cohort)
    ]
    got = {
        (r["cohort_week"], r["activity_week"]): r.asDict()
        for r in retention_cohorts(_events(spark, rows)).collect()
    }
    assert got[(0, 0)]["active_users"] == 1 and got[(0, 0)]["week_offset"] == 0
    assert got[(0, 2)]["active_users"] == 1 and got[(0, 2)]["week_offset"] == 2
    assert got[(2, 2)]["active_users"] == 1 and got[(2, 2)]["week_offset"] == 0
    assert len(got) == 3


def test_dedup_keep_best_hand_computed(spark):
    from hhek2sqlite_spark.operators.dedup import dedup_keep_best

    docs = spark.createDataFrame(
        [(1, 10), (2, 20), (3, 5), (4, 5)], "doc_id long, n_chars long"
    )
    clusters = spark.createDataFrame(
        [(1, 1), (2, 1)], "doc_id long, cluster_id long"
    )
    got = {r["doc_id"]: r.asDict() for r in dedup_keep_best(docs, clusters).collect()}
    # cluster {1,2}: doc 2 has more chars -> kept; doc 1 dropped
    assert got[1]["kept"] == 0 and got[2]["kept"] == 1
    assert got[1]["cluster_size"] == 2 and got[2]["cluster_id"] == 1
    # singletons keep themselves with size 1
    assert got[3] == {"doc_id": 3, "cluster_id": 3, "cluster_size": 1, "kept": 1}
    assert got[4]["kept"] == 1


def test_dedup_keep_best_tie_breaks_low_id(spark):
    from hhek2sqlite_spark.operators.dedup import dedup_keep_best

    docs = spark.createDataFrame([(5, 7), (6, 7)], "doc_id long, n_chars long")
    clusters = spark.createDataFrame([(5, 5), (6, 5)], "doc_id long, cluster_id long")
    got = {r["doc_id"]: r["kept"] for r in dedup_keep_best(docs, clusters).collect()}
    assert got == {5: 1, 6: 0}


# ----------------------------------------------------- seeded invariants
# (hypothesis-per-example Spark jobs are too slow; one seeded random
# corpus per operator checks the algebraic invariants instead)


def _rand_docs(spark, n_docs=40, vocab=12, seed=7):
    import random

    rng = random.Random(seed)
    words = [f"w{i}" for i in range(vocab)]
    rows = [
        (
            i,
            " ".join(rng.choice(words) for _ in range(rng.randint(1, 30))),
            f"src{i % 4}",
        )
        for i in range(n_docs)
    ]
    return _docs(spark, rows), rows


def test_vocab_growth_invariants_random_corpus(spark):
    df, rows = _rand_docs(spark)
    out = sorted(
        (r.asDict() for r in vocab_growth(df, n_buckets=5).collect()),
        key=lambda r: r["bucket"],
    )
    all_tokens = [w for _, t, _ in rows for w in t.split()]
    assert out[-1]["cum_vocab"] == len(set(all_tokens))
    assert out[-1]["cum_tokens"] == len(all_tokens)
    assert sum(r["new_types"] for r in out) == len(set(all_tokens))
    # cumulative columns are actual prefix sums
    acc_v = acc_t = 0
    for r in out:
        acc_v += r["new_types"]
        acc_t += r["bucket_tokens"]
        assert r["cum_vocab"] == acc_v and r["cum_tokens"] == acc_t


def test_dice_collocations_bounds_random_corpus(spark):
    df, _ = _rand_docs(spark, seed=11)
    for r in dice_collocations(df, min_count=2, k=100).collect():
        assert 0 < r["dice_e6"] <= 1000000
        assert r["c_bg"] <= min(r["c1"], r["c2"])


def test_ngram_novelty_invariants_random_corpus(spark):
    df, _ = _rand_docs(spark, seed=13)
    rows = ngram_novelty(df, n=2).collect()
    assert rows, "corpus must yield docs with >= 2 tokens"
    by_id = sorted(rows, key=lambda r: r["doc_id"])
    # the earliest scored doc introduces everything it contains
    assert by_id[0]["novelty_e6"] == 1000000
    for r in rows:
        assert 0 <= r["n_novel"] <= r["n_grams"]


def test_source_overlap_bounds_random_corpus(spark):
    df, _ = _rand_docs(spark, seed=17)
    rows = source_vocab_overlap(df).collect()
    assert len(rows) == 6  # C(4,2) source pairs
    for r in rows:
        assert 0 <= r["jaccard_e6"] <= 1000000


def test_dedup_keep_best_exactly_one_survivor_per_cluster(spark):
    import random

    from hhek2sqlite_spark.operators.dedup import dedup_keep_best

    rng = random.Random(23)
    docs = spark.createDataFrame(
        [(i, rng.randint(1, 50)) for i in range(30)],
        "doc_id long, n_chars long",
    )
    # random disjoint clusters labeled by their min member
    members = list(range(30))
    rng.shuffle(members)
    assignments = []
    while members:
        size = min(rng.randint(1, 4), len(members))
        group, members = members[:size], members[size:]
        if size > 1:
            label = min(group)
            assignments += [(d, label) for d in group]
    clusters = spark.createDataFrame(
        assignments, "doc_id long, cluster_id long"
    )
    out = dedup_keep_best(docs, clusters).collect()
    assert len(out) == 30  # every doc classified
    per_cluster = {}
    for r in out:
        per_cluster.setdefault(r["cluster_id"], []).append(r)
    for cid, rows in per_cluster.items():
        assert sum(r["kept"] for r in rows) == 1, cid
        assert all(r["cluster_size"] == len(rows) for r in rows)


def test_funnel_counts_monotone_random_events(spark):
    import random

    from hhek2sqlite_spark.operators.funnel import funnel_stages

    rng = random.Random(29)
    types = ["view", "click", "purchase", "error"]
    rows = [
        (
            i,
            rng.randint(1, 12),
            rng.choice(types),
            datetime(2024, 1, 1 + rng.randint(0, 27), rng.randint(0, 23)),
        )
        for i in range(300)
    ]
    got = funnel_stages(_events(spark, rows)).collect()[0].asDict()
    assert (
        got["users_total"]
        >= got["users_view"]
        >= got["users_click"]
        >= got["users_purchase"]
    )


def test_retention_offset0_totals_all_users(spark):
    import random

    from hhek2sqlite_spark.operators.funnel import retention_cohorts

    rng = random.Random(31)
    rows = [
        (
            i,
            rng.randint(1, 20),
            "view",
            datetime(2024, 1, 1 + rng.randint(0, 27)),
        )
        for i in range(200)
    ]
    out = retention_cohorts(_events(spark, rows)).collect()
    users = len({u for _, u, _, _ in rows})
    # offset-0 row of each cohort counts the whole cohort exactly once
    assert sum(r["active_users"] for r in out if r["week_offset"] == 0) == users
    for r in out:
        assert r["week_offset"] >= 0


# ------------------------------------------------- TPC-H shapes (batch 3)


def _write_tpch_fixture(tmp_path):
    import pandas as pd

    d = tmp_path / "sf"
    d.mkdir()
    pd.DataFrame(
        {
            "n_nationkey": [1, 2],
            "n_name": ["SWEDEN", "NORWAY"],
            "n_regionkey": [0, 0],
        }
    ).to_parquet(d / "nation.parquet")
    pd.DataFrame(
        {
            "c_custkey": [10, 11, 12],
            "c_name": ["a", "b", "c"],
            "c_nationkey": [1, 1, 2],
            "c_acctbal": [100.0, 100.0, 1.0],
            "c_mktsegment": ["SEG1", "SEG1", "SEG2"],
        }
    ).to_parquet(d / "customer.parquet")
    pd.DataFrame(
        {"s_suppkey": [20, 21], "s_name": ["s", "t"], "s_nationkey": [2, 1],
         "s_acctbal": [0.0, 0.0]}
    ).to_parquet(d / "supplier.parquet")
    pd.DataFrame(
        {
            "o_orderkey": [30, 31, 32],
            "o_custkey": [10, 11, 12],
            "o_orderstatus": ["F", "F", "F"],
            "o_totalprice": [1.0, 1.0, 1.0],
            "o_orderdate": [
                datetime(2000, 12, 31),
                datetime(2001, 2, 1),
                datetime(2000, 6, 1),
            ],
            "o_orderpriority": ["1", "1", "1"],
        }
    ).astype({"o_orderdate": "datetime64[us]"}).to_parquet(d / "orders.parquet")
    pd.DataFrame(
        {
            "l_orderkey": [30, 32, 30],
            "l_partkey": [40, 41, 40],
            "l_suppkey": [20, 21, 21],
            "l_linenumber": [1, 1, 2],
            "l_quantity": [1.0, 1.0, 1.0],
            "l_extendedprice": [100.0, 2000.0, 0.01],
            "l_discount": [0.05, 0.0, 0.0],
            "l_tax": [0.0, 0.0, 0.0],
            "l_returnflag": ["N", "N", "N"],
            "l_linestatus": ["O", "O", "O"],
            "l_shipdate": [datetime(2000, 1, 1)] * 3,
        }
    ).astype({"l_shipdate": "datetime64[us]"}).to_parquet(d / "lineitem.parquet")
    return str(d)


def test_nation_trade_flows_hand_computed(spark, tmp_path):
    from hhek2sqlite_spark.plans.extensions import q_nation_trade_flows

    d = _write_tpch_fixture(tmp_path)
    rows = {
        (r["cust_nation"], r["supp_nation"], r["order_year"]): r.asDict()
        for r in q_nation_trade_flows(spark, d).collect()
    }
    # order 30 (cust nation SWEDEN): line via supp 20 (NORWAY) qualifies
    # at 100.00 with 5% discount = 95.00; its second line via supp 21
    # (SWEDEN) is same-nation and excluded. order 32 (cust NORWAY) via
    # supp 21 (SWEDEN) qualifies at 2000.00.
    assert rows[("SWEDEN", "NORWAY", 2000)]["revenue"] == 95.0
    assert rows[("SWEDEN", "NORWAY", 2000)]["n_lines"] == 1
    assert rows[("NORWAY", "SWEDEN", 2000)]["revenue"] == 2000.0
    assert len(rows) == 2


def test_revenue_share_parts_threshold_drops_tail(spark, tmp_path):
    from hhek2sqlite_spark.plans.extensions import q_revenue_share_parts

    d = _write_tpch_fixture(tmp_path)
    # part 41 revenue 2000.00 dominates; part 40 revenue 95.01 is
    # well above total/2000 too -> both kept; the exactness check is
    # the revenue values themselves
    rows = {r["partkey"]: r["revenue"] for r in q_revenue_share_parts(spark, d).collect()}
    assert rows == {40: 95.01, 41: 2000.0}


def test_revenue_share_parts_drops_sub_threshold_part(spark, tmp_path):
    import pandas as pd

    from hhek2sqlite_spark.plans.extensions import q_revenue_share_parts

    d = tmp_path / "sf2"
    d.mkdir()
    # part 2's share is 10000/(2e9 + 10000) < 1/2000 -> dropped
    pd.DataFrame(
        {
            "l_orderkey": [1, 2],
            "l_partkey": [1, 2],
            "l_suppkey": [1, 1],
            "l_linenumber": [1, 1],
            "l_quantity": [1.0, 1.0],
            "l_extendedprice": [2000.0, 0.01],
            "l_discount": [0.0, 0.0],
            "l_tax": [0.0, 0.0],
            "l_returnflag": ["N", "N"],
            "l_linestatus": ["O", "O"],
            "l_shipdate": [datetime(2000, 1, 1)] * 2,
        }
    ).to_parquet(d / "lineitem.parquet")
    rows = {r["partkey"]: r["revenue"] for r in q_revenue_share_parts(spark, str(d)).collect()}
    assert rows == {1: 2000.0}


def test_churned_high_value_hand_computed(spark, tmp_path):
    from hhek2sqlite_spark.plans.extensions import q_churned_high_value

    d = _write_tpch_fixture(tmp_path)
    rows = [r.asDict() for r in q_churned_high_value(spark, d).collect()]
    # c10: bal 100 > positive-avg 67, last order 2000-12-31 < cutoff -> churned
    # c11: bal above avg but last order 2001-02-01 >= cutoff -> active
    # c12: bal 1 below avg -> excluded
    assert rows == [
        {"c_mktsegment": "SEG1", "n_custs": 1, "total_acctbal": 100.0}
    ]


# ------------------------------------------ sparse cosine + OLS (batch 4)


def test_sparse_cosine_pairs_hand_computed(spark, tmp_path):
    import pandas as pd

    from hhek2sqlite_spark.plans.extensions import q_sparse_cosine_pairs

    d = tmp_path / "sfc"
    d.mkdir()
    pd.DataFrame(
        {
            "doc_id": [0, 1, 2],
            "text": ["apple banana", "apple banana", "cherry"],
            "lang": ["en"] * 3,
            "source": ["s"] * 3,
            "n_chars": [12, 12, 6],
        }
    ).to_parquet(d / "documents.parquet")
    rows = [r.asDict() for r in q_sparse_cosine_pairs(spark, str(d)).collect()]
    # with 3 docs the entity buckets (37) never collide, so the only
    # candidate pair is (0,1) via the shared rare words: each rare
    # vector is {apple:1, banana:1, ent_i:1, ent_j:1} -> norm2 = 4,
    # dot = 2, cos^2 = 4/16 = 0.25 -> exactly at the >= 250000 keep line
    assert rows == [{"id_a": 0, "id_b": 1, "dot": 2, "cos2_e6": 250000}]


def test_grouped_ols_hand_computed(spark, tmp_path):
    import pandas as pd

    from hhek2sqlite_spark.plans.extensions import q_grouped_ols

    d = tmp_path / "sfe"
    d.mkdir()
    pd.DataFrame(
        {
            "event_id": [1, 2, 3, 4, 5],
            "ts": pd.to_datetime(
                ["2024-01-01", "2024-01-02", "2024-01-03", "2024-01-01", "2024-01-05"]
            ).astype("datetime64[us]"),
            "user_id": [1] * 5,
            "event_type": ["a", "a", "a", "b", "b"],
            "value": [1.0, 2.0, 3.0, 7.0, 7.0],
            "props": ["{}"] * 5,
        }
    ).to_parquet(d / "events.parquet")
    got = {r["event_type"]: r.asDict() for r in q_grouped_ols(spark, str(d)).collect()}
    # type a: (0,100),(1,200),(2,300) cents -> slope 100 cents/day,
    # intercept 100 cents
    assert got["a"]["slope_e6"] == 100_000_000
    assert got["a"]["intercept_cents"] == 100
    assert got["a"]["n"] == 3
    # type b: constant 7.00 across days 0 and 4 -> slope 0, intercept 700
    assert got["b"]["slope_e6"] == 0
    assert got["b"]["intercept_cents"] == 700
