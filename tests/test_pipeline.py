"""Semantic tests for the pipeline tier (operators/pipeline.py):
edit-distance near-dup, dataset split, chunking, PII redaction,
contamination. Parity with the DuckDB oracles is covered by
test_oracle_parity / scripts/run_parity.py; these pin the semantics on
constructed inputs where the right answer is known by hand."""

from __future__ import annotations

from pyspark.sql import functions as F

from hhek2sqlite_spark.operators import pipeline


def _docs(spark, texts):
    return spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")


def test_edit_distance_pairs_finds_small_edit(spark):
    base = "the quick brown fox jumps over the lazy dog " * 5
    edited = base.replace("lazy", "hazy", 1)  # distance 2 (l->h is 1? no: replace 1 char)
    unrelated = "completely different content with no overlap whatsoever " * 5
    out = pipeline.edit_distance_pairs(
        _docs(spark, [base, edited, unrelated]), max_dist=10
    ).collect()
    pairs = {(r.id_a, r.id_b): r.edit_dist for r in out}
    assert (0, 1) in pairs
    assert pairs[(0, 1)] == 1  # single substitution
    assert all(2 not in p for p in pairs)  # unrelated doc never paired


def test_edit_distance_threshold_excludes(spark):
    a = "aaaa bbbb cccc dddd eeee ffff gggg hhhh iiii jjjj"
    b = a[:25] + "zzzz yyyy xxxx wwww vvvv uuuu"  # shares a prefix, big edit
    out = pipeline.edit_distance_pairs(_docs(spark, [a, b]), max_dist=5, max_df=10).collect()
    assert out == []


def test_dataset_split_is_content_keyed(spark):
    texts = [f"document number {i} with some body text" for i in range(20)]
    texts.append(texts[0])  # exact duplicate, different doc_id
    out = pipeline.dataset_split(_docs(spark, texts)).collect()
    by_id = {r.doc_id: r for r in out}
    assert len(by_id) == 21
    # leakage safety: identical content => identical split, always
    assert by_id[0].split == by_id[20].split
    assert by_id[0].bucket_hex == by_id[20].bucket_hex
    assert {r.split for r in out} <= {"train", "val", "test"}


def test_dataset_split_deterministic_across_runs(spark):
    texts = [f"doc {i}" for i in range(10)]
    a = {r.doc_id: r.split for r in pipeline.dataset_split(_docs(spark, texts)).collect()}
    b = {r.doc_id: r.split for r in pipeline.dataset_split(_docs(spark, texts)).collect()}
    assert a == b


def test_doc_chunks_window_and_overlap(spark):
    # 500 chars, size 200, overlap 40 -> stride 160 -> offsets 0,160,320
    # chunk lens 200, 200, 180
    text = "a" * 500
    out = pipeline.doc_chunks(_docs(spark, [text]), size=200, overlap=40).collect()
    lens = {r.chunk_idx: r.chunk_len for r in out}
    assert lens == {0: 200, 1: 200, 2: 180}
    # all-'a' chunks of equal length have equal fingerprints
    fps = {r.chunk_idx: r.chunk_fp for r in out}
    assert fps[0] == fps[1] and fps[0] != fps[2]


def test_doc_chunks_short_and_empty_docs(spark):
    out = pipeline.doc_chunks(_docs(spark, ["short", ""]), size=200, overlap=40).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert len(by_doc[0]) == 1 and by_doc[0][0].chunk_len == 5
    assert len(by_doc[1]) == 1 and by_doc[1][0].chunk_len == 0


def test_doc_chunks_exact_boundary(spark):
    # len == size -> exactly one chunk; len == size+1 -> two
    out = pipeline.doc_chunks(_docs(spark, ["b" * 200, "c" * 201]), size=200, overlap=40).collect()
    counts = {}
    for r in out:
        counts[r.doc_id] = counts.get(r.doc_id, 0) + 1
    assert counts == {0: 1, 1: 2}


def test_pii_redact_counts_and_redacts(spark):
    text = "Contact Bob.Smith@Example.COM or visit https://example.com/x?q=1 ok"
    out = pipeline.pii_redact(_docs(spark, [text])).collect()[0]
    assert out.n_emails == 1
    assert out.n_urls == 1
    # the redacted form has no address left; its fp differs from raw md5
    red = (
        _docs(spark, [text])
        .select(
            F.regexp_replace(
                F.regexp_replace(
                    F.trim(F.regexp_replace(F.lower("text"), r"\s+", " ")),
                    pipeline.EMAIL_RE,
                    "<EMAIL>",
                ),
                pipeline.URL_RE,
                "<URL>",
            ).alias("r")
        )
        .collect()[0]
        .r
    )
    assert "<EMAIL>" in red and "<URL>" in red
    assert out.redacted_len == len(red)


def test_contamination_flags_planted_duplicate(spark):
    eval_doc = "benchmark question about the capital of sweden and its harbours " * 4
    clean = "totally unrelated corpus document discussing cooking recipes only " * 4
    contaminated = eval_doc + " trailing answer text"
    df = spark.createDataFrame(
        [(0, eval_doc), (100, clean), (101, contaminated)], "doc_id long, text string"
    )
    out = pipeline.contamination_pairs(df, eval_max_id=50, min_shared=20).collect()
    flagged = {(r.doc_id, r.eval_id) for r in out}
    assert (101, 0) in flagged
    assert all(d != 100 for d, _ in flagged)


def test_token_topk_counts_and_rank(spark):
    from hhek2sqlite_spark.operators.text import token_topk

    docs = spark.createDataFrame(
        [
            (1, "aa bb bb cc"),
            (2, "bb cc cc x"),  # "x" dropped by min_len=2
            (3, "cc"),
        ],
        "doc_id long, text string",
    )
    out = {r.token: (r.n_occurrences, r.n_docs, r.rank) for r in token_topk(docs, k=2).collect()}
    # cc: 4 occurrences in 3 docs; bb: 3 in 2; aa excluded by k=2
    assert out == {"cc": (4, 3, 1), "bb": (3, 2, 2)}


def test_token_topk_plan_is_take_ordered(spark, sf_dir):
    """The global top-k must compile to TakeOrderedAndProject (per-
    partition heaps), never a global sort or an unpartitioned window
    over the whole vocabulary."""
    import contextlib
    import io

    from hhek2sqlite_spark.plans.extensions import q_token_topk

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        q_token_topk(spark, sf_dir).explain("formatted")
    assert "TakeOrderedAndProject" in buf.getvalue()


def test_tfidf_topk_scores(spark):
    from hhek2sqlite_spark.operators.text import tfidf_topk

    docs = spark.createDataFrame(
        [
            (1, "apple apple banana"),
            (2, "banana cherry"),
        ],
        "doc_id long, text string",
    )
    rows = {(r.doc_id, r.token): (r.tf, r.df, r.score_e6, r.rank)
            for r in tfidf_topk(docs, k=2, min_len=4).collect()}
    # doc 1: apple tf=2 df=1 -> 2e6 rank 1; banana tf=1 df=2 -> 0.5e6 rank 2
    assert rows[(1, "apple")] == (2, 1, 2_000_000, 1)
    assert rows[(1, "banana")] == (1, 2, 500_000, 2)
    # doc 2: cherry tf=1 df=1 -> 1e6 rank 1; banana 0.5e6 rank 2
    assert rows[(2, "cherry")] == (1, 1, 1_000_000, 1)
    assert rows[(2, "banana")] == (1, 2, 500_000, 2)


def test_stratified_sample_equal_strata_and_determinism(spark, sf_dir):
    from hhek2sqlite_spark.operators.pipeline import stratified_sample
    from hhek2sqlite_spark.sources.parquet import load_table

    docs = load_table(spark, sf_dir, "documents")
    out = stratified_sample(docs, n_per_stratum=5)
    per = {r.source: r.n for r in out.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()}
    n_sources = docs.select("source").distinct().count()
    assert len(per) == n_sources
    assert all(n <= 5 for n in per.values())
    # deterministic: same rows on recompute
    a = {(r.doc_id, r.sample_rank) for r in out.collect()}
    b = {(r.doc_id, r.sample_rank) for r in stratified_sample(docs, n_per_stratum=5).collect()}
    assert a == b


def test_stratified_sample_two_pass_exact_equality(spark, sf_dir):
    """The two-pass hash-threshold refinement must return BIT-EXACT the
    one-pass output: the n smallest sample keys always survive any
    threshold that keeps >= n rows, and the under-fill guard makes the
    probabilistic tail exact."""
    from hhek2sqlite_spark.operators.pipeline import stratified_sample
    from hhek2sqlite_spark.sources.parquet import load_table

    docs = load_table(spark, sf_dir, "documents")
    one = sorted(map(tuple, stratified_sample(docs, n_per_stratum=5).collect()))
    two = sorted(
        map(tuple, stratified_sample(docs, n_per_stratum=5, two_pass=True).collect())
    )
    assert one == two


def test_stratified_sample_two_pass_underfill_fallback(spark, sf_dir):
    """With a microscopic oversample the threshold keeps ~0 rows; the
    survivor-recount guard must fall back to the full stratum so the
    output is STILL exactly the one-pass sample (exactness never rests
    on the hash landing well)."""
    from hhek2sqlite_spark.operators.pipeline import stratified_sample
    from hhek2sqlite_spark.sources.parquet import load_table

    docs = load_table(spark, sf_dir, "documents")
    one = sorted(map(tuple, stratified_sample(docs, n_per_stratum=5).collect()))
    two = sorted(
        map(
            tuple,
            stratified_sample(
                docs, n_per_stratum=5, two_pass=True, oversample=1e-9
            ).collect(),
        )
    )
    assert one == two


def test_stratified_sample_two_pass_bounds_reducer(spark, sf_dir):
    """The ranking window's input must be the THRESHOLDED survivor set
    (~oversample*n rows per stratum), not the full stratum — the point
    of the second pass. Checked empirically (survivor count per stratum
    well under the stratum size) and structurally (the threshold filter
    sits below the window's stratum Exchange in the plan)."""
    import contextlib
    import io

    from hhek2sqlite_spark.operators.pipeline import stratified_sample
    from hhek2sqlite_spark.sources.parquet import load_table

    docs = load_table(spark, sf_dir, "documents")
    out = stratified_sample(docs, n_per_stratum=5, two_pass=True, oversample=2.0)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain("formatted")
    plan = buf.getvalue()
    # the 60-bit key threshold runs AT the broadcast join (below the
    # window's exchange by construction — the join feeds it), so only
    # ~oversample*n rows per stratum ever shuffle to the reducer
    assert "Join condition: (cast(conv(substring(sample_key" in plan, plan
    low = plan.lower()
    assert "hashpartitioning(source" in low, plan
    # Spark additionally inserts partial+final WindowGroupLimit around
    # that exchange — the reducer sees at most n rows per map partition
    assert low.count("windowgrouplimit") >= 2, plan


def test_neardup_clusters_components(spark):
    from hhek2sqlite_spark.operators.dedup import neardup_clusters

    # components: {1,2,3,4} (chain), {7,9}, singleton 5 never appears
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (7, 9)], "id_a long, id_b long"
    )
    got = {r.doc_id: r.cluster_id for r in neardup_clusters(pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 7: 7, 9: 7}


def test_neardup_clusters_falls_back_to_star_on_long_chains(spark):
    from hhek2sqlite_spark.operators.dedup import neardup_clusters

    # a path of length 11 has diameter >> max_iter=2: min-label
    # propagation cannot converge, so the star fallback must take over
    # and still produce the exact component labelling
    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(10, 20)], "id_a long, id_b long"
    )
    got = {r.doc_id: r.cluster_id for r in neardup_clusters(chain, max_iter=2).collect()}
    assert got == {i: 10 for i in range(10, 21)}


def test_star_cc_path_longer_than_propagation_bound(spark):
    from hhek2sqlite_spark.operators.dedup import star_connected_components

    # path 0-1-...-40 (diameter 40 > the default 25-round propagation
    # bound) plus a disjoint triangle and an out-of-order component
    pairs = [(i, i + 1) for i in range(40)]
    pairs += [(100, 101), (101, 102), (102, 100)]
    pairs += [(205, 203), (203, 209)]
    df = spark.createDataFrame(pairs, "id_a long, id_b long")
    got = {r.doc_id: r.cluster_id for r in star_connected_components(df).collect()}
    want = {i: 0 for i in range(41)}
    want.update({100: 100, 101: 100, 102: 100, 203: 203, 205: 203, 209: 203})
    assert got == want


def test_star_cc_matches_union_find_on_random_graph(spark):
    import random

    from hhek2sqlite_spark.operators.dedup import star_connected_components

    rng = random.Random(7)
    pairs = [(rng.randrange(60), rng.randrange(60)) for _ in range(80)]
    df = spark.createDataFrame(pairs, "id_a long, id_b long")

    # plain union-find oracle
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    nodes = set()
    for a, b in pairs:
        if a != b:
            nodes.update((a, b))
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
    want = {n: find(n) for n in nodes}
    got = {r.doc_id: r.cluster_id for r in star_connected_components(df).collect()}
    assert got == want


def test_pack_chunks_offsets_and_boundaries(spark):
    from hhek2sqlite_spark.operators.pipeline import pack_chunks

    chunks = spark.createDataFrame(
        [
            (0, 0, 120),  # shard 0
            (0, 1, 100),
            (16, 0, 50),  # doc 16 -> shard 0, after doc 0 in order
            (1, 0, 400),  # shard 1
        ],
        "doc_id long, chunk_idx long, chunk_len long",
    )
    out = {
        (r.doc_id, r.chunk_idx): (r.shard, r.offset_in_shard, r.pack_id)
        for r in pack_chunks(chunks, budget=200, n_shards=16).collect()
    }
    # shard 0 stream: doc0c0 [0,120) pack0; doc0c1 [120,220) pack0 (starts
    # at 120 < 200, straddles the cut); doc16c0 [220,270) pack1
    assert out[(0, 0)] == (0, 0, 0)
    assert out[(0, 1)] == (0, 120, 0)
    assert out[(16, 0)] == (0, 220, 1)
    # shard 1 independent stream
    assert out[(1, 0)] == (1, 0, 0)


def test_repetition_profile_buckets(spark):
    from hhek2sqlite_spark.operators.pipeline import repetition_profile

    docs = spark.createDataFrame(
        [
            (1, "abcdefgh" * 10),      # period-8 text: every 8-gram repeats
            (2, "x"),                   # shorter than n -> empty
            (3, "the quick brown fox jumps over lazy dogs today"),  # all distinct
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: (r.n_shingles, r.n_distinct_shingles, r.rep_bucket)
           for r in repetition_profile(docs, n=8).collect()}
    assert out[1][2] == "repetitive"
    assert out[1][1] == 8  # only 8 distinct 8-grams in a period-8 string
    assert out[2] == (0, 0, "empty")
    assert out[3][2] == "ok"
    assert out[3][0] == out[3][1]  # fully distinct


def test_domain_stats_extracts_hosts(spark):
    from hhek2sqlite_spark.operators.pipeline import domain_stats

    docs = spark.createDataFrame(
        [
            (1, "see https://A.Example.COM/page and http://b.org/x y"),
            (2, "again https://a.example.com/other plus no url here"),
            (3, "nothing"),
        ],
        "doc_id long, text string",
    )
    out = {r.domain: (r.n_mentions, r.n_docs) for r in domain_stats(docs).collect()}
    # normalization lowercases before extraction
    assert out == {"a.example.com": (2, 2), "b.org": (1, 1)}


def test_value_quantiles_match_sorted_positions(spark, sf_dir):
    from hhek2sqlite_spark.plans.extensions import q_value_quantiles

    rows = {r.event_type: r for r in q_value_quantiles(spark, sf_dir).collect()}
    from hhek2sqlite_spark.sources.parquet import load_table

    events = load_table(spark, sf_dir, "events")
    for et, r in rows.items():
        vals = sorted(
            v for (v,) in events.filter(F.col("event_type") == et).select("value").collect()
        )
        n = len(vals)
        assert r.n_events == n
        import math

        for p in (25, 50, 75):
            assert getattr(r, f"p{p}") == vals[math.ceil(n * p / 100.0) - 1], (et, p)


def test_corpus_curation_monotone_and_train_only(spark, sf_dir):
    """Every packed chunk's doc must be a dedup keeper, quality-ok and in
    the train split — the composition preserves each stage's filter."""
    from hhek2sqlite_spark.operators.dedup import exact_dedup_keepers
    from hhek2sqlite_spark.operators.text import document_profile
    from hhek2sqlite_spark.plans.extensions import q_corpus_curation
    from hhek2sqlite_spark.sources.parquet import load_table

    docs = load_table(spark, sf_dir, "documents")
    out_docs = {r.doc_id for r in q_corpus_curation(spark, sf_dir).select("doc_id").distinct().collect()}
    keepers = {r.keeper_id for r in exact_dedup_keepers(docs).collect()}
    ok = {r.doc_id for r in document_profile(docs).filter(F.col("quality") == "ok").collect()}
    train = {
        r.doc_id
        for r in pipeline.dataset_split(docs).filter(F.col("split") == "train").collect()
    }
    assert out_docs
    assert out_docs <= keepers
    assert out_docs <= ok
    assert out_docs <= train


def test_incremental_dedup_semantics(spark):
    """Batch-internal keep-first + anti-join against the history store:
    a doc already in the store is dropped even if unique in the batch;
    batch-internal copies keep only the lowest id; fresh docs survive."""
    from hhek2sqlite_spark.operators.dedup import fingerprint_store, incremental_dedup

    schema = "doc_id long, text string, lang string, source string, n_chars long"
    corpus = spark.createDataFrame(
        [(100, "already ingested", "en", "s", 16)], schema
    )
    batch = spark.createDataFrame(
        [
            (1, "already   INGESTED", "en", "s", 18),  # dup of history (normalized)
            (2, "fresh document", "en", "s", 14),
            (3, "fresh document", "en", "s", 14),      # batch-internal copy of 2
            (4, "another fresh one", "en", "s", 17),
        ],
        schema,
    )
    got = sorted(
        r.doc_id
        for r in incremental_dedup(batch, fingerprint_store(corpus)).collect()
    )
    assert got == [2, 4]
    # broadcast variant identical
    got_b = sorted(
        r.doc_id
        for r in incremental_dedup(
            batch, fingerprint_store(corpus), broadcast_seen=True
        ).collect()
    )
    assert got_b == [2, 4]
