"""Property tests for hash-sketch operators that cannot be
DuckDB-oracle-checked (MinHash-LSH, SimHash, hyperplane LSH): recall /
containment / determinism properties instead of value equality."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from datafusion_wasm_bindings_spark.operators import dedup, similarity
from datafusion_wasm_bindings_spark.sources.catalog import table


@pytest.fixture(scope="module")
def documents(spark, sf_dir):
    return table(spark, sf_dir, "documents")


@pytest.fixture(scope="module")
def embeddings(spark, sf_dir):
    return table(spark, sf_dir, "embeddings")


def test_minhash_pairs_are_verified_true_positives(documents):
    """Every emitted pair carries its exact shingle Jaccard ≥ threshold
    (LSH only generates candidates; the verify step makes output exact
    w.r.t. precision — recall is the probabilistic part)."""
    pairs = dedup.minhash_lsh_pairs(
        documents, bands=8, rows_per_band=2, jaccard_threshold=0.5
    ).collect()
    for row in pairs:
        assert row.jaccard >= 0.5
        assert row.id_a < row.id_b


def test_minhash_finds_the_obvious_near_dups(documents):
    """The fixture contains docs with shingle-Jaccard ≥ 0.9 (measured in
    survey probing); 8 bands × 2 rows collides such pairs with
    probability 1-(1-J²)⁸ ≈ 1 — they must be found."""
    high = dedup.minhash_lsh_pairs(
        documents, bands=8, rows_per_band=2, jaccard_threshold=0.9
    )
    assert high.count() > 0


def test_minhash_signatures_deterministic(documents):
    s1 = dedup.minhash_signatures(documents.limit(50)).collect()
    s2 = dedup.minhash_signatures(documents.limit(50)).collect()
    assert sorted(map(tuple, s1)) == sorted(map(tuple, s2))


def test_simhash_close_docs_have_close_hashes(documents, spark):
    """SimHash property: near-identical token MULTISETS → small hamming.

    r01 lesson: set-Jaccard 1.0 (ngram_jaccard_pairs compares distinct
    token sets) does NOT bound simhash distance — simhash votes once
    per occurrence, so two docs with identical token sets but different
    frequencies can differ in many bits. The guaranteed properties are:
    (a) token-order permutation leaves the multiset — and the vote sums
        — unchanged: identical simhash, exactly;
    (b) appending one token shifts every bit's vote by ±1: only
        near-tie bits can flip, so a long doc stays hamming-close.
    """
    import random

    base = (
        documents.filter(F.size(dedup.tokens()) >= 50)
        .select("text")
        .first()
    )
    if base is None:
        pytest.skip("no >=50-token doc at this sf")
    toks = base.text.lower().split()
    rng = random.Random(7)
    shuffled = toks[:]
    rng.shuffle(shuffled)
    trio = spark.createDataFrame(
        [
            (0, base.text),
            (1, " ".join(shuffled)),          # same multiset, new order
            (2, base.text + " zzznovelword"),  # multiset + 1
        ],
        "doc_id long, text string",
    )
    sims = {r.doc_id: r.simhash for r in dedup.simhash(trio).collect()}
    # (a) exact invariance under permutation — modulo tokenization: the
    # whitespace re-join can merge/split punctuation-adjacent tokens,
    # so compare doc 1 against a simhash of its own token multiset
    # rather than doc 0 when the tokenizations differ
    resplit = spark.createDataFrame([(0, " ".join(toks))], "doc_id long, text string")
    sim_resplit = dedup.simhash(resplit).collect()[0].simhash
    assert sims[1] == sim_resplit, "permutation changed the simhash"
    # (b) one extra token: only near-tie bits flip
    hamming = bin(sims[0] ^ sims[2]).count("1")
    assert hamming <= 10, f"hamming {hamming} after single-token append"


def test_lsh_topk_subset_of_bruteforce_pool(embeddings):
    """Every LSH hit must be a genuine corpus vector with the exact
    cosine the brute-force path computes (floats, so compare loosely),
    and recall@3 over the 5 fixture queries should be non-trivial."""
    brute = {
        (r.query_id, r.cand_id): r.rank
        for r in similarity.cosine_topk_bruteforce(
            embeddings, query_ids=[1, 2, 3, 4, 5], k=3
        ).collect()
    }
    lsh = similarity.lsh_bucketed_topk(
        embeddings, query_ids=[1, 2, 3, 4, 5], k=3, planes=4, tables=8
    ).collect()
    assert len(lsh) > 0
    overlap = sum(1 for r in lsh if (r.query_id, r.cand_id) in brute)
    # 8 tables × 4 planes: measured recall@3 ≥ 1/3 per query on every
    # fixture SF (the q_sim_lsh_topk oracle asserts the per-query bound)
    assert overlap >= 5


def test_exact_dedup_keeps_every_distinct_text(documents):
    n_docs = documents.count()
    n_distinct = documents.select("text").distinct().count()
    out = dedup.exact_dedup(documents)
    assert out.count() == n_distinct
    total = out.agg(F.sum("n_copies")).first()[0]
    assert total == n_docs


def test_ivf_topk_recall_against_bruteforce(embeddings):
    """IVF with n_probe=2 of 8 cells must find most of the true top-3:
    scores must match brute-force exactly for shared pairs (same
    arithmetic), and recall@3 over 5 queries should beat random
    cell-picking by a wide margin."""
    brute = {
        (r.query_id, r.cand_id): r.rank
        for r in similarity.cosine_topk_bruteforce(
            embeddings, query_ids=[1, 2, 3, 4, 5], k=3
        ).collect()
    }
    ivf = similarity.ivf_topk(
        embeddings, query_ids=[1, 2, 3, 4, 5], k=3, n_centroids=8, n_probe=2
    ).collect()
    assert len(ivf) == 15  # k rows per query — probed cells hold >= k
    overlap = sum(1 for r in ivf if (r.query_id, r.cand_id) in brute)
    # probing 2/8 data-adapted cells: expect well over half the true
    # neighbors (random cells would give ~25%)
    assert overlap >= 8, f"recall {overlap}/15 too low"


def test_stratified_sample_respects_fractions(documents):
    from pyspark.sql import functions as F

    from datafusion_wasm_bindings_spark.operators import sampling

    fractions = {"en": 0.5, "de": 1.0, "fr": 0.0}
    s = sampling.stratified_sample(documents, "lang", fractions, seed=7)
    got = {r.lang: r.n for r in s.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    tot = {r.lang: r.n for r in documents.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert got.get("de", 0) == tot["de"]          # fraction 1.0 keeps all
    assert got.get("fr", 0) == 0                  # fraction 0.0 drops all
    assert set(got) <= set(fractions)             # unlisted strata dropped
    assert 0 < got.get("en", 0) < tot["en"]       # Bernoulli strictly between


def test_hash_sample_is_deterministic_and_splits_disjoint(documents):
    from datafusion_wasm_bindings_spark.operators import sampling

    a = {r.doc_id for r in sampling.hash_sample(documents, "doc_id", 0.3).collect()}
    b = {r.doc_id for r in sampling.hash_sample(documents, "doc_id", 0.3).collect()}
    assert a == b and len(a) > 0  # reproducible
    n = documents.count()
    assert 0.15 * n < len(a) < 0.45 * n  # near the rate
    # complementary band = the rest: rate 1.0 minus the first band
    rest = {
        r.doc_id
        for r in sampling.hash_sample(documents, "doc_id", 1.0).collect()
    } - a
    assert rest.isdisjoint(a) and len(rest) + len(a) == n


def test_connected_components_resolves_known_graph(spark):
    from datafusion_wasm_bindings_spark.operators.dedup import connected_components

    # two chains (1-2-3, transitively one cluster) and one clique edge
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (20, 21), (21, 20)],
        "id_a long, id_b long",
    )
    got = {r.node: r.comp for r in connected_components(pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 20: 20, 21: 20}


def _cc_truth(edges):
    """Union-find ground truth: node → min node id of its component."""
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    members = {}
    for n in list(parent):
        members.setdefault(find(n), []).append(n)
    return {n: min(ns) for ns in members.values() for n in ns}


def test_star_cc_matches_union_find_on_adversarial_graphs(spark):
    import random

    from datafusion_wasm_bindings_spark.operators.dedup import connected_components_star

    random.seed(7)
    rand = [(random.randrange(80), random.randrange(80)) for _ in range(60)]
    graphs = {
        # diameter 120 — far beyond label propagation's round budget,
        # the case the O(log n) star alternation exists for
        "long_chain": [(i, i + 1) for i in range(120)],
        "cliques_bridged": [(a, b) for a in range(5) for b in range(a + 1, 5)]
        + [(a, b) for a in range(50, 55) for b in range(a + 1, 55)]
        + [(4, 50)],
        "random": [(a, b) for a, b in rand if a != b],
        "already_star": [(i, 0) for i in range(1, 15)],
    }
    for name, edges in graphs.items():
        df = spark.createDataFrame(edges, "id_a long, id_b long")
        got = {r.node: r.comp for r in connected_components_star(df).collect()}
        assert got == _cc_truth(edges), name


def test_label_propagation_raises_rather_than_returning_unconverged(spark):
    import pytest

    from datafusion_wasm_bindings_spark.operators.dedup import connected_components

    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(12)], "id_a long, id_b long"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(chain, max_iters=3)


def test_resize_media_decimates_and_composes_downstream(documents):
    from datafusion_wasm_bindings_spark.operators.multimodal import (
        extract_features,
        frame_sample,
        resize_media,
        synthesize_media,
    )

    media = synthesize_media(documents.limit(50))
    resized = resize_media(media, 4)
    orig = {r.doc_id: r.n for r in media.select("doc_id", F.length("media").alias("n")).collect()}
    new = {r.doc_id: r.n for r in resized.select("doc_id", F.length("media").alias("n")).collect()}
    assert set(orig) == set(new)
    for d, n in orig.items():
        assert new[d] == -(-n // 4), d  # ceil(n/4): payload[::4]
    # the resized binary keeps flowing: feature extraction and frame
    # sampling run on it unchanged
    assert extract_features(resized).count() == 50
    assert frame_sample(resized).count() >= 50


def test_pack_sequences_concat_and_chunk_semantics(spark):
    # Hand-computed concat-and-chunk: budget 5, shards by doc_id parity.
    # shard0 docs (id: tokens) 0:3 2:2 4:1 -> seqs [(0,2 docs,5 tok,0
    # split), (1,1,1,0)]; shard1 1:4 3:5 5:6 -> doc3 starts at offset 4
    # and crosses the cut at 5, doc5 starts at 9 and crosses 10.
    from datafusion_wasm_bindings_spark.operators.packing import pack_sequences

    df = spark.createDataFrame(
        [(i, "w " * c) for i, c in enumerate([3, 4, 2, 5, 1, 6])],
        "doc_id long, text string",
    )
    rows = [tuple(r) for r in pack_sequences(df, budget=5, n_shards=2).collect()]
    assert rows == [
        (0, 0, 2, 5, 0),
        (0, 1, 1, 1, 0),
        (1, 0, 2, 9, 1),
        (1, 1, 1, 6, 1),
    ], rows


# --- decontamination / PII / deterministic shuffle -----------------------


def test_decontaminate_flags_copies_not_disjoint(spark):
    from datafusion_wasm_bindings_spark.operators.text import decontaminate

    evals = spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog")],
        "doc_id long, text string",
    )
    train = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),  # exact copy
            (2, "a quick brown fox leaps over hedges"),  # partial overlap
            (3, "completely unrelated words entirely"),  # disjoint
        ],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in decontaminate(train, evals, n=3).collect()}
    assert rows[1].contaminated and rows[1].contaminated_frac == 1.0
    assert rows[2].contaminated  # shares 'quick brown fox'
    assert 0 < rows[2].contaminated_frac < 1
    assert not rows[3].contaminated and rows[3].n_hits == 0


def test_redact_pii_scrubs_and_counts(spark):
    from datafusion_wasm_bindings_spark.operators.text import redact_pii

    df = spark.createDataFrame(
        [
            (1, "mail a.b+c@sub.example.org now"),
            (2, "call +1 (555) 010-7788 or 555 010 9999"),
            (3, "server 192.168.4.1 is up"),
            (4, "nothing sensitive here"),
        ],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in redact_pii(df).collect()}
    assert rows[1].n_email == 1 and "[EMAIL]" in rows[1].redacted
    assert "@" not in rows[1].redacted
    assert rows[2].n_phone == 2 and rows[2].redacted.count("[PHONE]") == 2
    assert rows[3].n_ipv4 == 1 and "[IP]" in rows[3].redacted
    assert rows[4].redacted == "nothing sensitive here"
    assert rows[4].n_email == rows[4].n_phone == rows[4].n_ipv4 == 0


def test_deterministic_shuffle_is_a_permutation_and_stable(documents):
    from datafusion_wasm_bindings_spark.operators.sampling import (
        deterministic_shuffle,
    )

    n = documents.count()
    out = deterministic_shuffle(documents, "doc_id", n_shards=8)
    rows = out.collect()
    assert len(rows) == n
    assert len({r.doc_id for r in rows}) == n
    # positions are dense 0..k-1 within every shard
    by_shard: dict[int, list[int]] = {}
    for r in rows:
        by_shard.setdefault(r.shard, []).append(r.pos)
    for shard, ps in by_shard.items():
        assert sorted(ps) == list(range(len(ps))), f"shard {shard} not dense"
    # content-addressed: identical layout regardless of input partitioning
    again = deterministic_shuffle(documents.repartition(13), "doc_id", n_shards=8)
    assert {(r.doc_id, r.shard, r.pos) for r in again.collect()} == {
        (r.doc_id, r.shard, r.pos) for r in rows
    }


def test_chunk_documents_covers_every_token_with_overlap(documents):
    from datafusion_wasm_bindings_spark.operators.packing import chunk_documents

    chunks = chunk_documents(documents, chunk_tokens=64, stride=48).collect()
    by_doc: dict[int, list] = {}
    for r in chunks:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert len(by_doc) == documents.count()  # every doc chunked
    for doc_id, rows in by_doc.items():
        rows.sort(key=lambda r: r.chunk_id)
        n = rows[0].n_tokens
        # dense chunk ids, stride-spaced starts
        assert [r.chunk_id for r in rows] == list(range(len(rows)))
        assert all(r.start_tok == r.chunk_id * 48 for r in rows)
        # full coverage: last window reaches the end, and every window
        # overlaps the previous by chunk-stride tokens
        assert rows[-1].start_tok + rows[-1].n_chunk_tokens == n
        if len(rows) > 1:
            assert all(r.n_chunk_tokens == 64 for r in rows[:-1])
            assert rows[-2].start_tok + 64 > rows[-1].start_tok  # overlap
        # chunk text token count matches the claim
        for r in rows[:3]:
            got = len(r.chunk_text.split()) if r.chunk_text else 0
            assert got == r.n_chunk_tokens, (doc_id, r.chunk_id)


def test_token_counts_empty_text_edge(spark):
    """Empty and whitespace-only docs have ZERO whitespace tokens —
    Spark's split('') -> [''] quirk must not count one (operators/text.py
    filter; the DuckDB oracle applies list_filter(..., <> '') the same
    way)."""
    from datafusion_wasm_bindings_spark.operators.text import token_counts

    docs = spark.createDataFrame(
        [(1, "", 0), (2, "   ", 3), (3, "two words", 9)],
        "doc_id long, text string, n_chars long",
    )
    got = {r.doc_id: r.ws_tokens for r in token_counts(docs).collect()}
    assert got == {1: 0, 2: 0, 3: 2}


def test_asof_join_known_values(spark):
    """Hand-checkable as-of: each left row picks the latest right row
    with ts <= its own, per key; no match -> nulls."""
    from datafusion_wasm_bindings_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [(1, 10, "a"), (1, 20, "b"), (1, 7, "z"), (2, 5, "c")],
        "k long, ts long, payload string",
    )
    right = spark.createDataFrame(
        [(1, 8, 100.0), (1, 15, 200.0), (1, 20, 250.0), (2, 99, 300.0)],
        "k long, ts long, w double",
    )
    got = {
        (r.k, r.ts): (r.ref_ts, r.ref_w)
        for r in asof_join(left, right, on=["k"], ts="ts").collect()
    }
    assert got == {
        (1, 7): (None, None),       # nothing at or before 7
        (1, 10): (8, 100.0),
        (1, 20): (20, 250.0),       # equal timestamp matches (<=)
        (2, 5): (None, None),       # right row is in the future
    }


def test_temperature_sample_flattens_distribution(documents, spark):
    """alpha=0.5: the smallest source keeps everything (rate 1.0);
    larger sources keep ~ (n/n_min)^-0.5 of their rows; the kept mix is
    flatter than the natural one."""
    from pyspark.sql import functions as F

    from datafusion_wasm_bindings_spark.operators.sampling import temperature_sample

    natural = {r.source: r.n for r in documents.groupBy("source").agg(F.count("*").alias("n")).collect()}
    kept = temperature_sample(documents, "doc_id", "source", alpha=0.5)
    got = {r.source: r.n for r in kept.groupBy("source").agg(F.count("*").alias("n")).collect()}
    smallest = min(natural, key=natural.get)
    assert got[smallest] == natural[smallest]  # rate 1.0 keeps all
    import math
    for s, n in natural.items():
        expect = n * (n / natural[smallest]) ** -0.5
        assert abs(got.get(s, 0) - expect) <= 4 * math.sqrt(expect) + 2, (s, got.get(s), expect)


def test_profile_columns_approx_mode_tracks_exact(spark, sf_dir):
    """The 100 TB profile path (approx_count_distinct, no Expand) must
    stay within the HLL error envelope of the exact profile and plan
    WITHOUT the Expand the multi-distinct rewrite inserts."""
    from datafusion_wasm_bindings_spark.operators.profiling import profile_columns
    from datafusion_wasm_bindings_spark.sources.catalog import table as t

    li = t(spark, sf_dir, "lineitem")
    cols = ["l_quantity", "l_extendedprice", "l_discount"]
    exact = {r.column_name: r.n_distinct for r in profile_columns(li, cols).collect()}
    approx_df = profile_columns(li, cols, exact_distinct=False)
    plan = approx_df._jdf.queryExecution().executedPlan().toString()
    assert "Expand" not in plan, plan
    approx = {r.column_name: r.n_distinct for r in approx_df.collect()}
    for c in cols:
        assert abs(approx[c] - exact[c]) <= 0.1 * exact[c] + 2, (c, approx[c], exact[c])


def test_interval_join_known_values(spark):
    """Hand-checkable range join incl. bucket-boundary cases: an
    interval spanning two buckets must match events in both, and
    inclusive endpoints must match exactly."""
    from datetime import datetime as dt

    from datafusion_wasm_bindings_spark.operators.rangejoin import interval_join

    ev = spark.createDataFrame(
        [
            (1, 1, dt(2024, 1, 1, 10, 0)),
            (2, 1, dt(2024, 1, 1, 10, 29)),
            (3, 1, dt(2024, 1, 1, 10, 31)),   # second bucket of the interval
            (4, 1, dt(2024, 1, 1, 10, 45)),   # == end, inclusive
            (5, 1, dt(2024, 1, 1, 10, 46)),   # past end
            (6, 2, dt(2024, 1, 1, 10, 10)),   # right key, other user's window
        ],
        "event_id long, user_id long, ts timestamp",
    )
    iv = spark.createDataFrame(
        [(1, dt(2024, 1, 1, 10, 15), dt(2024, 1, 1, 10, 45))],
        "user_id long, start timestamp, end timestamp",
    )
    got = sorted(
        r.event_id
        for r in interval_join(ev, iv, on=["user_id"], bucket_seconds=1800).collect()
    )
    assert got == [2, 3, 4]


def test_quantile_bin_equal_frequency_and_approx_mode(spark, sf_dir):
    """Deciles of a continuous column: exact mode yields ~equal bucket
    populations; approx mode (the mergeable-sketch 100 TB path) stays
    within the sketch's rank-error of exact."""
    from pyspark.sql import functions as F

    from datafusion_wasm_bindings_spark.operators.features import quantile_bin
    from datafusion_wasm_bindings_spark.sources.catalog import table as t

    orders = t(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    n = orders.count()
    exact = quantile_bin(orders, "o_totalprice", n_bins=10)
    sizes = {r.bin: r.n for r in exact.groupBy("bin").agg(F.count("*").alias("n")).collect()}
    assert set(sizes) == set(range(10))
    for b, s in sizes.items():
        assert abs(s - n / 10) <= n * 0.02 + 2, (b, s, n)  # ties only
    approx = quantile_bin(orders, "o_totalprice", n_bins=10, exact=False)
    asizes = {r.bin: r.n for r in approx.groupBy("bin").agg(F.count("*").alias("n")).collect()}
    for b in range(10):
        assert abs(asizes.get(b, 0) - sizes[b]) <= n * 0.05 + 2, (b, asizes.get(b), sizes[b])


def test_asof_join_null_payload_and_null_keys(spark):
    """Two review-found edges: (a) a NULL payload value in the matched
    right row must surface as NULL — not resurrect the previous row's
    value (the fill is per-row-atomic via a struct); (b) NULL join keys
    never match (join equality), even though a window partition would
    group them."""
    from datafusion_wasm_bindings_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [(1, 25), (None, 10)], "k long, ts long"
    )
    right = spark.createDataFrame(
        [(1, 10, 5.0), (1, 20, None), (None, 5, 9.0)],
        "k long, ts long, w double",
    )
    rows = {r.k: r for r in asof_join(left, right, on=["k"], ts="ts").collect()}
    # (a) matched row is (ts=20, w=NULL): w must be NULL, not 5.0
    assert rows[1].ref_ts == 20 and rows[1].ref_w is None
    # (b) NULL-keyed left row matches nothing
    assert rows[None].ref_ts is None and rows[None].ref_w is None


def test_paragraph_dedup_drops_repeats_keeps_first(spark):
    """Boilerplate sentence shared by two docs survives only in the
    lower (doc_id, pos); a doc made entirely of seen paragraphs comes
    back empty, not missing."""
    from datafusion_wasm_bindings_spark.operators.dedup import paragraph_dedup

    # no trailing periods: the split regex `\.\s+` needs whitespace
    # after the dot, so a document-final "footer." would be a DISTINCT
    # paragraph from a mid-document "footer" (both engines agree)
    docs = spark.createDataFrame(
        [
            (1, "unique one. shared footer. tail one"),
            (2, "shared footer. unique two"),
            (3, "shared footer"),
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in paragraph_dedup(docs).collect()}
    assert got[1].text == "unique one. shared footer. tail one"
    assert got[1].n_dropped == 0
    assert got[2].text == "unique two" and got[2].n_dropped == 1
    assert got[3].text == "" and got[3].n_kept == 0 and got[3].n_dropped == 1


def test_group_split_is_group_coherent_and_complete(documents, spark):
    """Every row of a source lands in exactly one split (the leakage
    guarantee), the three splits partition the corpus, and rough
    proportions follow the fractions at GROUP granularity."""
    from datafusion_wasm_bindings_spark.operators.sampling import group_split

    out = group_split(
        documents, "source", fractions={"train": 0.8, "val": 0.1, "test": 0.1}
    )
    per_source = out.groupBy("source").agg(
        F.countDistinct("split").alias("n_splits")
    )
    assert per_source.filter("n_splits <> 1").count() == 0
    assert out.count() == documents.count()
    assert set(r.split for r in out.select("split").distinct().collect()) <= {
        "train",
        "val",
        "test",
    }


def test_group_split_rejects_bad_fractions(spark):
    import pytest as _pytest

    from datafusion_wasm_bindings_spark.operators.sampling import group_split

    df = spark.range(1).withColumnRenamed("id", "g")
    with _pytest.raises(ValueError):
        group_split(df, "g", fractions={"a": 0.5, "b": 0.2})


def test_epoch_upsample_replicates_by_quality(documents, spark):
    """Row count equals Σ n_epochs; epochs enumerate 1..n_epochs per
    doc; buckets follow the rounded quality score exactly."""
    from datafusion_wasm_bindings_spark.operators.sampling import epoch_upsample
    from datafusion_wasm_bindings_spark.operators.text import quality_scores

    out = epoch_upsample(documents, cuts=((0.8, 3), (0.6, 2)))
    q = {r.doc_id: r.quality for r in quality_scores(documents).collect()}
    rows = out.collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert len(by_doc) == documents.count()
    for doc_id, doc_rows in by_doc.items():
        expect = 3 if q[doc_id] >= 0.8 else 2 if q[doc_id] >= 0.6 else 1
        assert all(r.n_epochs == expect for r in doc_rows), (doc_id, doc_rows)
        assert sorted(r.epoch for r in doc_rows) == list(range(1, expect + 1))


def test_bpe_pretokenize_known_values(spark):
    """Hand-checked pre-token classes: contractions split from words,
    digit runs separate, whitespace runs excluded from the count."""
    from datafusion_wasm_bindings_spark.operators.sampling import (  # noqa: F401
        group_split,
    )
    from datafusion_wasm_bindings_spark.operators.text import bpe_pretokenize_counts

    docs = spark.createDataFrame(
        [
            # 'don' + "'t" + ' stop' + ' me' + ' now' → 5 (1 contraction)
            (1, "don't stop me now"),
            # 'In' ' 2024' ',' ' 3' ' cats' '!!' → 6: 2 num, 2 word, 2 punct
            (2, "In 2024, 3 cats!!"),
            (3, ""),
            # pure whitespace → 0 tokens
            (4, "   \t  "),
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in bpe_pretokenize_counts(docs).collect()}
    assert got[1].n_bpe_tokens == 5 and got[1].n_contractions == 1
    assert got[1].n_word_tokens == 4 and got[1].n_punct_tokens == 0
    assert got[2].n_bpe_tokens == 6 and got[2].n_num_tokens == 2
    assert got[2].n_word_tokens == 2 and got[2].n_punct_tokens == 2
    assert got[3].n_bpe_tokens == 0
    assert got[4].n_bpe_tokens == 0


def test_tfidf_keywords_known_values(spark):
    """Rare term outranks common term at equal tf; rank ties break on
    token; df/tf counts are exact."""
    import math

    from datafusion_wasm_bindings_spark.operators.text import tfidf_keywords

    docs = spark.createDataFrame(
        [
            (1, "apple banana apple"),
            (2, "banana cherry"),
            (3, "banana banana durian"),
        ],
        "doc_id long, text string",
    )
    out = {(r.doc_id, r.tok): r for r in tfidf_keywords(docs, k=3).collect()}
    # doc 1: apple tf=2 df=1 beats banana tf=1 df=3
    assert out[(1, "apple")].rank == 1 and out[(1, "banana")].rank == 2
    assert out[(1, "apple")].tf == 2 and out[(1, "apple")].df == 1
    expected = round(2 * (math.log(4 / 2) + 1), 6)
    assert abs(out[(1, "apple")].score - expected) < 1e-9
    # doc 3: banana tf=2 but df=3; durian tf=1 df=1 → banana 2*(ln(1)+1)=2
    # vs durian 1*(ln(2)+1)≈1.69 → banana still first on tf weight
    assert out[(3, "banana")].rank == 1 and out[(3, "durian")].rank == 2


def test_apply_changelog_known_values(spark):
    """Latest version wins per key; delete tombstones drop the key;
    unseen keys insert; base survives untouched keys."""
    from datafusion_wasm_bindings_spark.operators.cdc import apply_changelog

    base = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)],
        "k long, s string, v double",
    )
    changes = spark.createDataFrame(
        [
            (2, "b2", 21.0, 1, "U"),   # update key 2
            (2, "b3", 22.0, 2, "U"),   # later update wins
            (3, "c", 30.0, 1, "D"),    # delete key 3
            (4, "d", 40.0, 1, "U"),    # insert new key 4
            (5, "e", 50.0, 1, "U"),    # insert then delete -> absent
            (5, "e", 50.0, 2, "D"),
        ],
        "k long, s string, v double, version long, op string",
    )
    got = {r.k: r for r in apply_changelog(base, changes, ["k"]).collect()}
    assert set(got) == {1, 2, 4}
    assert got[1].s == "a" and got[1].v == 10.0
    assert got[2].s == "b3" and got[2].v == 22.0
    assert got[4].s == "d" and got[4].v == 40.0


def test_kmeans_clusters_known_values(spark):
    """Two well-separated groups with seeds spanning both: every vector
    lands with its group's seed; sizes and representatives are exact."""
    from datafusion_wasm_bindings_spark.operators.clustering import kmeans_clusters

    rows = [
        (1, [1.0, 0.0]),   # seed cluster 0
        (2, [0.0, 1.0]),   # seed cluster 1
        (3, [0.9, 0.1]),
        (4, [0.1, 0.9]),
        (5, [0.8, 0.0]),
        (6, [0.0, 0.8]),
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = {r.cluster_id: r for r in kmeans_clusters(emb, k=2, iters=2).collect()}
    assert set(got) == {0, 1}
    assert got[0].n_vecs == 3 and got[0].min_vec == 1
    assert got[1].n_vecs == 3 and got[1].min_vec == 2
    assert got[0].mean_inertia >= 0 and got[1].mean_inertia >= 0


def test_ann_index_builds_tolerate_null_embeddings(spark):
    """Regression (r8 review): the rewritten sample-trained ivf_index /
    pq_index must keep the old builds' NULL-embedding tolerance — a
    NULL-v row among the lowest vec_ids previously seeded a driver
    TypeError, and an encoded NULL row ranked FIRST downstream via
    NULL scores under ASC NULLS FIRST. NULL embeddings are out of the
    index population (same contract the explode-based shapes enforced
    implicitly)."""
    from datafusion_wasm_bindings_spark.operators.similarity import (
        ivf_index,
        pq_index,
    )

    rows = [
        (0, None),  # NULL among the seed ids — the TypeError shape
        (1, [1.0, 0.0, 0.0, 0.0]),
        (2, [0.0, 1.0, 0.0, 0.0]),
        (3, None),
        (4, [0.9, 0.1, 0.0, 0.0]),
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    assignments, centroids = ivf_index(emb, n_centroids=2, lloyd_iters=1)
    got = {r.vec_id for r in assignments.collect()}
    assert got == {1, 2, 4}  # NULL-v rows are not indexed
    assert centroids.count() >= 1

    codes, cb, sub_len = pq_index(emb, m_subspaces=2, n_codes=2, lloyd_iters=1)
    coded = {r.vec_id for r in codes.collect()}
    assert coded == {1, 2, 4}
    assert sub_len == 2

    # all-NULL corpus behaves like the empty corpus (typed empties)
    all_null = spark.createDataFrame(
        [(0, None), (1, None)], "vec_id long, embedding array<float>"
    )
    codes, cb, sub_len = pq_index(all_null, m_subspaces=2, n_codes=2)
    assert codes.count() == 0 and cb.count() == 0 and sub_len == 0
    assignments, centroids = ivf_index(all_null, n_centroids=2)
    assert assignments.count() == 0 and centroids.count() == 0


def test_ann_index_builds_tolerate_null_elements(spark):
    """Regression (ADVICE r8): a NULL ELEMENT inside a non-NULL
    embedding array passed the old whole-NULL population filter and
    raised a driver TypeError (float(None)) when the row landed in the
    collected seed set. Element-null vectors are now out of the index
    population alongside whole-NULL embeddings — they have no defined
    distance to anything."""
    from datafusion_wasm_bindings_spark.operators.similarity import (
        ivf_index,
        pq_index,
    )

    rows = [
        (0, [1.0, None, 0.0, 0.0]),  # seed-position element-NULL
        (1, [1.0, 0.0, 0.0, 0.0]),
        (2, [0.0, 1.0, 0.0, 0.0]),
        (3, [0.9, None, 0.0, None]),
        (4, [0.9, 0.1, 0.0, 0.0]),
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    assignments, _ = ivf_index(emb, n_centroids=2, lloyd_iters=1)
    assert {r.vec_id for r in assignments.collect()} == {1, 2, 4}

    codes, _, sub_len = pq_index(emb, m_subspaces=2, n_codes=2, lloyd_iters=1)
    assert {r.vec_id for r in codes.collect()} == {1, 2, 4}
    assert sub_len == 2


def test_kmeans_centroid_ss_past_int64(spark):
    """Regression (r8 semdedup_xl probe, measured live): a cluster's
    Σsi² exceeded int64 at 2M vectors (ss = 1.22e19 > 2^63−1) and
    py4j refused the long literal. `_assign` now ships ss and n² as
    DOUBLE literals (nearest-double of the exact int — bit-identical
    to the oracle's CAST(HUGEINT AS DOUBLE)); this census drives it
    with a synthetic centroid whose ss is deliberately past 2^63 and
    asserts assignment still evaluates and picks the nearer centroid.
    kmeans_quality's driver-side pair matrix (the int64 zip-fold dot
    had the same bound) is exercised through the same fit."""
    from datafusion_wasm_bindings_spark.operators.clustering import (
        _assign,
        kmeans_quality,
    )
    from pyspark.sql import functions as F

    v = spark.createDataFrame(
        [(1, [1000, 0]), (2, [4000, 0])], "vec_id long, x array<long>"
    ).withColumn(
        "ssx",
        F.aggregate(
            F.transform("x", lambda t: t * t),
            F.lit(0).cast("long"),
            lambda acc, t: acc + t,
        ),
    )
    # centroid 1: per-dim SUM 4e9 over n=1e6 members (mean 4000) →
    # ss = 1.6e19 > 2^63−1 ≈ 9.2e18; the x·s dot stays exact int64
    # (1000·4e9 = 4e12), matching the real failure's shape (large n,
    # bounded x)
    cents = [(0, [1000, 0], 1), (1, [4_000_000_000, 0], 1_000_000)]
    got = {r.vec_id: r.cid for r in _assign(v, cents).collect()}
    assert got == {1: 0, 2: 1}

    # the quality path's k² pair matrix: driver-side Python ints are
    # arbitrary-precision, so the same huge-sum state that ANSI-aborted
    # the old int64 zip-fold dot (si·sj = 1.6e19) now just works — the
    # distance of two coincident-mean clusters is 0 → NaN-free positive
    # mdist for distinct means
    import math

    s_a, n_a = [4_000_000_000, 0], 1_000_000
    s_b, n_b = [1000, 0], 1
    dot = sum(x * y for x, y in zip(s_a, s_b))
    assert dot == 4_000_000_000_000  # exact, no overflow driver-side
    m2 = (
        float(sum(x * x for x in s_a)) / float(n_a * n_a)
        + float(sum(x * x for x in s_b)) / float(n_b * n_b)
        - 2.0 * float(dot) / float(n_a * n_b)
    )
    assert math.sqrt(m2) == 3000.0  # |4000 − 1000| on dim 0, exact

    # end-to-end sanity at benign scale: the rewritten pair-matrix path
    # still yields the full DB report (oracle parity is pinned by the
    # q_cluster_quality driver sim)
    emb = spark.createDataFrame(
        [(1, [0.0, 1.0]), (2, [1.0, 0.0]), (3, [0.9, 0.1]), (4, [0.1, 0.9])],
        "vec_id long, embedding array<float>",
    )
    rows = kmeans_quality(emb, k=2, iters=1).collect()
    assert {r.cluster_id for r in rows} == {0, 1}
    for r in rows:
        assert r.db_index >= 0 and r.r_i > 0


def test_zorder_key_interleaves_bits(spark):
    """z(0b11, 0b00)=0b1010, z(0b00, 0b11)=0b0101, z(max,max)=all ones;
    bucket ranges partition both dimensions into bounded tiles."""
    from datafusion_wasm_bindings_spark.operators.scale import (
        zorder_bucket_stats,
        zorder_key,
    )
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(3, 0), (0, 3), (255, 255)], "x long, y long")
    got = [r.z for r in df.select(zorder_key(F.col("x"), F.col("y")).alias("z")).collect()]
    assert got == [0b1010, 0b0101, (1 << 16) - 1]

    # a 16x16 grid split into 16 z-buckets → every bucket is a 4x4 tile:
    # both dimension spans are 3, not 15 (the locality a plain sort on x
    # cannot give y)
    grid = spark.createDataFrame(
        [(i, j) for i in range(16) for j in range(16)], "x long, y long"
    )
    stats = zorder_bucket_stats(grid, "x", "y", bits=4, bucket_bits=4).collect()
    assert len(stats) == 16
    for r in stats:
        assert r.n_rows == 16
        assert r.x_max - r.x_min == 3 and r.y_max - r.y_min == 3


def test_sharded_hll_distinct_exact_and_bounds(spark):
    """Per-shard exact counts sum to the true global distinct (keys are
    hash-partitioned), and the merged-sketch estimate lands in bounds."""
    from datafusion_wasm_bindings_spark.operators.profiling import (
        sharded_hll_distinct,
    )

    df = spark.createDataFrame([(i % 137,) for i in range(1000)], "k long")
    row = sharded_hll_distinct(df, "k", n_shards=4).collect()[0]
    assert row.n_distinct == 137
    assert row.n_shards == 4
    assert bool(row.hll_within_5pct)


def test_hashed_classifier_score_properties(spark):
    """Same token multiset → same score regardless of order; empty text
    scores 0/keep=False; score bounded to [-1, 1)."""
    from datafusion_wasm_bindings_spark.operators.text import hashed_classifier_score

    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma"),
            (2, "gamma beta alpha"),
            (3, ""),
            (4, "alpha alpha alpha"),
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in hashed_classifier_score(docs).collect()}
    assert got[1].score == got[2].score and got[1].keep == got[2].keep
    assert got[3].n_tokens == 0 and got[3].score == 0.0 and got[3].keep is False
    for r in got.values():
        assert -1.0 <= r.score < 1.0


def test_key_skew_profile_known_values(spark):
    """10 keys: one hot key with 20 rows, nine with 2 → max=20, p50=2,
    p99=20, ratio=10; hot key identified."""
    from datafusion_wasm_bindings_spark.operators.profiling import key_skew_profile

    rows = [(0,)] * 20 + [(k,) for k in range(1, 10) for _ in range(2)]
    df = spark.createDataFrame(rows, "key long")
    r = key_skew_profile(df, "key").collect()[0]
    assert r.n_keys == 10 and r.n_rows == 38
    assert r.max_cnt == 20 and r.p50_cnt == 2 and r.p99_cnt == 20
    assert r.skew_ratio == 10.0 and r.hot_key == 0


def test_pagerank_star_graph(spark):
    """Bidirectional star: the hub out-ranks every leaf; leaves tie and
    break by node id; total rank mass stays ~1 (no dangling nodes)."""
    from datafusion_wasm_bindings_spark.operators.graph import pagerank, pagerank_topk

    edges = [(0, i) for i in (1, 2, 3)] + [(i, 0) for i in (1, 2, 3)]
    e = spark.createDataFrame(edges, "src long, dst long")
    ranks = {r.node: r.rank for r in pagerank(e, iters=5).collect()}
    assert ranks[0] > ranks[1] and ranks[1] == ranks[2] == ranks[3]
    assert abs(sum(ranks.values()) - 1.0) < 1e-6
    top = pagerank_topk(e, iters=5, k=2).collect()
    assert [(r.node, r.pos) for r in top] == [(0, 1), (1, 2)]


def test_cms_heavy_hitters_bounds(spark):
    """CMS never undercounts; with a wide sketch and tiny vocabulary
    the estimates are exact; top-k ordering is by exact count then
    token."""
    from datafusion_wasm_bindings_spark.operators.text import cms_heavy_hitters

    docs = spark.createDataFrame(
        [(1, "a a a b b c"), (2, "a b d"), (3, "a c c")],
        "doc_id long, text string",
    )
    got = cms_heavy_hitters(docs, depth=4, width=512, k=3).collect()
    by_pos = {r.pos: r for r in got}
    assert by_pos[1].tok == "a" and by_pos[1].exact_cnt == 5
    assert by_pos[2].tok == "b" and by_pos[2].exact_cnt == 3
    assert by_pos[3].tok == "c" and by_pos[3].exact_cnt == 3
    for r in got:
        assert r.no_undercount and r.cms_est == r.exact_cnt  # no collisions at w=512


def test_partial_aggregate_state_merges_exactly(spark):
    """Appending a new shard's partial state and re-merging equals a
    full recompute — the mergeable-monoid property, exact for the
    decimal-quantized sums."""
    from pyspark.sql import functions as F

    from datafusion_wasm_bindings_spark.operators.scale import (
        merge_partial_aggregates,
        partial_aggregate,
    )

    day1 = spark.createDataFrame(
        [(1, "a", 0.1), (1, "a", 0.2), (1, "b", 0.3)], "shard_id long, g string, v double"
    )
    day2 = spark.createDataFrame(
        [(2, "a", 0.7)], "shard_id long, g string, v double"
    )
    s1 = partial_aggregate(day1, F.col("shard_id"), ["g"], "v")
    s2 = partial_aggregate(day2, F.col("shard_id"), ["g"], "v")
    merged = {
        r.g: r for r in merge_partial_aggregates(s1.unionByName(s2), ["g"]).collect()
    }
    full = {
        r.g: r
        for r in merge_partial_aggregates(
            partial_aggregate(
                day1.unionByName(day2), F.col("shard_id"), ["g"], "v"
            ),
            ["g"],
        ).collect()
    }
    assert merged["a"].n_rows == 3 and merged["a"].n_partials == 2
    assert merged["a"].vtotal == full["a"].vtotal == 1.0
    assert merged["b"].n_rows == 1 and merged["b"].vtotal == full["b"].vtotal == 0.3


def test_funnel_counts_monotone_and_known(spark):
    from datafusion_wasm_bindings_spark.operators.behavior import funnel

    rows = [
        # user 1 completes the full ordered funnel
        (1, "2024-01-01 00:00:00", "signup"),
        (1, "2024-01-01 01:00:00", "view"),
        (1, "2024-01-01 02:00:00", "purchase"),
        # user 2 views BEFORE signup — must not count past step 1
        (2, "2024-01-01 01:00:00", "signup"),
        (2, "2024-01-01 00:00:00", "view"),
        # user 3 never signs up
        (3, "2024-01-01 00:00:00", "view"),
        (3, "2024-01-01 01:00:00", "purchase"),
    ]
    ev = spark.createDataFrame(
        [(u, t, y) for u, t, y in rows], "user_id long, ts_s string, event_type string"
    ).select("user_id", F.col("ts_s").cast("timestamp").alias("ts"), "event_type")
    out = funnel(ev, ["signup", "view", "purchase"]).collect()[0]
    assert (out.step_1, out.step_2, out.step_3) == (2, 1, 1)


def test_retention_diagonal_is_cohort_sizes(spark):
    from datafusion_wasm_bindings_spark.operators.behavior import retention

    ev = spark.createDataFrame(
        [
            (1, "2024-01-01 10:00:00"),
            (1, "2024-01-03 10:00:00"),
            (2, "2024-01-01 12:00:00"),
            (3, "2024-01-02 09:00:00"),
        ],
        "user_id long, ts_s string",
    ).select("user_id", F.col("ts_s").cast("timestamp").alias("ts"))
    rows = {
        (str(r.cohort_day), r.day_offset): r.n_users
        for r in retention(ev).collect()
    }
    # offset 0 row per cohort = cohort size
    assert rows[("2024-01-01", 0)] == 2
    assert rows[("2024-01-02", 0)] == 1
    assert rows[("2024-01-01", 2)] == 1  # user 1 back on day 3


def test_triangle_count_known_graphs(spark):
    from datafusion_wasm_bindings_spark.operators.graph import triangle_count

    # K4 (4 triangles) + a pendant edge + a duplicate + a self-loop
    edges = [(a, b) for a in range(4) for b in range(4) if a < b]
    edges += [(0, 9), (1, 0), (2, 2)]
    df = spark.createDataFrame(edges, "u long, v long")
    assert triangle_count(df).collect()[0].n_triangles == 4
    # triangle-free: star graph
    star = spark.createDataFrame([(0, i) for i in range(1, 6)], "u long, v long")
    assert triangle_count(star).collect()[0].n_triangles == 0


def test_scd2_intervals_known_history(spark):
    from datafusion_wasm_bindings_spark.operators.cdc import scd2_intervals

    rows = [
        (1, "2024-01-01", 10, "A"),
        (1, "2024-01-05", 11, "A"),  # same run
        (1, "2024-01-09", 12, "B"),  # change
        (1, "2024-01-12", 13, "A"),  # back to A — NEW run, not merged
        (2, "2024-02-01", 20, "X"),
    ]
    df = spark.createDataFrame(rows, "k long, d_s string, seq long, attr string").select(
        "k", F.col("d_s").cast("date").alias("d"), "seq", "attr"
    )
    iv = scd2_intervals(df, key_cols=["k"], attr_col="attr", order_cols=["d", "seq"])
    got = sorted(
        (r.k, r.attr, str(r.valid_from), str(r.valid_to), r.is_current)
        for r in iv.collect()
    )
    assert got == [
        (1, "A", "2024-01-01", "2024-01-09", False),
        (1, "A", "2024-01-12", "None", True),
        (1, "B", "2024-01-09", "2024-01-12", False),
        (2, "X", "2024-02-01", "None", True),
    ]


def test_compaction_plan_next_fit_bounds(spark):
    from datafusion_wasm_bindings_spark.operators.packing import compaction_plan

    files = spark.createDataFrame(
        [(i, 100 + (i * 37) % 250) for i in range(40)], "file_id long, bytes long"
    )
    out = compaction_plan(files, target_bytes=500).collect()
    by_bin: dict[int, int] = {}
    for r in out:
        by_bin[r.bin] = by_bin.get(r.bin, 0) + r.bytes
    # next-fit guarantee: every bin except possibly the last holds
    # >= target once closed, and overshoots by < the file that closed it
    max_file = max(r.bytes for r in out)
    for b, tot in by_bin.items():
        assert tot < 500 + max_file
        if b != max(by_bin):
            assert tot + max_file >= 500  # bin was closed because it filled
    # bins are contiguous 0..k
    assert sorted(by_bin) == list(range(max(by_bin) + 1))


def test_per_key_sample_bounded_and_deterministic(documents):
    from datafusion_wasm_bindings_spark.operators.sampling import per_key_sample

    s1 = per_key_sample(documents, key_col="lang", id_col="doc_id", n=5)
    s2 = per_key_sample(documents.repartition(7), key_col="lang", id_col="doc_id", n=5)
    a = sorted((r.lang, r.doc_id, r.rn) for r in s1.collect())
    b = sorted((r.lang, r.doc_id, r.rn) for r in s2.collect())
    assert a == b  # partitioning-independent
    per_key: dict[str, int] = {}
    for lang, _, _ in a:
        per_key[lang] = per_key.get(lang, 0) + 1
    assert all(v <= 5 for v in per_key.values())


def test_editdist_join_known_pairs(spark):
    from datafusion_wasm_bindings_spark.operators.similarity import editdist_join

    words = spark.createDataFrame(
        [("fast",), ("last",), ("least",), ("table",), ("cable",), ("tables",), ("zzz",)],
        "w string",
    )
    out = {(r.wa, r.wb): r.dist for r in editdist_join(words, max_dist=2).collect()}
    assert out[("fast", "last")] == 1
    assert out[("cable", "table")] == 1
    assert out[("table", "tables")] == 1
    assert out[("last", "least")] == 1  # single insert of 'e'
    assert out[("fast", "least")] == 2
    assert all(wa < wb for wa, wb in out)  # each pair exactly once
    assert not any("zzz" in p for p in out)
    # ADVICE r9: empty-string words take the guarded del1 branch
    # (sequence(1,0) would otherwise fabricate index 0) — the
    # neighborhood is correct by construction, not by substr accident
    tiny = spark.createDataFrame([("",), ("a",), ("ab",), ("b",)], "w string")
    got = sorted(
        (r.wa, r.wb, r.dist) for r in editdist_join(tiny, max_dist=2).collect()
    )
    assert got == [
        ("", "a", 1),
        ("", "ab", 2),
        ("", "b", 1),
        ("a", "ab", 1),
        ("a", "b", 1),
        ("ab", "b", 1),
    ]


def test_editdist_join_matches_naive_all_pairs(spark):
    """Property test for the r9 FastSS deletion-signature rewrite: the
    blocked join must be ROW-IDENTICAL to the naive all-pairs
    definition at d=1 and d=2, on a vocabulary dense enough (5-letter
    alphabet, lengths 1-9) that short words, hot signatures, and the
    L<2 sequence guard all fire."""
    import itertools
    import random

    from datafusion_wasm_bindings_spark.operators.similarity import editdist_join

    def lev(a, b):
        m, n = len(a), len(b)
        dp = list(range(n + 1))
        for i in range(1, m + 1):
            prev, dp[0] = dp[0], i
            for j in range(1, n + 1):
                cur = dp[j]
                dp[j] = min(dp[j] + 1, dp[j - 1] + 1, prev + (a[i - 1] != b[j - 1]))
                prev = cur
        return dp[n]

    rng = random.Random(7)
    vocab = set()
    while len(vocab) < 250:
        vocab.add(
            "".join(rng.choice("abcdz") for _ in range(rng.randint(1, 9)))
        )
    vocab = sorted(vocab)
    df = spark.createDataFrame([(w,) for w in vocab], "w string")
    for d in (1, 2):
        naive = sorted(
            (a, b, lev(a, b))
            for a, b in itertools.combinations(vocab, 2)
            if lev(a, b) <= d
        )
        got = sorted(
            (r.wa, r.wb, r.dist)
            for r in editdist_join(df, max_dist=d).collect()
        )
        assert got == naive, (d, len(got), len(naive))


def test_dataset_manifest_partition_invariant_and_complete(documents):
    from datafusion_wasm_bindings_spark.operators.packing import dataset_manifest

    m1 = dataset_manifest(
        documents, key_col="doc_id", payload_cols=("lang", "n_chars"), n_shards=8
    )
    m2 = dataset_manifest(
        documents.repartition(11),
        key_col="doc_id",
        payload_cols=("lang", "n_chars"),
        n_shards=8,
    )
    a = sorted((r.shard, r.n_rows, r.checksum) for r in m1.collect())
    assert a == sorted((r.shard, r.n_rows, r.checksum) for r in m2.collect())
    assert sum(n for _, n, _ in a) == documents.count()
    # a payload change MUST move the checksum
    mutated = documents.withColumn(
        "n_chars", F.col("n_chars") + (F.col("doc_id") == 1).cast("int")
    )
    m3 = dataset_manifest(
        mutated, key_col="doc_id", payload_cols=("lang", "n_chars"), n_shards=8
    )
    assert a != sorted((r.shard, r.n_rows, r.checksum) for r in m3.collect())


def test_bm25_ranks_tf_and_idf_sensibly(spark):
    from datafusion_wasm_bindings_spark.operators.text import bm25_topk

    docs = spark.createDataFrame(
        [
            (1, "data data table row"),      # tf(data)=2
            (2, "data table row scan"),      # tf(data)=1, tf(scan)=1
            (3, "table row row table"),      # no query terms
            (4, "scan scan scan scan"),      # rare term, high tf
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in bm25_topk(docs, ["data", "scan"], k=10).collect()}
    assert 3 not in out  # no matching terms → no row
    assert out[2].n_terms == 2
    # doc 2 matches both terms; doc 1 only the more common one
    assert out[2].score > out[1].score
    assert all(r.score > 0 for r in out.values())


def test_fk_orphan_audit_counts_known_orphans(spark):
    from datafusion_wasm_bindings_spark.operators.profiling import fk_orphan_audit

    child = spark.createDataFrame(
        [(1, 10), (2, 10), (3, 99), (4, None)], "id long, fk long"
    )
    parent = spark.createDataFrame([(10,), (20,)], "pk long")
    out = {r.fk_rule: r for r in fk_orphan_audit(
        [("child.fk->parent", child, "fk", parent, "pk")]
    ).collect()}
    r = out["child.fk->parent"]
    assert r.n_checked == 3  # NULL FK not checked
    assert r.n_orphans == 1  # fk=99


def test_expectation_report_counts_nulls_as_violations(spark):
    from pyspark.sql import functions as F
    from datafusion_wasm_bindings_spark.operators.profiling import expectation_report

    df = spark.createDataFrame(
        [(1.0,), (2.0,), (-1.0,), (None,)], "v double"
    )
    out = {r.rule_id: r for r in expectation_report(
        [("r_pos", df, F.col("v") > 0), ("r_small", df, F.col("v") < 10)]
    ).collect()}
    assert out["r_pos"].n_rows == 4
    assert out["r_pos"].n_violations == 2   # -1.0 and NULL
    assert out["r_small"].n_violations == 1  # NULL only


def test_rolling_window_range_boundary_exact(spark):
    from datafusion_wasm_bindings_spark.operators.behavior import rolling_window

    base = "2024-01-01 12:00:00"
    rows = [
        (1, "2024-01-01 11:00:00", 1.0),  # exactly 3600 s before → OUT
        (1, "2024-01-01 11:00:01", 2.0),  # 3599 s before → IN
        (1, base, 4.0),
        (2, base, 8.0),                    # other key isolated
    ]
    ev = spark.createDataFrame(rows, "user_id long, ts_s string, value double").select(
        "user_id", F.col("ts_s").cast("timestamp").alias("ts"), "value"
    )
    out = {(r.user_id, r.ts_us): r for r in rolling_window(ev).collect()}
    import datetime, calendar
    t_base = calendar.timegm(datetime.datetime(2024, 1, 1, 12, 0, 0).timetuple()) * 1_000_000
    r = out[(1, t_base)]
    assert r.n_trailing == 2 and r.value_trailing == 6.0
    assert out[(2, t_base)].n_trailing == 1


def test_group_kfold_is_group_coherent(documents, spark):
    from datafusion_wasm_bindings_spark.operators.sampling import group_kfold

    folded = group_kfold(documents, group_col="source", k=5)
    # a group maps to exactly one fold
    per_group = folded.groupBy("source").agg(
        F.count_distinct(F.col("fold")).alias("nf")
    )
    assert per_group.filter(F.col("nf") > 1).count() == 0
    assert folded.count() == documents.count()
    folds = {r.fold for r in folded.select("fold").distinct().collect()}
    assert folds <= set(range(5))


def test_snapshot_diff_known_mutations(spark):
    from datafusion_wasm_bindings_spark.operators.cdc import snapshot_diff

    v1 = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "k long, p string"
    )
    v2 = spark.createDataFrame(
        [(1, "a"), (2, "B"), (4, "d")], "k long, p string"
    )
    r = snapshot_diff(v1, v2, key_cols=["k"], payload_cols=["p"]).collect()[0]
    assert (r.n_added, r.n_removed, r.n_changed, r.n_unchanged) == (1, 1, 1, 1)


def test_experiment_metrics_known_values(spark):
    from datafusion_wasm_bindings_spark.operators.behavior import experiment_metrics

    ev = spark.createDataFrame(
        [
            (1, "purchase", 10.0),
            (1, "purchase", 5.0),
            (1, "view", 99.0),     # non-metric event ignored in the metric
            (2, "view", 1.0),      # converter-less user counts with value 0
            (3, "purchase", 7.0),
        ],
        "user_id long, event_type string, value double",
    )
    out = experiment_metrics(ev, n_variants=1)  # one variant: global stats
    r = out.collect()[0]
    assert r.n_users == 3
    assert r.total_value == 22.0          # 15 + 0 + 7
    assert abs(r.mean_value - 22.0 / 3) < 1e-6
    # sample variance of [15, 0, 7]
    m = 22.0 / 3
    var = ((15 - m) ** 2 + (0 - m) ** 2 + (7 - m) ** 2) / 2
    assert abs(r.var_value - var) < 1e-5


def test_experiment_assignment_balanced_and_sticky(spark):
    from datafusion_wasm_bindings_spark.operators.behavior import experiment_metrics

    ev = spark.createDataFrame(
        [(u, "purchase", 1.0) for u in range(2000)],
        "user_id long, event_type string, value double",
    )
    rows = experiment_metrics(ev, n_variants=2).collect()
    counts = {r.variant: r.n_users for r in rows}
    assert set(counts) == {0, 1}
    assert sum(counts.values()) == 2000
    assert min(counts.values()) > 800  # md5 split near 50/50


def test_equi_width_histogram_covers_all_rows(spark):
    from datafusion_wasm_bindings_spark.operators.profiling import (
        equi_width_histogram,
    )

    df = spark.createDataFrame([(float(i),) for i in range(100)], "x double")
    out = equi_width_histogram(df, "x", n_buckets=10).collect()
    assert sum(r.n for r in out) == 100
    by_bucket = {r.bucket: r for r in out}
    # uniform data → ~equal buckets; max value clamped into last bucket
    assert set(by_bucket) == set(range(10))
    assert by_bucket[9].n == 10  # 90..98 would be 9 rows + clamped 99.0
    assert by_bucket[0].lo == 0.0 and abs(by_bucket[9].hi - 99.0) < 1e-9


def test_span_merge_rolling_actives_equals_bruteforce(spark):
    """q_events_active_users' span-merge formulation must equal the
    naive explode-all-window-days + re-DISTINCT on gap edge cases:
    single-activity users, daily-active users, gaps exactly == window,
    gaps > window, and activity on the span boundary."""
    import datetime

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    d0 = datetime.date(2024, 1, 1)
    rows = []
    rows += [(1, d0)]                                   # single activity
    rows += [(2, d0 + datetime.timedelta(days=i)) for i in range(40)]  # daily
    rows += [(3, d0), (3, d0 + datetime.timedelta(days=7))]            # gap == window
    rows += [(4, d0), (4, d0 + datetime.timedelta(days=30))]           # gap > window
    rows += [(5, d0), (5, d0 + datetime.timedelta(days=6))]            # boundary
    grid = spark.createDataFrame(rows, "user_id long, d date").distinct()

    for days in (7, 28):
        naive = (
            grid.select(
                F.explode(F.sequence(F.col("d"), F.date_add(F.col("d"), days - 1))).alias("rd"),
                "user_id",
            )
            .distinct()
            .groupBy("rd")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        wnext = Window.partitionBy("user_id").orderBy(F.col("d").asc())
        gaps = grid.withColumn("next_d", F.lead("d").over(wnext))
        span_end = F.least(
            F.date_add(F.col("d"), days - 1),
            F.coalesce(F.date_sub(F.col("next_d"), 1), F.date_add(F.col("d"), days - 1)),
        )
        merged = (
            gaps.select(F.explode(F.sequence(F.col("d"), span_end)).alias("rd"), "user_id")
            .groupBy("rd")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        a = {r.rd: r.n for r in naive.collect()}
        b = {r.rd: r.n for r in merged.collect()}
        assert a == b, (days, a, b)


def test_interval_merge_matches_python_reference(spark):
    """q_events_interval_merge's window formulation vs a sequential
    Python sweep over randomized inputs — covers adjacency (touching
    intervals merge: new span only when start > prev max END, strict),
    containment (an interval swallowed by an earlier longer one), and
    duplicate starts."""
    import random

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    rng = random.Random(42)
    rows = []
    eid = 0
    for user in range(6):
        for _ in range(40):
            s = rng.randrange(0, 1000)
            rows.append((user, eid, s, s + rng.randrange(1, 60)))
            eid += 1

    def reference(rows):
        spans = {}
        by_user = {}
        for u, i, s, e in rows:
            by_user.setdefault(u, []).append((s, i, e))
        for u, ivs in by_user.items():
            ivs.sort()
            cur = []
            for s, _i, e in ivs:
                if not cur or s > cur[-1][1]:
                    cur.append([s, e])
                else:
                    cur[-1][1] = max(cur[-1][1], e)
            spans[u] = [(a, b) for a, b in cur]
        return {(u, a, b) for u, sp in spans.items() for a, b in sp}

    df = spark.createDataFrame(rows, "user_id long, event_id long, s long, e long")
    w = Window.partitionBy("user_id").orderBy(F.col("s").asc(), F.col("event_id").asc())
    pm = F.max("e").over(w.rowsBetween(Window.unboundedPreceding, -1))
    flagged = df.withColumn(
        "flag", F.when(F.col("s") > F.coalesce(pm, F.lit(-(1 << 62))), 1).otherwise(0)
    )
    spans = flagged.withColumn(
        "span_id", F.sum("flag").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    got = {
        (r.user_id, r.a, r.b)
        for r in spans.groupBy("user_id", "span_id")
        .agg(F.min("s").alias("a"), F.max("e").alias("b"))
        .collect()
    }
    assert got == reference(rows)


def test_bucketed_rank_matches_naive_window(spark):
    from pyspark.sql import Window

    from datafusion_wasm_bindings_spark.operators.scale import bucketed_rank

    df = spark.createDataFrame(
        [(i % 3, (i * 2654435761) % 1000 / 10.0, i) for i in range(500)],
        "k long, v double, id long",
    )
    naive = df.withColumn(
        "rn",
        F.row_number()
        .over(Window.partitionBy("k").orderBy(F.col("v").asc(), F.col("id").asc()))
        .cast("long"),
    )
    two_pass = bucketed_rank(
        df,
        ["k"],
        F.floor(F.col("v") / 7.0),
        [F.col("v").asc(), F.col("id").asc()],
    )
    assert sorted(map(tuple, naive.collect())) == sorted(map(tuple, two_pass.collect()))


def test_bucketed_rank_md5_prefix_bucket(spark):
    from pyspark.sql import Window

    from datafusion_wasm_bindings_spark.operators.scale import bucketed_rank

    df = spark.createDataFrame([(i % 4, i) for i in range(400)], "k long, id long")
    draw = F.md5(F.concat(F.col("id").cast("string"), F.lit(":t")))
    naive = df.withColumn(
        "rn",
        F.row_number()
        .over(Window.partitionBy("k").orderBy(draw.asc(), F.col("id").asc()))
        .cast("long"),
    )
    # first hex char of the draw is a prefix of the sort key -> monotone
    bucket = F.conv(F.substring(draw, 1, 1), 16, 10)
    two_pass = bucketed_rank(df, ["k"], bucket, [draw.asc(), F.col("id").asc()])
    assert sorted(map(tuple, naive.collect())) == sorted(map(tuple, two_pass.collect()))


def test_bucketed_rank_nulls_ties_and_widths(spark):
    """Adversarial bucketed_rank: NULL order keys (land in the NULL
    bucket, which sorts first exactly like the naive window's default
    NULLS FIRST), NULL PARTITION keys (the naive window keeps NULL as
    its own partition — the offset join must be null-safe, ADVICE r4),
    heavy duplicate values (ties share a bucket because the bucket is a
    function of the leading sort key), and bucket widths from 1 to
    wider-than-domain (single bucket == naive)."""
    from hypothesis import given, settings, strategies as st
    from pyspark.sql import Window

    from datafusion_wasm_bindings_spark.operators.scale import bucketed_rank

    @settings(max_examples=10, deadline=None)
    @given(
        vals=st.lists(
            st.one_of(st.none(), st.integers(min_value=0, max_value=9)),
            min_size=1,
            max_size=60,
        ),
        width=st.sampled_from([1, 3, 100]),
    )
    def check(vals, width):
        df = spark.createDataFrame(
            [(None if i % 5 == 0 else i % 2, v, i) for i, v in enumerate(vals)],
            "k long, v long, id long",
        )
        naive = df.withColumn(
            "rn",
            F.row_number()
            .over(Window.partitionBy("k").orderBy(F.col("v").asc(), F.col("id").asc()))
            .cast("long"),
        )
        two_pass = bucketed_rank(
            df,
            ["k"],
            F.floor(F.col("v") / width),
            [F.col("v").asc(), F.col("id").asc()],
        )
        key = lambda t: tuple((x is None, x) for x in t)  # noqa: E731
        assert sorted(map(tuple, naive.collect()), key=key) == sorted(
            map(tuple, two_pass.collect()), key=key
        ), (vals, width)

    check()


def test_equidepth_bucket_balances_skew_and_preserves_ranks(spark):
    """Skewed values (90% of rows in 1% of the domain) pile into one
    fixed-width bucket but spread across equi-depth buckets; and since
    any monotone bucketing yields identical bucketed_rank output, the
    ranks match the naive window either way."""
    from pyspark.sql import Window

    from datafusion_wasm_bindings_spark.operators.scale import (
        bucketed_rank,
        equidepth_bucket,
    )

    # 90% of values in [0, 10), 10% spread over [10, 1000)
    rows = [
        (i % 2, float(i % 10) if i % 10 else float(10 + (i * 37) % 990), i)
        for i in range(2000)
    ]
    df = spark.createDataFrame(rows, "k long, v double, id long")
    ed = equidepth_bucket(df, F.col("v"), n_buckets=16)
    ranked = bucketed_rank(df, ["k"], ed, [F.col("v").asc(), F.col("id").asc()])
    naive = df.withColumn(
        "rn",
        F.row_number()
        .over(Window.partitionBy("k").orderBy(F.col("v").asc(), F.col("id").asc()))
        .cast("long"),
    )
    assert sorted(map(tuple, ranked.collect())) == sorted(map(tuple, naive.collect()))
    # balance: the largest equi-depth bucket holds a bounded share of
    # rows, where the fixed-width bucketing at the same granularity
    # puts ~90% into one bucket
    ed_counts = [
        r.n for r in df.withColumn("b", ed).groupBy("b").agg(F.count("*").alias("n")).collect()
    ]
    fw_counts = [
        r.n
        for r in df.withColumn("b", F.floor(F.col("v") / (1000.0 / 16)))
        .groupBy("b")
        .agg(F.count("*").alias("n"))
        .collect()
    ]
    assert max(fw_counts) > 0.85 * len(rows)  # fixed width degenerates
    assert max(ed_counts) < 0.3 * len(rows)  # equi-depth stays bounded


def test_zscore_outliers_keeps_null_group(spark):
    """The groupBy+broadcast rewrite must keep NULL-group rows like the
    window formulation it replaced (PARTITION BY keeps NULL as its own
    partition) — requires a null-safe join back (ADVICE r4)."""
    from datafusion_wasm_bindings_spark.operators.cleaning import zscore_outliers

    df = spark.createDataFrame(
        [(i, None if i % 4 == 0 else f"g{i % 3}", float(i * i % 17)) for i in range(40)],
        "id long, grp string, v double",
    )
    out = zscore_outliers(df, ["id"], "grp", "v")
    assert out.count() == 40
    assert out.filter(F.col("grp").isNull()).count() == 10
    assert out.columns == ["id", "grp", "z", "is_outlier"]


def test_iterative_operators_durable_checkpoint(spark, tmp_path):
    """The checkpoint_dir knob (VERDICT r4 #5) swaps localCheckpoint
    for fault-tolerant storage checkpoints without changing results:
    pagerank / BFS / both CC variants return identical rows either way,
    and the durable run actually writes RDD checkpoint files."""
    import os

    from datafusion_wasm_bindings_spark.operators.dedup import (
        connected_components,
        connected_components_star,
    )
    from datafusion_wasm_bindings_spark.operators.graph import bfs_levels, pagerank

    ckdir = str(tmp_path / "ck")
    edges = spark.createDataFrame(
        [(i, (i * 7 + 1) % 20) for i in range(20)] + [(i, (i + 1) % 20) for i in range(20)],
        "src long, dst long",
    )
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(0, 18, 2)] + [(100, 101)], "id_a long, id_b long"
    )

    def rows(df):
        return sorted(map(tuple, df.collect()))

    assert rows(pagerank(edges, iters=2)) == rows(
        pagerank(edges, iters=2, checkpoint_dir=ckdir)
    )
    assert rows(bfs_levels(edges, 0, max_depth=3)) == rows(
        bfs_levels(edges, 0, max_depth=3, checkpoint_dir=ckdir)
    )
    assert rows(connected_components(pairs)) == rows(
        connected_components(pairs, checkpoint_dir=ckdir)
    )
    assert rows(connected_components_star(pairs)) == rows(
        connected_components_star(pairs, checkpoint_dir=ckdir)
    )
    # the durable path wrote real checkpoint state
    assert any(os.scandir(ckdir)), "no checkpoint files written"


def test_ntile_from_rank_formula(spark):
    """The arithmetic ntile used by q_events_rfm (quintile from a
    bucketed rank + total count — no global window) must reproduce
    F.ntile's exact SQL bucket-size semantics (first n mod k buckets
    get one extra row) for adversarial n, including n < k, and with an
    EMPTY bucketed_rank partition list (global rank, offset table of
    |buckets| rows)."""
    from pyspark.sql import Window

    from datafusion_wasm_bindings_spark.operators.scale import _idiv, bucketed_rank

    for n, k in ((1, 5), (3, 5), (5, 5), (7, 5), (23, 5), (100, 5), (101, 5)):
        df = spark.createDataFrame(
            [((i * 2654435761) % 997, i) for i in range(n)], "v long, id long"
        )
        naive = df.select(
            "id",
            F.ntile(k)
            .over(Window.orderBy(F.col("v").asc(), F.col("id").asc()))
            .cast("long")
            .alias("t"),
        )
        ranked = bucketed_rank(
            df, [], F.floor(F.col("v") / 64.0), [F.col("v").asc(), F.col("id").asc()]
        )
        q = _idiv(F.lit(n).cast("long"), F.lit(k))
        r = F.lit(n).cast("long") - q * k
        cut = r * (q + 1)
        rn = F.col("rn")
        tile = F.when(rn <= cut, _idiv(rn - 1, q + 1) + 1).otherwise(
            r + _idiv(rn - cut - 1, q) + 1
        )
        two_pass = ranked.select("id", tile.cast("long").alias("t"))
        assert sorted(map(tuple, naive.collect())) == sorted(
            map(tuple, two_pass.collect())
        ), (n, k)


def test_nsjoin_keeps_null_groups(spark):
    """_util.nsjoin (the window→aggregate+join rewrite family's
    join-back): NULL group keys must survive the stats attachment —
    groupBy keeps NULL as a group, so the join must too (ADVICE r4)."""
    from datafusion_wasm_bindings_spark.queries._util import nsjoin

    fact = spark.createDataFrame(
        [(i, None if i % 3 == 0 else f"g{i % 2}", float(i)) for i in range(12)],
        "id long, grp string, v double",
    )
    stats = fact.groupBy("grp").agg(F.count(F.lit(1)).alias("cnt"))
    out = nsjoin(fact, stats, "grp")
    assert out.count() == 12
    assert out.columns == ["id", "grp", "v", "cnt"]
    assert out.filter(F.col("grp").isNull()).agg(F.min("cnt")).collect()[0][0] == 4


def test_hash_prefilter_join_row_identical(spark):
    """hash_prefilter_join must be row-identical to the plain join for
    any m — including m=2, where nearly every bucket is a false
    positive and the exact join does all the discarding — and must
    drop NULL fact keys exactly like the inner join it accelerates."""
    from datafusion_wasm_bindings_spark.operators.scale import hash_prefilter_join

    fact = spark.createDataFrame(
        [(i, None if i % 7 == 0 else i % 20, float(i)) for i in range(100)],
        "id long, k long, v double",
    ).select("k", "id", "v")
    dim = spark.createDataFrame(
        [(i, f"d{i}") for i in range(0, 20, 3)], "k long, label string"
    )
    expect = sorted(map(tuple, fact.join(dim, "k").collect()))
    for m in (2, 16, 1 << 20):
        got = sorted(map(tuple, hash_prefilter_join(fact, dim, "k", m=m).collect()))
        assert got == expect, m
    # composite key: one sketch over the combined hash
    fact2 = fact.withColumn("k2", (F.col("id") % 3).cast("long"))
    dim2 = dim.withColumn("k2", (F.col("k") % 3).cast("long"))
    expect2 = sorted(map(tuple, fact2.join(dim2, ["k", "k2"]).collect()))
    got2 = sorted(
        map(tuple, hash_prefilter_join(fact2, dim2, ["k", "k2"], m=16).collect())
    )
    assert got2 == expect2


def test_auc_rank_sum_formula(spark):
    """auc_from_scores vs the O(P·N) pairwise definition —
    AUC = mean over (pos, neg) pairs of 1[s_p > s_n] + ½·1[s_p = s_n]
    — on tie-heavy random data, across bucket granularities (bucket
    choice must never change the result)."""
    import itertools
    import random

    from datafusion_wasm_bindings_spark.queries.analytics5 import auc_from_scores

    rng = random.Random(7)
    rows = [
        (rng.randint(0, 1), rng.choice([0.0, 0.001, 0.002, 0.005, 0.25, 0.31]))
        for _ in range(80)
    ]
    pos = [s for l, s in rows if l == 1]
    neg = [s for l, s in rows if l == 0]
    naive = sum(
        1.0 if sp > sn else (0.5 if sp == sn else 0.0)
        for sp, sn in itertools.product(pos, neg)
    ) / (len(pos) * len(neg))
    d = spark.createDataFrame(rows, "label long, score double")
    for scale in (1.0, 8000.0, 1e6):
        row = auc_from_scores(d, bucket_scale=scale).collect()[0]
        assert row["n_pos"] == len(pos) and row["n_neg"] == len(neg)
        assert abs(row["auc"] - naive) < 1e-12, scale


def test_ks_from_scores_naive(spark):
    """ks_from_scores vs the direct two-sample KS definition (max CDF
    gap over pooled distinct scores) on tie-heavy random data, across
    bucket granularities — bucket choice must never change the result,
    and ks_at must be the SMALLEST score attaining the max gap."""
    import random

    from datafusion_wasm_bindings_spark.queries.analytics5 import ks_from_scores

    rng = random.Random(13)
    rows = [
        (
            rng.random() < 0.5,
            rng.choice([0.0, 0.001, 0.002, 0.005, 0.013, 0.25, 0.31]),
        )
        for _ in range(120)
    ]
    a = sorted(s for is_a, s in rows if is_a)
    b = sorted(s for is_a, s in rows if not is_a)
    pooled = sorted({s for _, s in rows})
    gaps = [
        (
            abs(
                sum(1 for x in a if x <= s) / len(a)
                - sum(1 for x in b if x <= s) / len(b)
            ),
            s,
        )
        for s in pooled
    ]
    naive_d = max(g for g, _ in gaps)
    naive_at = min(s for g, s in gaps if g == naive_d)
    d = spark.createDataFrame(rows, "is_a boolean, score double")
    for scale in (1.0, 8000.0, 1e6):
        row = ks_from_scores(d, bucket_scale=scale).collect()[0]
        assert row["n_a"] == len(a) and row["n_b"] == len(b), scale
        assert row["n_scores"] == len(pooled), scale
        assert abs(row["ks_d"] - naive_d) < 1e-12, scale
        assert row["ks_at"] == naive_at, scale


def test_psi_matches_naive(spark, sf_dir):
    """q_ml_psi vs a pure-python replay of the binned PSI on the same
    fixture frame (quantized per-bin terms, exact sum)."""
    from decimal import Decimal

    from datafusion_wasm_bindings_spark.queries import QUERIES as REGISTRY
    from datafusion_wasm_bindings_spark.queries.analytics5 import (
        _PSI_BINS_SCALE,
        _src_score,
    )
    import math

    rows = _src_score(spark, sf_dir).collect()
    bins: dict[int, list[int]] = {}
    for r in rows:
        b = math.floor(r["score"] * _PSI_BINS_SCALE)
        cnt = bins.setdefault(b, [0, 0])
        cnt[0 if r["is_a"] else 1] += 1
    ta = sum(v[0] for v in bins.values())
    tb = sum(v[1] for v in bins.values())
    total = Decimal(0)
    n_bins = 0
    for na, nb in bins.values():
        if na > 0 and nb > 0:
            n_bins += 1
            pa, pb = na / ta, nb / tb
            total += Decimal(f"{(pa - pb) * math.log(pa / pb):.6f}")
    got = REGISTRY["q_ml_psi"].spark_fn(spark, sf_dir).collect()[0]
    assert got["n_a"] == ta and got["n_b"] == tb
    assert got["n_bins"] == n_bins
    assert abs(got["psi"] - float(total)) < 1e-9


def test_rrf_ranks_match_naive_window(spark, sf_dir):
    """q_rank_rrf's bucketed global ranks vs the naive partition-less
    row_number over the same exact dot products — row-identical,
    including the fused-score top-10 cut."""
    from pyspark.sql import Window

    from datafusion_wasm_bindings_spark.operators.similarity import _dot, quantized
    from datafusion_wasm_bindings_spark.queries import QUERIES as REGISTRY
    from datafusion_wasm_bindings_spark.queries.analytics5 import _RRF_C, _RRF_TOPK
    from datafusion_wasm_bindings_spark.sources.catalog import table

    v = table(spark, sf_dir, "embeddings").select(
        "vec_id", quantized(F.col("embedding")).alias("x")
    )
    q1 = v.filter(F.col("vec_id") == 1).select(F.col("x").alias("q1x"))
    q2 = v.filter(F.col("vec_id") == 2).select(F.col("x").alias("q2x"))
    c = (
        v.filter(~F.col("vec_id").isin(1, 2))
        .crossJoin(F.broadcast(q1))
        .crossJoin(F.broadcast(q2))
        .select(
            "vec_id",
            _dot(F.col("x"), F.col("q1x")).alias("s1"),
            _dot(F.col("x"), F.col("q2x")).alias("s2"),
        )
    )
    naive = (
        c.withColumn(
            "r1",
            F.row_number()
            .over(Window.orderBy(F.col("s1").desc(), F.col("vec_id").asc()))
            .cast("long"),
        )
        .withColumn(
            "r2",
            F.row_number()
            .over(Window.orderBy(F.col("s2").desc(), F.col("vec_id").asc()))
            .cast("long"),
        )
        .select(
            "vec_id",
            "r1",
            "r2",
            (
                F.lit(1).cast("double") / (F.lit(_RRF_C) + F.col("r1"))
                + F.lit(1).cast("double") / (F.lit(_RRF_C) + F.col("r2"))
            ).alias("rrf"),
        )
        .orderBy(F.col("rrf").desc_nulls_last(), F.col("vec_id").asc())
        .limit(_RRF_TOPK)
    )
    got = sorted(
        REGISTRY["q_rank_rrf"].spark_fn(spark, sf_dir).collect(),
        key=lambda r: r["vec_id"],
    )
    want = sorted(naive.collect(), key=lambda r: r["vec_id"])
    assert [tuple(r) for r in got] == [tuple(r) for r in want]


def test_semantic_dedup_invariants(spark, sf_dir):
    """semantic_dedup: clusters partition the corpus, keep+prune
    bookkeeping is consistent, the representative is its cluster's
    minimum member, and first_dup is -1 exactly when nothing was
    flagged (and never the representative itself)."""
    from datafusion_wasm_bindings_spark.operators.clustering import (
        fit_kmeans,
        semantic_dedup,
    )
    from datafusion_wasm_bindings_spark.sources.catalog import table

    emb = table(spark, sf_dir, "embeddings")
    n_corpus = emb.count()
    out = {r["cluster_id"]: r for r in semantic_dedup(emb).collect()}
    assert sum(r["n_members"] for r in out.values()) == n_corpus
    assigned, _ = fit_kmeans(emb)
    mins = {
        r["cid"]: (r["mn"], r["n"])
        for r in assigned.groupBy("cid")
        .agg(F.min("vec_id").alias("mn"), F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert set(out) == set(mins)
    for cid, r in out.items():
        assert r["rep_vec"] == mins[cid][0]
        assert r["n_members"] == mins[cid][1]
        assert r["n_kept"] + r["n_dups"] == r["n_members"]
        assert (r["first_dup"] == -1) == (r["n_dups"] == 0)
        if r["first_dup"] != -1:
            assert r["first_dup"] > r["rep_vec"]


def test_language_id_map_matches_explode_join_reference(spark):
    """The r5 pure-map language_id (HOF hit counts + array_max argmax)
    must be row-identical to the explode → broadcast-join → groupBy →
    argmax → join-back formulation it replaced, including: NULL and
    empty text ('und', 0), zero-hit docs, cross-language tie-breaks
    (fr∩es share 'la'/'que'; equal hits resolve to the
    lexicographically GREATEST language code), and tokens counted per
    OCCURRENCE, not distinct. 200 seeded random lexicon soups plus the
    crafted cases."""
    import random

    from pyspark.sql import functions as F

    from datafusion_wasm_bindings_spark.operators.text import (
        LANG_LEXICON,
        language_id,
        tokens_col,
    )

    rng = random.Random(20260815)
    pool = [w for ws in LANG_LEXICON.values() for w in ws] + [
        "xyzzy", "qwerty", "zzz", "la", "que", "la",
    ]
    rows = [
        (0, "en", None),
        (1, "en", ""),
        (2, "fr", "la la que"),          # fr/es tie -> 'fr' (greatest code)
        (3, "en", "the und la"),          # 4-way tie at 1 hit -> 'fr'
        (4, "de", "xyzzy qwerty"),        # zero hits -> 'und'
        (5, "en", "The AND of of of"),    # case-folded, per-occurrence
    ]
    rows += [
        (10 + i, "en", " ".join(rng.choices(pool, k=rng.randint(1, 30))))
        for i in range(200)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, lang string, text string")

    got = sorted(map(tuple, language_id(docs).collect()))

    lex_rows = [(lang, w) for lang, ws in LANG_LEXICON.items() for w in ws]
    lexicon = spark.createDataFrame(lex_rows, "lang_cand string, tok string")
    toks = docs.select("doc_id", F.explode(tokens_col()).alias("tok"))
    hits = (
        toks.join(F.broadcast(lexicon), "tok")
        .groupBy("doc_id", "lang_cand")
        .agg(F.count("*").alias("hits"))
    )
    best = hits.groupBy("doc_id").agg(
        F.expr("max_by(lang_cand, struct(hits, lang_cand))").alias("lang_pred"),
        F.max("hits").alias("best_hits"),
    )
    ref = sorted(
        map(
            tuple,
            docs.select("doc_id", "lang")
            .join(best, "doc_id", "left")
            .select(
                "doc_id",
                F.coalesce("lang_pred", F.lit("und")).alias("lang_pred"),
                F.coalesce("best_hits", F.lit(0)).alias("best_hits"),
                "lang",
            )
            .collect(),
        )
    )
    assert got == ref
    # the crafted tie cases pin the argmax order explicitly
    by_id = {r[0]: r for r in got}
    assert by_id[0][1:3] == ("und", 0)
    assert by_id[1][1:3] == ("und", 0)
    assert by_id[2][1:3] == ("fr", 3)
    assert by_id[3][1:3] == ("fr", 1)
    assert by_id[4][1:3] == ("und", 0)
    assert by_id[5][1:3] == ("en", 5)


def test_bucketed_prefix_sum_matches_naive_window(spark):
    """operators/scale.bucketed_prefix_sum must be row-identical to
    sum(value) OVER (PARTITION BY key ORDER BY ord ROWS UNBOUNDED
    PRECEDING) for any monotone bucket — including NULL partition keys
    (their own group, null-safe join-back) and NULL bucket values
    (first-bucket sentinel). Integer values, total order via id."""
    import random

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from datafusion_wasm_bindings_spark.operators.scale import bucketed_prefix_sum

    rng = random.Random(8157)
    rows = [
        (i, rng.choice(["a", "b", None]), rng.randint(-5, 50))
        for i in range(500)
    ]
    df = spark.createDataFrame(rows, "id long, k string, v long")

    got = sorted(
        map(
            tuple,
            bucketed_prefix_sum(
                df, ["k"], F.floor(F.col("id") / 37), [F.col("id").asc()],
                F.col("v"), sum_col="rs",
            ).collect(),
        )
    )
    w = (
        Window.partitionBy("k")
        .orderBy(F.col("id").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    ref = sorted(
        map(tuple, df.withColumn("rs", F.sum("v").over(w)).collect())
    )
    assert got == ref

    # empty-partition-list form: one global running sum, no fact window
    got_g = sorted(
        map(
            tuple,
            bucketed_prefix_sum(
                df.select("id", "v"), [], F.floor(F.col("id") / 37),
                [F.col("id").asc()], F.col("v"), sum_col="rs",
            ).collect(),
        )
    )
    wg = Window.orderBy(F.col("id").asc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    ref_g = sorted(
        map(tuple, df.select("id", "v").withColumn("rs", F.sum("v").over(wg)).collect())
    )
    assert got_g == ref_g


def test_null_index_array_pick(spark):
    """Spark 4.1.2 quirk (adversarial NULL replay, r5): when a NULLABLE
    computed index reaches ``element_at(array_literal, idx)`` through
    the codegen path, the NULL row's index VALUE SLOT (-1) is consumed
    instead of its null flag — element_at returns the LAST element
    (negative indexing) rather than NULL, and ``arr[idx]`` throws
    INVALID_ARRAY_INDEX -1. ``F.get`` (0-based) handles the NULL
    correctly and is the registry idiom (q_stats_kappa). This test
    pins the SAFE idiom only; if a future Spark fixes element_at, it
    keeps passing."""
    from pyspark.sql import functions as F

    df = spark.range(4).select(
        F.when(F.col("id") % 2 == 0, F.col("id") % 3 + 1).alias("idx1")
    )
    arr = F.array(F.lit("F"), F.lit("O"), F.lit("P"))
    got = df.select(
        "idx1",
        F.get(arr, F.col("idx1").cast("int") - 1).alias("picked"),
    ).collect()
    for row in got:
        if row.idx1 is None:
            assert row.picked is None  # the whole point
        else:
            assert row.picked == ["F", "O", "P"][int(row.idx1) - 1]


def test_word_shingles_zero_token_contract(spark):
    """r6 contract: 0 tokens -> ZERO shingles (never one '' whole-doc
    shingle that pairs every empty doc at Jaccard 1.0); 1..k-1 tokens
    -> one whole-doc shingle; n >= k -> n-k+1 shingles; NULL token
    array -> NULL."""
    from pyspark.sql import functions as F

    from datafusion_wasm_bindings_spark.operators.dedup import word_shingles

    df = spark.createDataFrame(
        [(0, []), (1, ["a"]), (2, ["a", "b"]), (3, ["a", "b", "c", "d"]), (4, None)],
        "id int, toks array<string>",
    )
    rows = {
        r["id"]: r["sh"]
        for r in df.select("id", word_shingles(F.col("toks"), 3).alias("sh")).collect()
    }
    assert rows[0] == []
    assert rows[1] == ["a"]
    assert rows[2] == ["a b"]
    assert rows[3] == ["a b c", "b c d"]
    assert rows[4] is None


def test_nonzero_vectors_population(spark):
    """r6 cosine-population contract: the zero(-quantized) vector and
    NULL embeddings are excluded; ordinary vectors survive."""
    from datafusion_wasm_bindings_spark.operators.similarity import nonzero_vectors

    df = spark.createDataFrame(
        [
            (1, [1.0, 0.0]),
            (2, [0.0, 0.0]),          # zero vector
            (3, None),                # NULL embedding
            (4, [0.0001, 0.0001]),    # nonzero but quantizes to zero
        ],
        "vec_id int, embedding array<float>",
    )
    kept = {r["vec_id"] for r in nonzero_vectors(df).collect()}
    assert kept == {1}


def test_iterative_checkpoints_release_previous_rounds(spark):
    """r7 release convention: iterative operators free the previous
    round's localCheckpoint blocks once the new round materializes, so
    persistent-RDD storage stays O(1) in round count (a 10M-node-chain
    star CC otherwise accumulated ~30 rounds x ~200 MB and OOM'd an
    8 g heap — tools_scale_probe.py probe_cc_chain_xl). A 2000-node
    chain drives ~10 star alternations and ~7 BFS/pagerank rounds; the
    persistent-RDD delta must stay at the final-state constant, never
    grow with rounds."""
    from datafusion_wasm_bindings_spark.operators.dedup import (
        connected_components_star,
    )
    from datafusion_wasm_bindings_spark.operators.graph import (
        bfs_levels,
        pagerank,
    )

    def n_persistent() -> int:
        return spark.sparkContext._jsc.sc().getPersistentRDDs().size()

    chain = spark.range(1999).select(
        F.col("id").alias("id_a"), (F.col("id") + 1).alias("id_b")
    )
    before = n_persistent()
    comps = connected_components_star(chain)
    assert comps.select(F.countDistinct("comp")).first()[0] == 1
    # retained: the converged edge set the result reads (+ nothing per round)
    assert n_persistent() - before <= 2, (before, n_persistent())

    edges = chain.select(
        F.col("id_a").alias("src"), F.col("id_b").alias("dst")
    ).unionByName(
        chain.select(F.col("id_b").alias("src"), F.col("id_a").alias("dst"))
    )
    before = n_persistent()
    assert pagerank(edges, iters=6).count() == 2000
    assert n_persistent() - before <= 4, (before, n_persistent())

    before = n_persistent()
    lv = bfs_levels(edges, source=0, max_depth=8)
    assert lv.agg(F.max("lvl")).first()[0] == 8
    # retained: final visited + final frontier
    assert n_persistent() - before <= 3, (before, n_persistent())


def test_balanced_write_populates_all_range_partitions(spark, sf_dir, tmp_path):
    """q_scale_balanced_write's registry surface moved to assertion
    columns (files_bounded/balanced — the raw file count is not
    oracle-predictable below |shards| distinct keys, r7 review find);
    this test keeps the STRONG fixture-scale claim pinned: with >= 8
    distinct o_orderkey values, repartitionByRange(8) populates all 8
    range partitions, one file each, covering every row."""
    from pyspark.sql import functions as F

    from datafusion_wasm_bindings_spark.sources.catalog import table

    out = str(tmp_path / "balanced")
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    n_rows = o.count()
    o.repartitionByRange(8, F.col("o_orderkey")).write.mode("overwrite").parquet(out)
    back = spark.read.parquet(out).select(
        "o_orderkey", F.col("_metadata.file_path").alias("f")
    )
    per_file = back.groupBy("f").agg(F.count(F.lit(1)).alias("n")).collect()
    assert len(per_file) == 8, [r.n for r in per_file]
    assert sum(r.n for r in per_file) == n_rows
    assert max(r.n for r in per_file) <= 3 * min(r.n for r in per_file)


def test_duplicated_spans_planted(spark):
    """duplicated_spans (exact-substring dedup class): a 20-char span
    planted in three docs at DIFFERENT offsets is found with exact
    occurrence/document counts; unique text yields no spans; short and
    NULL docs are out of the population."""
    from datafusion_wasm_bindings_spark.operators.dedup import duplicated_spans

    marker = "THE-REPEATED-SPAN-XY"  # exactly 20 chars
    assert len(marker) == 20
    rows = [
        (1, "aaaa " + marker + " tail one unique-1"),
        (2, "longer prefix 2 " + marker + " t-2"),
        (3, marker + " leading copy three"),
        (4, "completely different text with no repeats at all 4"),
        (5, "short"),
        (6, None),
        (None, marker + " null-id doc is out of the population!!"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.span: r for r in duplicated_spans(docs, span_len=20).collect()}
    assert marker in out
    got = out[marker]
    assert got.n_occurrences == 3 and got.n_docs == 3 and got.min_doc == 1
    # every reported span really occurs >1 times among non-null docs
    assert all(r.n_occurrences > 1 for r in out.values())
    # doc 4's unique text contributes no span
    assert not any(r.min_doc == 4 and r.n_docs == 1 for r in out.values())


def test_duplicated_spans_chunked_matches_naive(spark):
    """r10 widerow fix: duplicated_spans' two-level chunked explode
    (bounded substr offsets — positional substr is an O(offset)
    codepoint scan, so the single-explode form was O(width²) per doc)
    is row-identical to the naive positions-explode formulation,
    including unicode/supplementary-plane chars and widths that land
    exactly on / either side of the _SPAN_CHUNK boundary."""
    import random

    from datafusion_wasm_bindings_spark.operators.dedup import (
        _SPAN_CHUNK,
        duplicated_spans,
    )

    rng = random.Random(42)
    alpha = list("abcX ") + ["é", "💩", "中"]
    rows = []
    for d in range(40):
        n = rng.choice(
            [0, 5, 19, 20, 21, 100, _SPAN_CHUNK, _SPAN_CHUNK + 1,
             2 * _SPAN_CHUNK + 1, 2 * _SPAN_CHUNK + 36]
        )
        rows.append((d, "".join(rng.choice(alpha) for _ in range(n))))
    rows += [(100, None), (None, "x" * 50),
             (101, "dup-span-content-xyz!" * 5),
             (102, "dup-span-content-xyz!" * 5)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    def naive(documents, span_len):
        d = documents.filter(
            F.col("doc_id").isNotNull()
            & F.col("text").isNotNull()
            & (F.length("text") >= span_len)
        ).select("doc_id", "text")
        spans = d.select(
            "doc_id",
            F.explode(
                F.sequence(F.lit(1), F.length("text") - F.lit(span_len - 1))
            ).alias("i"),
            "text",
        ).select(
            "doc_id",
            F.col("text").substr(F.col("i"), F.lit(span_len)).alias("span"),
        )
        return (
            spans.groupBy("span")
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_occurrences"),
                F.countDistinct("doc_id").cast("long").alias("n_docs"),
                F.min("doc_id").cast("long").alias("min_doc"),
            )
            .filter(F.col("n_occurrences") > 1)
        )

    for span_len in (3, 20, 21):
        got = sorted(
            map(tuple, duplicated_spans(docs, span_len=span_len, top_k=None).collect())
        )
        want = sorted(map(tuple, naive(docs, span_len).collect()))
        assert got == want, (span_len, got[:3], want[:3])

    # span_len LONGER than the chunk stride, with planted shared
    # regions so the comparison is non-vacuous (spans straddle many
    # chunk boundaries; verified 701/788-row matches at L=600/513)
    shared = "".join(rng.choice(alpha) for _ in range(1300))
    long_docs = spark.createDataFrame(
        [(1, shared), (2, "xx" + shared[:900]), (3, shared[100:] + "yy")],
        "doc_id long, text string",
    )
    for span_len in (513, 600):
        got = sorted(
            map(
                tuple,
                duplicated_spans(long_docs, span_len=span_len, top_k=None).collect(),
            )
        )
        want = sorted(map(tuple, naive(long_docs, span_len).collect()))
        assert got and got == want, (span_len, len(got), len(want))

    # r11 second chunk level: exercise the SUPER-chunk boundary
    # arithmetic with the strides patched tiny (8/32), so widths on /
    # either side of every j/kk boundary stay cheap for the naive twin
    # — the production constants only shift where the boundaries fall,
    # never the arithmetic (S2 is a multiple of S1 in both).
    import datafusion_wasm_bindings_spark.operators.dedup as _dedup_mod

    old_s, old_s2 = _dedup_mod._SPAN_CHUNK, _dedup_mod._SUPER_CHUNK
    try:
        _dedup_mod._SPAN_CHUNK, _dedup_mod._SUPER_CHUNK = 8, 32
        srows = []
        for d, n in enumerate([31, 32, 33, 40, 63, 64, 65, 96, 100, 129]):
            srows.append((d, "".join(rng.choice(alpha) for _ in range(n))))
        srows += [(900, "boundary-straddle!" * 8), (901, "boundary-straddle!" * 8)]
        sdocs = spark.createDataFrame(srows, "doc_id long, text string")
        for span_len in (3, 7, 9, 35):  # < S1, = S1-1, > S1, > S2
            got = sorted(
                map(
                    tuple,
                    duplicated_spans(sdocs, span_len=span_len, top_k=None).collect(),
                )
            )
            want = sorted(map(tuple, naive(sdocs, span_len).collect()))
            assert got == want, (span_len, got[:3], want[:3])
    finally:
        _dedup_mod._SPAN_CHUNK, _dedup_mod._SUPER_CHUNK = old_s, old_s2


def test_builtin_moment_aggs_match_identities(spark, sf_dir):
    """The q_fn_stddev_var / q_fn_corr_covar / q_fn_regr oracle twins
    moved to exact decimal-moment identities in r9 (the builtins'
    accumulation is summation-order-dependent across engines, pitfall
    e — two rounding-boundary flips observed live at the extremes
    re-cert). This test keeps the BUILTIN function surface exercised:
    Spark's corr/covar/variance/regr_* agree with the identity values
    to float tolerance on real data."""
    from pyspark.sql import functions as F

    from datafusion_wasm_bindings_spark.sources.catalog import table

    lineitem = table(spark, sf_dir, "lineitem")
    r = lineitem.agg(
        F.corr("l_discount", "l_tax").alias("c"),
        F.covar_samp("l_discount", "l_tax").alias("cv"),
        F.var_samp("l_discount").alias("va"),
        F.stddev("l_discount").alias("sd"),
        F.expr("regr_slope(l_tax, l_discount)").alias("slope"),
        F.expr("regr_r2(l_tax, l_discount)").alias("r2"),
        F.expr("regr_count(l_tax, l_discount)").alias("n"),
        F.count("l_discount").alias("nx"),
        F.sum("l_discount").alias("sx"),
        F.sum("l_tax").alias("sy"),
        F.sum(F.col("l_discount") * F.col("l_discount")).alias("sxx"),
        F.sum(F.col("l_discount") * F.col("l_tax")).alias("sxy"),
        F.sum(F.col("l_tax") * F.col("l_tax")).alias("syy"),
    ).collect()[0]
    n, sx, sy, sxx, sxy, syy = r.n, r.sx, r.sy, r.sxx, r.sxy, r.syy
    import math

    cov = (n * sxy - sx * sy) / n / (n - 1)
    va = (n * sxx - sx * sx) / n / (n - 1)
    corr = (n * sxy - sx * sy) / math.sqrt(
        (n * sxx - sx * sx) * (n * syy - sy * sy)
    )
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    assert abs(r.c - corr) < 1e-9
    assert abs(r.cv - cov) < 1e-9
    assert abs(r.va - va) < 1e-9
    assert abs(r.sd - math.sqrt(va)) < 1e-9
    assert abs(r.slope - slope) < 1e-9
    assert abs(r.r2 - corr * corr) < 1e-9


def test_fit_kmeans_checkpoints_quantized_corpus(spark, sf_dir):
    """r12 (wave-13 checkpoint rule): fit_kmeans localCheckpoints the
    quantized corpus ONCE; the seed collect, every per-round centroid
    collect, and the returned assignment all read the materialized RDD
    instead of re-deriving the scan+quantization lineage. Evidence
    mirror of plans/r12/q_cluster_kmeans_{before,after}.txt: the
    assignment's plan must contain NO parquet scan, only the
    checkpoint's ExistingRDD."""
    from datafusion_wasm_bindings_spark.operators.clustering import fit_kmeans
    from datafusion_wasm_bindings_spark.sources.catalog import table

    emb = table(spark, sf_dir, "embeddings").filter(
        F.col("vec_id").isNotNull() & F.col("embedding").isNotNull()
    )
    assigned, cents = fit_kmeans(emb, k=2, iters=1)
    plan = assigned._jdf.queryExecution().executedPlan().toString()
    assert "Scan parquet" not in plan, plan
    assert "ExistingRDD" in plan, plan
    assert cents and assigned.count() > 0


def test_driver_lloyd_fit_matches_spark_fit(spark, sf_dir):
    """r13 job fold: ivf_index / pq_index now fit Lloyd on the DRIVER
    over the one-collect train sample (3 Spark jobs -> 1 per build).
    Contract: the fitted state is BIT-IDENTICAL to the old Spark-side
    fit (checkpointed TakeOrdered sample + _assign_cells/_encode_codes
    + posexplode avg collects) — asserted here by replaying the old
    path inline on the real fixture corpus and comparing every double
    by its IEEE bit pattern."""
    import struct

    from pyspark.sql import functions as F

    from datafusion_wasm_bindings_spark.operators.similarity import (
        _assign_cells,
        _encode_codes,
        ivf_index,
        nonzero_vectors,
        pq_index,
    )
    from datafusion_wasm_bindings_spark.sources.catalog import table

    def bits(vals):
        return [struct.pack("<d", float(x)) for x in vals]

    emb = table(spark, sf_dir, "embeddings")
    n_cent, n_codes, m_sub, iters = 8, 8, 4, 2

    # --- IVF: old Spark-side fit, replayed inline
    base = nonzero_vectors(emb).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    ).filter(F.col("v").isNotNull() & ~F.exists("v", lambda x: x.isNull()))
    n_train = max(10_000, 50 * n_cent)
    train = base.orderBy("vec_id").limit(n_train).localCheckpoint(eager=True)
    seeds = train.orderBy("vec_id").limit(n_cent).collect()
    cents = [[float(x) for x in r["v"]] for r in seeds]
    for _ in range(iters):
        rows = (
            _assign_cells(train, cents)
            .select("cell", F.posexplode("v").alias("dim", "x"))
            .groupBy("cell", "dim")
            .agg(F.avg("x").alias("m"))
            .collect()
        )
        by_cell = {}
        for r in rows:
            by_cell.setdefault(int(r["cell"]), {})[int(r["dim"])] = float(r["m"])
        cents = [[d[i] for i in sorted(d)] for _, d in sorted(by_cell.items())]

    _, centroids = ivf_index(nonzero_vectors(emb), n_centroids=n_cent, lloyd_iters=iters)
    got = {int(r["cell"]): list(r["cv"]) for r in centroids.collect()}
    assert sorted(got) == list(range(len(cents)))
    for cell, cv in enumerate(cents):
        assert bits(got[cell]) == bits(cv), f"IVF centroid {cell} diverged"

    # --- PQ: old Spark-side fit, replayed inline
    pbase = emb.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    ).filter(F.col("v").isNotNull() & ~F.exists("v", lambda x: x.isNull()))
    ptrain = pbase.orderBy("vec_id").limit(max(10_000, 50 * n_codes)).localCheckpoint(
        eager=True
    )
    pseeds = ptrain.orderBy("vec_id").limit(n_codes).collect()
    dim = len(pseeds[0]["v"])
    sub_len = dim // m_sub
    books = [
        [[float(x) for x in r["v"][i * sub_len : (i + 1) * sub_len]] for r in pseeds]
        for i in range(m_sub)
    ]
    for _ in range(iters):
        rows = (
            _encode_codes(ptrain, books, sub_len)
            .join(ptrain.select("vec_id", "v"), "vec_id")
            .select(
                "sub_id",
                "code",
                F.posexplode(
                    F.slice(F.col("v"), F.col("sub_id") * sub_len + 1, F.lit(sub_len))
                ).alias("dim", "x"),
            )
            .groupBy("sub_id", "code", "dim")
            .agg(F.avg("x").alias("m"))
            .collect()
        )
        upd = {}
        for r in rows:
            upd.setdefault((int(r["sub_id"]), int(r["code"])), {})[int(r["dim"])] = float(
                r["m"]
            )
        for (si, ci), dims in upd.items():
            books[si][ci] = [dims[d] for d in sorted(dims)]

    _, cb, got_sub_len = pq_index(emb, m_subspaces=m_sub, n_codes=n_codes, lloyd_iters=iters)
    assert got_sub_len == sub_len
    got_books = {}
    for r in cb.collect():
        got_books[(int(r["sub_id"]), int(r["code"]))] = list(r["cv"])
    for si, book in enumerate(books):
        for ci, cv in enumerate(book):
            assert bits(got_books[(si, ci)]) == bits(cv), f"PQ book ({si},{ci}) diverged"


def test_argmin_idx_driver_edge_semantics():
    """The driver argmin twin's corner cases, matched to _nearest_idx /
    Spark struct ordering: NaN scores sort GREATEST (non-NaN wins);
    all-NaN ties break to the lowest index; a length-mismatched
    centroid (zip_with null padding -> NULL score) sorts FIRST."""
    from datafusion_wasm_bindings_spark.operators.similarity import (
        _argmin_idx_driver,
    )

    nan = float("nan")
    # css chosen so d = css - 2*dot; vectors crafted per case
    v = [1.0, 0.0]
    # non-NaN beats NaN even at a higher index
    cents = [[nan, 0.0], [1.0, 0.0]]
    css = [nan, 1.0]
    assert _argmin_idx_driver(v, cents, css) == 1
    # all-NaN -> lowest index
    assert _argmin_idx_driver(v, [[nan, 0.0], [nan, 0.0]], [nan, nan]) == 0
    # length mismatch (NULL score) sorts before any real score
    assert _argmin_idx_driver(v, [[0.0, 0.0], [5.0]], [0.0, 25.0]) == 1
    # plain tie -> lowest index
    assert _argmin_idx_driver(v, [[0.5, 0.5], [0.5, 0.5]], [0.5, 0.5]) == 0


def test_ann_index_build_job_count(spark):
    """r13 job fold: an ivf_index / pq_index build runs at most THREE
    Spark jobs — one collect of the bounded train sample, one eager
    checkpoint of the full-corpus assignment/encode, plus (AQE) the
    broadcast-materialization job of the centroid/codebook matrix
    inside the final assignment. The old shape ran 5+ with
    lloyd_iters=2 (sample checkpoint + seeds collect + one
    collect per Lloyd round + final checkpoint); the fold is the
    win, so pin the ceiling."""
    from datafusion_wasm_bindings_spark.operators.similarity import (
        ivf_index,
        pq_index,
    )

    rows = [(i, [float(i % 7), float(i % 5), float(i % 3), 1.0]) for i in range(64)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    sc = spark.sparkContext
    for label, build in (
        ("ivf", lambda: ivf_index(emb, n_centroids=2, lloyd_iters=2)),
        ("pq", lambda: pq_index(emb, m_subspaces=2, n_codes=2, lloyd_iters=2)),
    ):
        group = f"jobcount_{label}"
        sc.setJobGroup(group, label)
        try:
            build()
        finally:
            sc.setJobGroup(None, None)
        n_jobs = len(sc.statusTracker().getJobIdsForGroup(group))
        assert n_jobs <= 3, f"{label} index build ran {n_jobs} jobs, expected <= 3"
