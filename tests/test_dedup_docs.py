"""Document dedup operators: exact, Jaccard, MinHash-LSH, SimHash."""

from __future__ import annotations

import pytest

from aroma_spark.operators.dedup import (
    exact_text_dedup,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash,
    simhash_near_pairs,
    word_shingles,
)


@pytest.fixture(scope="module")
def docs(spark):
    base = "the quick brown fox jumps over the lazy dog again and again today"
    rows = [
        (0, base),
        (1, base),  # exact duplicate of 0
        (2, base + " extra trailing words here"),  # near-dup of 0
        (3, "completely different content about spark rollups and tiers ok"),
        (4, "short text"),  # < 3 tokens after shingling guard? 2 tokens
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_dedup(spark, docs):
    out = exact_text_dedup(docs).toPandas()
    assert len(out) == 4  # 0/1 collapse
    dup = out[out.n_copies == 2]
    assert len(dup) == 1 and dup.doc_id.iloc[0] == 0  # min-id survivor


def test_shingles_skip_short_docs(spark, docs):
    sh = word_shingles(docs).toPandas()
    assert 4 not in set(sh.doc_id)  # 2 tokens -> no 3-gram
    assert set(sh.doc_id) == {0, 1, 2, 3}


def test_jaccard_identical_is_one(spark, docs):
    pairs = ngram_jaccard_pairs(docs, threshold=0.2).toPandas()
    exact = pairs[(pairs.doc_a == 0) & (pairs.doc_b == 1)]
    assert len(exact) == 1 and exact.jaccard.iloc[0] == 1.0
    near = pairs[(pairs.doc_a == 0) & (pairs.doc_b == 2)]
    assert len(near) == 1 and 0.2 <= near.jaccard.iloc[0] < 1.0
    assert not ((pairs.doc_a == 0) & (pairs.doc_b == 3)).any()


def test_minhash_lsh_finds_duplicates(spark, docs):
    pairs = minhash_lsh_pairs(docs).toPandas()
    got = set(zip(pairs.doc_a, pairs.doc_b))
    assert (0, 1) in got  # identical docs always collide in every band
    assert (0, 3) not in got and (1, 3) not in got


def test_simhash_identical_and_distance(spark, docs):
    sh = simhash(docs).toPandas().set_index("doc_id").simhash
    assert sh[0] == sh[1]
    assert 0 <= sh[0] < 2**32
    pairs = simhash_near_pairs(docs, max_hamming=0).toPandas()
    assert {(0, 1)} <= set(zip(pairs.doc_a, pairs.doc_b))
    assert (pairs.hamming == 0).all()


@pytest.fixture(scope="module")
def template_corpus(spark):
    """Synthetic boilerplate flood: every doc shares the same template
    shingles (the giant bucket) plus unique filler; docs 0/1 are true
    near-dups sharing rare content shingles too."""
    template = "all rights reserved terms of service apply to this site"
    rows = [(0, f"alpha beta gamma delta unique phrase one {template}"),
            (1, f"alpha beta gamma delta unique phrase two {template}")]
    rows += [
        (i, f"filler{i} words{i} only{i} here{i} now{i} {template}")
        for i in range(2, 42)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_giant_bucket_guard_jaccard(spark, template_corpus):
    # unguarded: the template shingles make every pair a candidate
    raw = ngram_jaccard_pairs(
        template_corpus, threshold=0.01, max_shingle_df=None
    )
    assert raw.count() == 42 * 41 // 2  # quadratic blow-up
    # guarded (cap < 42): template shingles dropped, only the true
    # near-dup pair survives via its rare content shingles
    guarded = ngram_jaccard_pairs(
        template_corpus, threshold=0.01, max_shingle_df=10
    ).toPandas()
    assert set(zip(guarded.doc_a, guarded.doc_b)) == {(0, 1)}


def test_giant_bucket_guard_minhash(spark, template_corpus):
    from aroma_spark.operators.dedup import giant_buckets, minhash_band_keys

    # with a low cap the flooded band buckets are dropped; the candidate
    # set collapses from ~all-pairs to just pairs sharing rare bands
    guarded = minhash_lsh_pairs(template_corpus, max_bucket_size=10)
    unguarded = minhash_lsh_pairs(template_corpus, max_bucket_size=None)
    assert guarded.count() < unguarded.count()
    # the dropped keys are observable, not silent
    bands = minhash_band_keys(template_corpus)
    big = giant_buckets(bands, ["band", "band_key"], 10).toPandas()
    assert len(big) > 0 and (big.n_docs > 10).all()


def test_guard_cap_above_max_df_is_exact(spark, docs):
    # cap above the corpus max document frequency == unguarded results
    a = ngram_jaccard_pairs(docs, threshold=0.2, max_shingle_df=None).toPandas()
    b = ngram_jaccard_pairs(docs, threshold=0.2, max_shingle_df=10_000).toPandas()
    key = lambda d: sorted(map(tuple, d[["doc_a", "doc_b", "jaccard"]].values))
    assert key(a) == key(b)


def test_normalized_text_dedup(spark):
    from aroma_spark.operators.dedup import normalized_text_dedup

    docs = spark.createDataFrame(
        [(0, "Hello   World"), (1, "  hello world "), (2, "HELLO\tWORLD"),
         (3, "different")],
        "doc_id long, text string",
    )
    out = normalized_text_dedup(docs).toPandas()
    assert len(out) == 2
    collapsed = out[out.n_copies == 3]
    assert len(collapsed) == 1 and collapsed.doc_id.iloc[0] == 0


def test_dedup_savings_by_source(spark):
    from aroma_spark.operators.dedup import dedup_savings_by_source

    rows = [
        (1, "aaa", "en", "web", 3),
        (2, "aaa", "en", "web", 3),   # duplicate of 1
        (3, "bb", "en", "web", 2),
        (4, "cccc", "en", "book", 4),
    ]
    df = spark.createDataFrame(
        rows,
        "doc_id long, text string, lang string, source string,"
        " n_chars long",
    )
    out = {r["source"]: r
           for r in dedup_savings_by_source(df).collect()}
    web = out["web"]
    # dup group {1,2}: one redundant copy of 3 bytes out of 8 total
    assert (web["n_docs"], web["n_distinct"], web["total_bytes"],
            web["redundant_bytes"], web["savings_share"]) == (
        3, 2, 8, 3, 0.375)
    assert (out["book"]["redundant_bytes"],
            out["book"]["savings_share"]) == (0, 0.0)


def test_supplier_breadth_hist(spark):
    from aroma_spark.operators.tpch import supplier_breadth_hist

    li = spark.createDataFrame(
        # supp 1 ships part 7 twice (distinct collapses it) + part 8;
        # supp 2 ships 5 distinct parts
        [(1, 7), (1, 7), (1, 8)] + [(2, p) for p in range(5)],
        "l_suppkey long, l_partkey long",
    )
    out = {r["bucket"]: r for r in supplier_breadth_hist(li).collect()}
    # supp 1: 2 parts -> bucket 1; supp 2: 5 parts -> bucket 2
    assert (out[1]["lo_parts"], out[1]["n_suppliers"],
            out[1]["sum_parts"], out[1]["share"]) == (2, 1, 2, 0.5)
    assert (out[2]["lo_parts"], out[2]["sum_parts"]) == (4, 5)


def test_dup_rate_by_length(spark):
    from aroma_spark.operators.dedup import dup_rate_by_length

    rows = (
        [(i, "aaa", "en", "web", 3) for i in range(3)]
        + [(3, "bb", "en", "web", 2)]
        + [(4, "cccccc", "en", "web", 6), (5, "cccccc", "en", "web", 6)]
    )
    df = spark.createDataFrame(
        rows,
        "doc_id long, text string, lang string, source string,"
        " n_chars long",
    )
    out = {r["bucket"]: r for r in dup_rate_by_length(df).collect()}
    # bucket 1 (2-3 chars): groups aaa(x3) + bb(x1) -> 2 redundant of 4
    assert (out[1]["lo_chars"], out[1]["n_docs"], out[1]["n_redundant"],
            out[1]["dup_rate"]) == (2, 4, 2, 0.5)
    assert (out[2]["lo_chars"], out[2]["n_redundant"]) == (4, 1)
