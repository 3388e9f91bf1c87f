"""Hash-based train/val/test splits: determinism, balance, leakage."""

from __future__ import annotations

from pyspark.sql import functions as F

from aroma_spark.operators.splits import split_counts, with_split


def _docs(spark, n=500):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("text "), F.col("id")).alias("text"),
    )


def test_split_deterministic_and_total(spark):
    d = _docs(spark)
    a = {r.doc_id: r.split for r in with_split(d, "doc_id").collect()}
    b = {r.doc_id: r.split for r in with_split(d, "doc_id").collect()}
    assert a == b
    assert len(a) == 500
    assert set(a.values()) <= {"train", "val", "test"}


def test_split_proportions(spark):
    got = {r.split: r.n_rows for r in split_counts(_docs(spark, 2000), "doc_id").collect()}
    assert abs(got["train"] - 1600) < 120
    assert abs(got.get("val", 0) - 200) < 80
    assert abs(got.get("test", 0) - 200) < 80


def test_split_group_key_no_leakage(spark):
    # hashing a group key keeps all rows of a group in one split
    d = _docs(spark, 300).withColumn("grp", F.col("doc_id") % 30)
    s = with_split(d, "grp")
    n = (
        s.groupBy("grp")
        .agg(F.countDistinct("split").alias("k"))
        .where(F.col("k") > 1)
        .count()
    )
    assert n == 0


def test_split_salt_changes_assignment(spark):
    d = _docs(spark, 400)
    a = {r.doc_id: r.split for r in with_split(d, "doc_id", salt="s1").collect()}
    b = {r.doc_id: r.split for r in with_split(d, "doc_id", salt="s2").collect()}
    assert any(a[k] != b[k] for k in a)


def test_split_bad_weights(spark):
    try:
        with_split(_docs(spark, 1), "doc_id", weights={"a": 0.5, "b": 0.2})
        raise AssertionError("expected ValueError")
    except ValueError:
        pass


def test_stratified_sample_deterministic_and_rates(spark):
    import hashlib

    from aroma_spark.operators.splits import stratified_sample

    d = spark.range(2000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 2 == 0, "en").otherwise("fr").alias("lang"),
    )
    fr = {"en": 0.1, "fr": 0.9}
    got = {r.doc_id for r in stratified_sample(d, "doc_id", "lang", fr).collect()}
    # pure function of the key: python twin agrees row-for-row
    for i in range(2000):
        u = int(hashlib.md5(f"sample:{i}".encode()).hexdigest()[:8], 16) / 2**32
        keep = u < fr["en" if i % 2 == 0 else "fr"]
        assert (i in got) == keep
    # unknown strata fall back to default_fraction=0.0
    d2 = d.withColumn("lang", F.lit("zz"))
    assert stratified_sample(d2, "doc_id", "lang", fr).count() == 0


def test_split_leakage_audit(spark):
    from aroma_spark.operators.splits import split_leakage_audit

    df = spark.createDataFrame(
        [(i,) for i in range(50)] + [(7,)],  # key 7 duplicated
        "doc_id long",
    )
    out = split_leakage_audit(df).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["n_keys"], r["n_rows"]) == (50, 51)
    assert r["n_train"] + r["n_val"] + r["n_test"] == 51
    # hash-derived labels: a duplicated key lands in ONE split, so
    # exclusivity holds even with upstream duplication
    assert r["n_multi_label"] == 0
    assert r["complete"] is True
