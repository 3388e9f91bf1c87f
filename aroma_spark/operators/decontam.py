"""Decontamination: n-gram overlap of a training corpus against a
held-out / benchmark set.

Benchmark leakage is checked by counting word n-grams a training
document shares with any held-out document (GPT-3's 13-gram and
standard 8-gram decontamination are instances of this shape); documents
over an overlap threshold are dropped from training.

The reference has no analog (its datasets are fixed research corpora);
this is a training-data extension mandated by the task brief, composed
from the same shingle machinery as the dedup family
(operators/dedup.word_shingles).

Scale design (100 TB): the held-out side is a benchmark suite — tiny
relative to the corpus — so its *distinct* shingle set broadcasts and
the corpus shingle stream is filtered map-side (broadcast hash join, no
corpus shuffle); only (doc_id, count) partials reach the exchange. For
a held-out set too large to broadcast, pass ``broadcast_heldout=False``
and the join falls back to a shuffle on the shingle key (AQE handles
skewed shingles).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from aroma_spark.operators.dedup import word_shingles


def ngram_overlap(
    corpus: DataFrame,
    heldout: DataFrame,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    broadcast_heldout: bool = True,
) -> DataFrame:
    """Per corpus document: distinct n-gram count, how many of those
    n-grams appear anywhere in ``heldout``, and the overlap fraction.

    Documents with fewer than ``n`` words have no n-grams and are
    excluded (they carry no overlap evidence either way).
    """
    c_sh = word_shingles(corpus, id_col, text_col, n)
    h_sh = (
        word_shingles(heldout, id_col, text_col, n)
        .select("shingle")
        .distinct()
    )
    h_sh = h_sh.withColumn("__hit", F.lit(1))
    if broadcast_heldout:
        h_sh = F.broadcast(h_sh)
    return (
        c_sh.join(h_sh, "shingle", "left")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_grams"),
            F.sum(F.coalesce(F.col("__hit"), F.lit(0)))
            .cast("long")
            .alias("n_hit"),
        )
        .select(
            id_col,
            "n_grams",
            "n_hit",
            F.round(F.col("n_hit") / F.col("n_grams"), 6).alias("overlap"),
        )
    )


def ngram_overlap_bloom(
    corpus: DataFrame,
    heldout: DataFrame,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    expected_items: int = 1_000_000,
    num_bits: int = 8 * 1024 * 1024,
) -> DataFrame:
    """Bloom-filter variant of :func:`ngram_overlap` for held-out sets
    too large to broadcast exactly: the held-out shingle set folds into
    one ``bloom_filter_agg`` bitmap (num_bits/8 bytes regardless of set
    size), the corpus stream probes it map-side with ``might_contain``.

    Approximate by construction — false positives OVERCOUNT overlap
    (never undercount), so a threshold filter built on it is
    conservative: it can only drop extra docs, never leak a
    contaminated one. Size ``num_bits`` for the target false-positive
    rate (~0.5% at 8M bits / 1M items); the exact path remains the
    oracle-checked default."""
    c_sh = word_shingles(corpus, id_col, text_col, n)
    bloom = (
        word_shingles(heldout, id_col, text_col, n)
        .select(F.xxhash64("shingle").alias("h"))
        .agg(
            F.expr(
                f"bloom_filter_agg(h, {expected_items}L, {num_bits}L)"
            ).alias("bf")
        )
    )
    probed = c_sh.crossJoin(F.broadcast(bloom)).select(
        id_col,
        F.expr("might_contain(bf, xxhash64(shingle))").alias("__hit"),
    )
    return (
        probed.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_grams"),
            F.sum(F.col("__hit").cast("long")).cast("long").alias("n_hit"),
        )
        .select(
            id_col,
            "n_grams",
            "n_hit",
            F.round(F.col("n_hit") / F.col("n_grams"), 6).alias("overlap"),
        )
    )


def contaminated_docs(
    corpus: DataFrame,
    heldout: DataFrame,
    max_overlap: float = 0.1,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Ids of corpus documents exceeding the overlap threshold — the
    drop set of a decontamination pass."""
    ov = ngram_overlap(corpus, heldout, n, id_col, text_col)
    return ov.where(F.col("overlap") > max_overlap).select(id_col, "overlap")
