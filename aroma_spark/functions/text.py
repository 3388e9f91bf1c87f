"""Text analysis for large-scale training-data pipelines.

All pure Catalyst expressions (no UDFs): token counting, quality
scoring, marker-based language ID, document fingerprinting. Each has an
exact DuckDB-SQL twin in __spark_entry__.oracle_sql — integer counts and
single-division doubles keep the two engines bit-identical.

These generalize the reference's scalar layer (SURVEY §2.7: split/strip/
float parsing, src/aroma/datasets/breakfast.py:584-589) to the document
corpus; nothing analogous exists in the reference for lang-id/quality —
they are the training-data extensions mandated by the task brief.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# language marker words -> counted as ' w ' substrings of lower(text).
# Deliberately substring-based (replace-count), not regex, so Spark and
# DuckDB agree byte-for-byte on any unicode input.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": (" the ", " and ", " of ", " to "),
    "fr": (" le ", " la ", " et ", " les "),
    "de": (" der ", " und ", " die ", " das "),
    "es": (" el ", " los ", " las ", " una "),
}


def _count_sub(col: Column, sub: str) -> Column:
    return (
        (F.length(col) - F.length(F.replace(col, F.lit(sub), F.lit(""))))
        / len(sub)
    ).cast("long")


def token_count(col: Column) -> Column:
    """Whitespace token count; '' -> 0."""
    t = F.trim(col)
    return F.when(t == "", F.lit(0)).otherwise(
        F.size(F.split(t, r"\s+"))
    ).cast("long")


def alpha_chars(col: Column) -> Column:
    return (
        F.length(col) - F.length(F.regexp_replace(col, "[A-Za-z]", ""))
    ).cast("long")


def digit_chars(col: Column) -> Column:
    return (
        F.length(col) - F.length(F.regexp_replace(col, "[0-9]", ""))
    ).cast("long")


def space_chars(col: Column) -> Column:
    return _count_sub(col, " ")


def with_text_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(n_chars_calc, n_tokens, n_alpha, n_digit, n_space, alpha_per_token,
    alpha_ratio) — the quality-signal building blocks."""
    c = F.coalesce(F.col(text_col), F.lit(""))
    toks = token_count(c)
    return df.select(
        "*",
        F.length(c).cast("long").alias("n_chars_calc"),
        toks.alias("n_tokens"),
        alpha_chars(c).alias("n_alpha"),
        digit_chars(c).alias("n_digit"),
        F.when(toks > 0, alpha_chars(c).cast("double") / toks).alias(
            "alpha_per_token"
        ),
        F.when(
            F.length(c) > 0, alpha_chars(c).cast("double") / F.length(c)
        ).alias("alpha_ratio"),
    )


def quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Composite [0,1]-ish quality score: favors alphabetic, multi-token
    documents with sane token lengths — the standard cheap pre-filter for
    web-scale corpus cleaning (C4-style heuristics)."""
    s = with_text_stats(df, text_col)
    length_ok = F.when(
        (F.col("n_tokens") >= 5) & (F.col("n_tokens") <= 100000), 1.0
    ).otherwise(0.0)
    alpha_ok = F.coalesce(F.col("alpha_ratio"), F.lit(0.0))
    tok_len = F.coalesce(F.col("alpha_per_token"), F.lit(0.0))
    tok_len_ok = F.when((tok_len >= 2.0) & (tok_len <= 12.0), 1.0).otherwise(0.0)
    return s.select(
        "*",
        ((length_ok + alpha_ok + tok_len_ok) / F.lit(3.0)).alias("quality_score"),
    )


def repetition_score(
    df: DataFrame, text_col: str = "text", n: int = 3
) -> DataFrame:
    """Duplicate word-n-gram fraction per document: ``1 - distinct/total``
    n-grams — the standard boilerplate/looping detector (high values
    flag templated or degenerate text; Gopher/MassiveText-style
    repetition filters are thresholds on exactly this family).

    Pure per-row Catalyst — the gram array is built and both sizes
    taken inside one projection; no explode, no shuffle, scales as a
    map-only pass. The words array materializes once per row (same
    O(len) discipline as ``dedup.word_shingles``).
    """
    words = F.split(F.lower(F.trim(F.coalesce(F.col(text_col), F.lit("")))), r"\s+")
    out = df.withColumn("__words", words)
    # the gram expression guards itself (empty array for short docs):
    # size(__words) < n would otherwise build a descending sequence whose
    # slice(..., i+1, n) with i = -1 errors — relying on the outer
    # CaseWhen's non-strict branch evaluation is optimizer-fragile
    grams = F.expr(
        f"if(size(__words) >= {n}, "
        f"transform(sequence(0, size(__words) - {n}), "
        f"i -> concat_ws(' ', slice(__words, i + 1, {n}))), "
        f"array())"
    )
    total = F.when(F.size("__words") >= n, F.size("__words") - (n - 1)).otherwise(0)
    out = out.withColumn("n_grams_total", total.cast("long")).withColumn(
        "n_grams_distinct",
        F.when(
            F.col("n_grams_total") > 0, F.size(F.array_distinct(grams))
        )
        .otherwise(0)
        .cast("long"),
    )
    return out.drop("__words").withColumn(
        "repetition",
        F.when(
            F.col("n_grams_total") > 0,
            F.round(
                1.0 - F.col("n_grams_distinct") / F.col("n_grams_total"), 6
            ),
        ).otherwise(F.lit(0.0)),
    )


def lang_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Marker-word language ID with CJK-char shortcut; 'und' when no
    marker hits. Pure substring counting — engine-portable."""
    low = F.concat(F.lit(" "), F.lower(F.coalesce(F.col(text_col), F.lit(""))), F.lit(" "))
    scores = {
        lang: sum(
            (_count_sub(low, m) for m in marks), F.lit(0).cast("long")
        )
        for lang, marks in LANG_MARKERS.items()
    }
    cjk = (
        F.length(low)
        - F.length(F.regexp_replace(low, "[一-鿿]", ""))
    ).cast("long")
    best = F.greatest(*scores.values())
    pick = F.lit("und")
    # deterministic priority on ties: en > fr > de > es (fixed dict order)
    for lang in reversed(list(LANG_MARKERS)):
        pick = F.when(scores[lang] == best, F.lit(lang)).otherwise(pick)
    pick = F.when(best == 0, F.lit("und")).otherwise(pick)
    pick = F.when(cjk * 4 > token_count(low), F.lit("zh")).otherwise(pick)
    out = df.select("*", pick.alias("lang_pred"))
    return out


# BPE-ish pre-tokenization: alpha runs | digit runs | single symbols.
# Explicit ASCII whitespace class so Java regex (Spark) and RE2 (DuckDB)
# agree byte-for-byte.
BPE_PATTERN = "[a-z]+|[0-9]+|[^a-z0-9 \\t\\n\\r]"


def bpe_token_count(col: Column) -> Column:
    """Subword-ish token count via the GPT-2-style pre-tokenizer split
    (alpha runs / digit runs / punctuation singletons over lowercased
    text) — the cheap stand-in for a real BPE vocab at corpus scale."""
    return F.size(
        F.regexp_extract_all(
            F.lower(F.coalesce(col, F.lit(""))), F.lit(BPE_PATTERN), 0
        )
    ).cast("long")


ROLL_MOD = 1_000_000_007
ROLL_BASE = 31


def rolling_hash(col: Column) -> Column:
    """Polynomial rolling hash over the document's characters:
    h = fold(h*31 + codepoint) mod 1e9+7 — exact integer arithmetic,
    computed JVM-side via ``aggregate`` over the char array. The classic
    content fingerprint when a cryptographic hash is overkill."""
    chars = F.split(F.coalesce(col, F.lit("")), "")
    return F.aggregate(
        chars,
        F.lit(0).cast("long"),
        lambda acc, c: (acc * ROLL_BASE + F.ascii(c)) % ROLL_MOD,
    )


def fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Content fingerprint: md5 full-text + a normalized fingerprint
    (lowercase, collapsed whitespace) — the classic near-exact key."""
    c = F.coalesce(F.col(text_col), F.lit(""))
    norm = F.trim(F.regexp_replace(F.lower(c), r"\s+", " "))
    return df.select(
        "*",
        F.md5(c).alias("fp_exact"),
        F.md5(norm).alias("fp_norm"),
        rolling_hash(F.col(text_col)).alias("fp_rolling"),
    )
