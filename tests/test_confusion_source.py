"""Goldens for the corpus-report pair: lang-id confusion matrix and
per-source profile (functions/text.py)."""

from __future__ import annotations

from aroma_spark.functions.text import langid_confusion, source_profile


def _docs(spark, rows):
    """rows = (doc_id, text, lang, source, n_chars)."""
    return spark.createDataFrame(
        rows,
        "doc_id long, text string, lang string, source string, n_chars long",
    )


def test_confusion_diagonal_and_miss(spark):
    # two labeled-en docs: one obvious en, one empty (-> 'und');
    # one labeled-fr doc with clear fr markers
    rows = [
        (1, "the cat and the dog of the town", "en", "s", 31),
        (2, "", "en", "s", 0),
        (3, "le chat et la vache et les autres", "fr", "s", 33),
    ]
    out = {
        (r["lang_true"], r["lang_pred"]): r
        for r in langid_confusion(_docs(spark, rows)).collect()
    }
    assert out[("en", "en")]["n"] == 1
    assert out[("en", "und")]["n"] == 1
    assert out[("en", "en")]["n_true"] == 2
    assert out[("en", "en")]["recall_share"] == 0.5
    assert out[("fr", "fr")]["recall_share"] == 1.0


def test_confusion_shares_sum_per_true_lang(spark):
    rows = [
        (1, "the cat and the dog", "en", "s", 19),
        (2, "xyz", "en", "s", 3),
        (3, "qqq", "en", "s", 3),
    ]
    out = langid_confusion(_docs(spark, rows)).collect()
    assert sum(r["n"] for r in out) == 3
    assert all(r["n_true"] == 3 for r in out)


def test_source_profile_hand_computed(spark):
    rows = [
        (1, "a", "en", "web", 100),
        (2, "b", "en", "web", 200),
        (3, "c", "fr", "web", 300),
        (4, "d", "de", "books", 50),
    ]
    out = {r["source"]: r for r in source_profile(_docs(spark, rows)).collect()}
    web = out["web"]
    assert (web["n_docs"], web["n_langs"], web["total_chars"]) == (3, 2, 600)
    assert (web["top_lang"], web["top_lang_docs"]) == ("en", 2)
    assert web["mean_chars"] == 200.0
    assert (out["books"]["n_docs"], out["books"]["top_lang"]) == (1, "de")


def test_source_profile_top_lang_tie_asc(spark):
    rows = [
        (1, "a", "fr", "s", 10),
        (2, "b", "de", "s", 10),
    ]
    r = source_profile(_docs(spark, rows)).collect()[0]
    assert r["top_lang"] == "de"
