"""Text analysis functions: tokens, quality, lang-id, fingerprints."""

from __future__ import annotations

import math

import pytest

from aroma_spark.functions.text import fingerprint, lang_id, quality_score, with_text_stats


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "The cat and the dog walked to the park and back again."),
        (1, "Le chat et le chien et la maison et les arbres du parc."),
        (2, "Der Hund und die Katze und das Haus und der Baum hier."),
        (3, "x9 #! 77"),
        (4, ""),
        (5, None),
        (6, "这 是 一个 中文 文档 的 测试 文本 有 很多 字"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_text_stats(spark, docs):
    out = with_text_stats(docs).toPandas().set_index("doc_id")
    assert out.loc[0].n_tokens == 12
    assert out.loc[4].n_tokens == 0 and out.loc[5].n_tokens == 0
    assert out.loc[3].n_digit == 3
    assert math.isclose(
        out.loc[0].alpha_ratio, out.loc[0].n_alpha / out.loc[0].n_chars_calc
    )


def test_quality_score_ranges(spark, docs):
    out = quality_score(docs).toPandas().set_index("doc_id")
    assert out.loc[0].quality_score > 0.9
    assert out.loc[3].quality_score < 0.5
    assert out.loc[4].quality_score == 0.0


def test_lang_id(spark, docs):
    out = lang_id(docs).toPandas().set_index("doc_id").lang_pred
    assert out[0] == "en"
    assert out[1] == "fr"
    assert out[2] == "de"
    assert out[4] == "und" and out[5] == "und"
    assert out[6] == "zh"


def test_fingerprint_normalization(spark):
    rows = [(0, "Hello   World"), (1, "hello world"), (2, "other")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = fingerprint(df).toPandas().set_index("doc_id")
    assert out.loc[0].fp_exact != out.loc[1].fp_exact
    assert out.loc[0].fp_norm == out.loc[1].fp_norm
    assert out.loc[2].fp_norm != out.loc[0].fp_norm
