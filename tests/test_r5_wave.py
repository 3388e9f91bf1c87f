"""Round-5 second wave: Bollinger bands, arrival lateness,
role transitions, edit-distance-verified dedup pairs, TF-IDF.

Pinned expectations hand-computed from tiny synthetic frames (the
reference's test style: literal expected values, reference:
tests/unit/datasets/test_breakfast.py); sf-scale hash parity lives in
the driver oracles (bollinger_1h / lateness_1h / role_transitions /
dedup_editdist_pairs / doc_tfidf).
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from aroma_spark.functions.text import tfidf_terms
from aroma_spark.operators.dedup import editdist_verified_pairs
from aroma_spark.operators.lateness import arrival_lateness, lateness_profile
from aroma_spark.operators.rolling import bollinger_bands
from aroma_spark.operators.sessions import role_transitions


# ---------------------------------------------------------------- bollinger


def _tier(spark, values, conv="a"):
    # minute-spaced buckets: the window is a row frame over PRESENT
    # buckets, so only the ordering matters (and i stays < 60)
    rows = [
        (conv, f"2024-01-01 00:{i:02d}:00", v) for i, v in enumerate(values)
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, bucket_ts string, sum_text_len long"
    )
    return df.withColumn("bucket_ts", F.to_timestamp("bucket_ts"))


def test_bollinger_hand_computed(spark):
    # values 1, 2, 3 with a 2-bucket trailing window
    out = (
        bollinger_bands(_tier(spark, [1, 2, 3]), n_buckets=2, k=2.0)
        .orderBy("bucket_ts")
        .collect()
    )
    assert [r.w_n for r in out] == [1, 2, 2]
    # bucket 0: n=1, mean=1, sd=0
    assert out[0].mean == 1.0 and out[0].sd == 0.0
    assert out[0].upper == 1.0 and out[0].lower == 1.0
    # bucket 1: window {1,2}: mean=1.5, sd=sqrt(2*5-9)/2=0.5
    assert out[1].mean == 1.5 and out[1].sd == 0.5
    assert out[1].upper == 2.5 and out[1].lower == 0.5
    # bucket 2: window {2,3}: mean=2.5, sd=0.5
    assert out[2].mean == 2.5 and out[2].sd == 0.5


def test_bollinger_window_caps_at_n_buckets(spark):
    out = bollinger_bands(_tier(spark, [10] * 30), n_buckets=24).collect()
    assert max(r.w_n for r in out) == 24
    assert all(r.sd == 0.0 and r.mean == 10.0 for r in out)


# ---------------------------------------------------------------- lateness


def _events(spark, rows):
    """rows: (event_id, user_id, ts_str)."""
    df = spark.createDataFrame(rows, "event_id long, user_id long, ts string")
    return df.withColumn("ts", F.to_timestamp("ts"))


def test_arrival_lateness_flags_out_of_order(spark):
    ev = _events(
        spark,
        [
            (1, 7, "2024-01-01 00:00:00"),
            (2, 7, "2024-01-01 00:10:00"),
            # arrives third but its event time is 4 minutes behind the
            # high-water mark set by event 2
            (3, 7, "2024-01-01 00:06:00"),
            (4, 7, "2024-01-01 00:20:00"),
        ],
    )
    out = {r.event_id: r.lateness_us for r in arrival_lateness(ev).collect()}
    assert out == {1: 0, 2: 0, 3: 4 * 60 * 1_000_000, 4: 0}


def test_lateness_profile_counts(spark):
    ev = _events(
        spark,
        [
            (1, 7, "2024-01-01 00:00:00"),
            (2, 7, "2024-01-01 00:10:00"),
            (3, 7, "2024-01-01 00:06:00"),
            (4, 8, "2024-01-01 00:01:00"),  # other conv, in order
        ],
    )
    out = lateness_profile(ev, unit="hour").collect()
    assert len(out) == 1
    r = out[0]
    assert r.n_events == 4
    assert r.n_late == 1
    assert r.n_convs_late == 1
    assert r.max_lateness_us == 4 * 60 * 1_000_000
    assert r.sum_lateness_us == 4 * 60 * 1_000_000


def test_lateness_is_per_conversation(spark):
    # conv 8's event time is far behind conv 7's — but in-order within
    # its own conversation, so lateness stays 0 (per-key high-water mark)
    ev = _events(
        spark,
        [
            (1, 7, "2024-01-01 12:00:00"),
            (2, 8, "2024-01-01 00:00:00"),
            (3, 8, "2024-01-01 00:01:00"),
        ],
    )
    assert all(
        r.lateness_us == 0 for r in arrival_lateness(ev).collect()
    )


# ------------------------------------------------------------- transitions


def test_role_transitions_counts(spark, tiny_transcripts):
    out = {
        (r.prev_role, r.role): (r.n_transitions, r.n_convs)
        for r in role_transitions(tiny_transcripts).collect()
    }
    # conv a: user->assistant->tool->user; conv b (with its duplicated
    # first row): user->user, user->assistant; conv c: single turn
    assert out[("user", "assistant")] == (2, 2)
    assert out[("assistant", "tool")] == (1, 1)
    assert out[("tool", "user")] == (1, 1)
    assert out[("user", "user")] == (1, 1)
    assert sum(n for n, _ in out.values()) == 5  # edges = rows - convs


# ---------------------------------------------------------------- editdist


def test_editdist_verified_pairs(spark):
    base = "the quick brown fox jumps over the lazy dog again and again"
    docs = spark.createDataFrame(
        [
            (1, base),
            (2, base.replace("dog", "cat")),  # 3 in-place edits
            (3, "completely unrelated text with no shared shingles at all"),
        ],
        "doc_id long, text string",
    )
    out = editdist_verified_pairs(docs, max_dist=5).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.doc_a, r.doc_b) == (1, 2)
    assert r.edit_dist == 3 and r.is_dup
    assert r.len_a == len(base) and r.len_b == len(base)


def test_editdist_threshold_marks_non_dup(spark):
    a = "alpha beta gamma delta epsilon zeta eta theta"
    b = "alpha beta gamma delta epsilon zeta eta iotas XXXXXXXXXX"
    docs = spark.createDataFrame(
        [(1, a), (2, b)], "doc_id long, text string"
    )
    out = editdist_verified_pairs(docs, max_dist=4).collect()
    assert len(out) == 1
    assert out[0].edit_dist > 4 and not out[0].is_dup


# ------------------------------------------------------------------- tfidf


def test_tfidf_hand_computed(spark):
    docs = spark.createDataFrame(
        [(1, "apple banana apple"), (2, "banana cherry"), (3, "cherry")],
        "doc_id long, text string",
    )
    out = {
        (r.doc_id, r.term): (r.tf, r.df, r.tfidf)
        for r in tfidf_terms(docs).collect()
    }
    # N=3; apple: df=1 -> idf=ln(2); banana: df=2 -> idf=ln(4/3);
    # cherry: df=2 -> idf=ln(4/3)
    assert out[(1, "apple")] == (2, 1, round(2 * math.log(2.0), 6))
    assert out[(1, "banana")] == (1, 2, round(math.log(4.0 / 3.0), 6))
    assert out[(2, "cherry")] == (1, 2, round(math.log(4.0 / 3.0), 6))
    assert out[(3, "cherry")][2] == out[(2, "cherry")][2]
    assert len(out) == 5


def test_tfidf_null_and_empty_text(spark):
    docs = spark.createDataFrame(
        [(1, "word"), (2, None), (3, "  ")], "doc_id long, text string"
    )
    out = tfidf_terms(docs).collect()
    # null/blank docs emit no terms but still count in N
    assert len(out) == 1
    r = out[0]
    assert (r.doc_id, r.term, r.tf, r.df) == (1, "word", 1, 1)
    assert r.tfidf == round(math.log(4.0 / 2.0), 6)


# -------------------------------------------------------------------- kpis


def test_conversation_kpis(spark, tiny_transcripts):
    from aroma_spark.operators.sessions import conversation_kpis

    out = {r.conv_id: r for r in conversation_kpis(tiny_transcripts).collect()}
    a = out["a"]
    # conv a: 4 turns, the >1h gap splits 2 sessions, 1 tool call
    assert a.n_turns == 4 and a.n_sessions == 2 and a.n_tool_calls == 1
    assert a.duration_us == (2 * 3600 + 10 * 60 - 0) * 1_000_000
    assert a.sum_text_len == len("hello world") + len("hi") + len(
        "result=42"
    ) + len("thanks bye")
    assert a.n_roles == 3
    c = out["c"]
    assert (c.n_turns, c.n_sessions, c.duration_us, c.n_roles) == (1, 1, 0, 1)
