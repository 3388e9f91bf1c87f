"""Goldens for the round-5d sequence-shape wave: Spearman rank
correlation, role streaks (gaps-and-islands), drawdown-from-peak,
local extrema, outage gaps, activity heatmap."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from aroma_spark.operators.seqshape import (
    activity_heatmap,
    drawdown_stats,
    gap_outages,
    local_extrema,
    longest_role_streak,
    spearman_corr,
)


def _t(spark, rows):
    return spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string,"
        " tool string, ts string",
    ).withColumn("ts", F.to_timestamp("ts"))


def _sig(spark, rows):
    """(conv_id, turn_idx, text_len, inter_time_us) -> signals-shaped df."""
    return spark.createDataFrame(
        rows, "conv_id string, turn_idx int, text_len long, inter_time_us long"
    )


def test_spearman_matches_pandas_with_ties(spark):
    # conv a: monotone increasing -> rho = 1; conv b has ties on both
    # signals -> average-rank handling must match pandas' spearman
    rows = [
        ("a", 0, 1, 10),
        ("a", 1, 2, 20),
        ("a", 2, 3, 30),
        ("a", 3, 4, 40),
        ("b", 0, 5, 100),
        ("b", 1, 5, 50),  # tie on text_len
        ("b", 2, 7, 50),  # tie on inter_time_us
        ("b", 3, 9, 200),
        ("b", 4, 2, 25),
    ]
    out = {
        r["conv_id"]: r["spearman"]
        for r in spearman_corr(_sig(spark, rows)).collect()
    }
    assert out["a"] == 1.0

    def avg_ranks(vals):
        order = sorted(vals)
        return [
            (order.index(v) + 1 + order.index(v) + order.count(v)) / 2
            for v in vals
        ]

    def pearson(xs, ys):
        n = len(xs)
        mx, my = sum(xs) / n, sum(ys) / n
        num = sum((a - mx) * (b - my) for a, b in zip(xs, ys))
        dx = sum((a - mx) ** 2 for a in xs)
        dy = sum((b - my) ** 2 for b in ys)
        return num / math.sqrt(dx * dy)

    b = [(x, y) for c, _, x, y in rows if c == "b"]
    expected = pearson(avg_ranks([x for x, _ in b]),
                       avg_ranks([y for _, y in b]))
    assert math.isclose(out["b"], expected, abs_tol=1e-6)


def test_spearman_constant_signal_null_and_min_pairs(spark):
    rows = [
        ("c", 0, 3, 10),
        ("c", 1, 3, 20),
        ("c", 2, 3, 30),  # constant x -> NULL rho
        ("d", 0, 1, 10),
        ("d", 1, 2, 20),  # only 2 turns -> dropped
    ]
    out = spearman_corr(_sig(spark, rows)).collect()
    assert {r["conv_id"] for r in out} == {"c"}
    assert out[0]["spearman"] is None


def test_longest_role_streak_tiebreak_earliest(spark):
    df = _t(
        spark,
        [
            # a: user x2, assistant x2 -> tie on len 2, earliest wins (user)
            ("a", 0, "user", "x", None, "2024-01-01 00:00:00"),
            ("a", 1, "user", "x", None, "2024-01-01 00:01:00"),
            ("a", 2, "assistant", "x", None, "2024-01-01 00:02:00"),
            ("a", 3, "assistant", "x", None, "2024-01-01 00:03:00"),
            # b: u, a, a, a, u -> assistant streak of 3 starting at 1
            ("b", 0, "user", "x", None, "2024-01-02 00:00:00"),
            ("b", 1, "assistant", "x", None, "2024-01-02 00:01:00"),
            ("b", 2, "assistant", "x", None, "2024-01-02 00:02:00"),
            ("b", 3, "assistant", "x", None, "2024-01-02 00:03:00"),
            ("b", 4, "user", "x", None, "2024-01-02 00:04:00"),
        ],
    )
    out = {r["conv_id"]: r for r in longest_role_streak(df).collect()}
    assert out["a"]["streak_role"] == "user"
    assert out["a"]["streak_len"] == 2
    assert out["a"]["streak_start"] == 0
    assert out["a"]["n_islands"] == 2
    assert out["b"]["streak_role"] == "assistant"
    assert out["b"]["streak_len"] == 3
    assert out["b"]["streak_start"] == 1
    assert out["b"]["n_islands"] == 3


def test_drawdown_and_extrema(spark):
    # series: 5, 3, 8, 2, 6 -> peak 8, max drawdown 8-2=6
    # strict local maxima: 8 (3<8>2); minima: 3 (5>3<8), 2 (8>2<6)
    rows = [
        ("a", 0, 5, 0),
        ("a", 1, 3, 1),
        ("a", 2, 8, 2),
        ("a", 3, 2, 3),
        ("a", 4, 6, 4),
    ]
    dd = drawdown_stats(_sig(spark, rows)).collect()[0]
    assert (dd["n_turns"], dd["peak"], dd["max_drawdown"]) == (5, 8, 6)
    ex = local_extrema(_sig(spark, rows)).collect()[0]
    assert (ex["n_peaks"], ex["n_troughs"]) == (1, 2)


def test_drawdown_monotone_and_plateau_extrema(spark):
    rows = [("m", 0, 1, 0), ("m", 1, 2, 1), ("m", 2, 2, 2), ("m", 3, 3, 3)]
    dd = drawdown_stats(_sig(spark, rows)).collect()[0]
    assert dd["max_drawdown"] == 0
    ex = local_extrema(_sig(spark, rows)).collect()[0]
    # plateau members are neither peaks nor troughs (strict comparisons)
    assert (ex["n_peaks"], ex["n_troughs"]) == (0, 0)


def test_gap_outages_filters_clean_conversations(spark):
    rows = [
        ("a", 0, 1, 0),
        ("a", 1, 1, 400_000_000),  # breach (> 300s)
        ("a", 2, 1, 100_000_000),
        ("b", 0, 1, 0),
        ("b", 1, 1, 299_000_000),  # clean -> not emitted
    ]
    out = gap_outages(_sig(spark, rows), threshold_us=300_000_000).collect()
    assert len(out) == 1
    r = out[0]
    assert r["conv_id"] == "a"
    assert r["n_outages"] == 1
    assert r["max_gap_us"] == 400_000_000
    assert r["sum_outage_us"] == 400_000_000


def test_activity_heatmap_dow_hod(spark):
    # 2024-01-01 was a Monday (dow 0); 2024-01-06 a Saturday (dow 5)
    df = _t(
        spark,
        [
            ("a", 0, "user", "x", None, "2024-01-01 09:30:00"),
            ("b", 0, "user", "x", None, "2024-01-01 09:59:59"),
            ("a", 1, "user", "x", None, "2024-01-06 23:00:00"),
        ],
    )
    out = {(r["dow"], r["hod"]): r for r in activity_heatmap(df).collect()}
    assert set(out) == {(0, 9), (5, 23)}
    assert out[(0, 9)]["n_turns"] == 2
    assert out[(0, 9)]["n_convs"] == 2
    assert out[(5, 23)]["n_turns"] == 1
    assert out[(5, 23)]["n_convs"] == 1


def test_breach_episodes_collapses_consecutive(spark):
    # gaps: 0, 400, 500, 10, 600 (threshold 100): turns 1-2 form one
    # episode (len 2, 900us), turn 4 another (len 1, 600us)
    rows = [
        ("a", 0, 1, 0),
        ("a", 1, 1, 400),
        ("a", 2, 1, 500),
        ("a", 3, 1, 10),
        ("a", 4, 1, 600),
        ("clean", 0, 1, 0),
        ("clean", 1, 1, 50),  # no breach -> not emitted
    ]
    from aroma_spark.operators.seqshape import breach_episodes

    out = breach_episodes(_sig(spark, rows), threshold_us=100).collect()
    assert len(out) == 1
    r = out[0]
    assert r["conv_id"] == "a"
    assert r["n_episodes"] == 2
    assert r["max_episode_len"] == 2
    assert r["total_breach_turns"] == 3
    assert r["sum_breach_us"] == 1500


def test_record_turns_strict_running_max(spark):
    # v = 3,1,4,4,5: records at turns 0 (first), 2 (4>3), 4 (5>4);
    # the repeat 4 at turn 3 is NOT a record (strict >)
    rows = [
        ("a", 0, 3, 0),
        ("a", 1, 1, 1),
        ("a", 2, 4, 2),
        ("a", 3, 4, 3),
        ("a", 4, 5, 4),
    ]
    from aroma_spark.operators.seqshape import record_turns

    r = record_turns(_sig(spark, rows)).collect()[0]
    assert (r["n_turns"], r["n_records"], r["last_record_turn"]) == (5, 3, 4)


def test_longest_monotone_run(spark):
    from aroma_spark.operators.seqshape import longest_monotone_run

    rows = [
        # a: 1,2,3,2,3,4,5 -> runs of 3 and 4 turns -> longest 4
        ("a", 0, 1, 0), ("a", 1, 2, 1), ("a", 2, 3, 2), ("a", 3, 2, 3),
        ("a", 4, 3, 4), ("a", 5, 4, 5), ("a", 6, 5, 6),
        # flat: equal values never increase strictly -> 1
        ("flat", 0, 2, 0), ("flat", 1, 2, 1), ("flat", 2, 2, 2),
        # single turn -> 1
        ("one", 0, 9, 0),
    ]
    out = {
        r["conv_id"]: r for r in longest_monotone_run(_sig(spark, rows)).collect()
    }
    assert out["a"]["longest_inc_run"] == 4
    assert out["flat"]["longest_inc_run"] == 1
    assert out["one"]["longest_inc_run"] == 1
    assert out["a"]["n_turns"] == 7
