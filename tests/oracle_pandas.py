"""Pure pandas/numpy re-implementation of the reference semantics.

Golden-oracle for the Spark operators, re-deriving the reference's
behavior cited in SURVEY.md §2 (torch/redcat are not installable here,
so the reference's own suite can't run — these functions transcribe its
*semantics*, each pinned by the reference's unit tests):

- inter_times: diff with first element prepended -> first inter-time 0
  (reference: src/aroma/preprocessing/intertimes.py:83-104);
- padded-tail behavior: diff over padded tensors yields the documented
  garbage at the boundary (intertimes.py docstring values, asserted in
  tests/unit/preprocessing/test_intertimes.py:46-56);
- vocab sort_by_count: (count, token) tuple sort, reverse=True -> ties
  break token-DESC (src/aroma/utils/vocab.py:289-327);
- most_common(k), add/sub Counter semantics (vocab.py:236-287, 356-381);
- duplicate removal: sort then full-record unique, first survivor
  (src/aroma/datasets/breakfast.py:597-618).
"""

from __future__ import annotations

from collections import Counter

import numpy as np
import pandas as pd


def inter_times(times: np.ndarray) -> np.ndarray:
    """Reference W1: diff(prepend=first) -> it[0] = 0."""
    t = np.asarray(times, dtype=np.float64)
    if len(t) == 0:
        return t
    return np.diff(t, prepend=t[:1])


def inter_times_padded(padded: np.ndarray) -> np.ndarray:
    """Reference W1a: diff over already-padded (batch, seq) rows —
    reproduces the garbage at the pad boundary."""
    p = np.asarray(padded, dtype=np.float64)
    return np.diff(p, axis=1, prepend=p[:, :1])


def vocab_sort_by_count(counts: Counter) -> list[str]:
    return [
        tok
        for tok, _ in sorted(
            counts.items(), key=lambda kv: (kv[1], kv[0]), reverse=True
        )
    ]


def vocab_sort_by_token(counts: Counter, descending: bool = False) -> list[str]:
    return sorted(counts, reverse=descending)


def vocab_most_common(counts: Counter, k: int) -> list[str]:
    # engine adds the token-desc tie-break for distributed determinism
    return vocab_sort_by_count(counts)[:k]


def signals_frame(pdf: pd.DataFrame) -> pd.DataFrame:
    """Per-turn signal oracle over a (conv_id, turn_idx, text, tool, ts) frame."""
    pdf = pdf.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    us = pdf["ts"].astype("datetime64[us]").astype("int64")
    out = pdf.copy()
    out["inter_time_us"] = (
        us.groupby(pdf["conv_id"]).diff().fillna(0).astype("int64")
    )
    out["text_len"] = pdf["text"].fillna("").str.len().astype("int64")
    out["tool_call"] = (
        pdf["tool"].notna() & (pdf["tool"] != "")
    ).astype("int64")
    return out


def rollup(sig: pd.DataFrame, freq: str) -> pd.DataFrame:
    g = sig.assign(bucket_ts=sig["ts"].dt.floor(freq)).groupby(
        ["conv_id", "bucket_ts"], as_index=False
    )
    return g.agg(
        n_points=("ts", "size"),
        sum_latency_us=("inter_time_us", "sum"),
        min_latency_us=("inter_time_us", "min"),
        max_latency_us=("inter_time_us", "max"),
        sum_text_len=("text_len", "sum"),
        sum_tool_calls=("tool_call", "sum"),
        first_ts=("ts", "min"),
        last_ts=("ts", "max"),
    )
