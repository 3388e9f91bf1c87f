"""Sequence packing: concat-and-chunk and next-fit, vs a pandas oracle."""

from __future__ import annotations

import hashlib

import pytest

from aroma_spark.operators.packing import (
    pack_chunks,
    pack_nextfit,
    packing_stats,
)

BUDGET = 10
N_BUCKETS = 2


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "a b c"),                      # 3 tokens
        (2, "one two three four five six seven eight nine ten eleven"),  # 11 (> budget)
        (3, "x y z w v"),                  # 5
        (4, ""),                           # 0 -> dropped
        (5, None),                         # 0 -> dropped
        (6, "t1 t2 t3 t4 t5 t6 t7"),       # 7
        (7, "u1 u2"),                      # 2
        (8, "q1 q2 q3 q4 q5 q6 q7 q8 q9"),  # 9
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _bucket(doc_id: int) -> int:
    h = hashlib.md5(f"pack:{doc_id}".encode()).hexdigest()
    return int(h[:8], 16) % N_BUCKETS


def _tokens(text: str | None) -> int:
    if text is None or not text.strip():
        return 0
    return len(text.split())


def _oracle_streams(rows):
    streams: dict[int, list[tuple[int, int]]] = {}
    for doc_id, text in sorted(rows):
        n = _tokens(text)
        if n > 0:
            streams.setdefault(_bucket(doc_id), []).append((doc_id, n))
    return streams


def test_pack_chunks_matches_oracle(spark, docs):
    got = {
        (r["doc_id"], r["seq_id"]): (
            r["bucket"], r["doc_offset"], r["seq_offset"], r["seg_len"]
        )
        for r in pack_chunks(docs, BUDGET, N_BUCKETS).collect()
    }
    want = {}
    rows = [(r["doc_id"], r["text"]) for r in docs.collect()]
    for bucket, docs_in in _oracle_streams(rows).items():
        cum = 0
        for doc_id, n in docs_in:
            first, last = cum // BUDGET, (cum + n - 1) // BUDGET
            for seq in range(first, last + 1):
                s = max(cum, seq * BUDGET)
                e = min(cum + n, (seq + 1) * BUDGET)
                want[(doc_id, seq)] = (bucket, s - cum, s - seq * BUDGET, e - s)
            cum += n
    assert got == want
    # conservation: every token lands exactly once
    total = sum(v[3] for v in got.values())
    assert total == sum(_tokens(t) for _, t in rows)


def test_pack_nextfit_matches_oracle_and_capacity(spark, docs):
    out = pack_nextfit(docs, BUDGET, N_BUCKETS).collect()
    got = {
        r["doc_id"]: (r["bucket"], r["bin_idx"], r["offset_in_bin"])
        for r in out
    }
    rows = [(r["doc_id"], r["text"]) for r in docs.collect()]
    want = {}
    for bucket, docs_in in _oracle_streams(rows).items():
        bin_idx, fill = 0, 0
        for doc_id, n in docs_in:
            if fill > 0 and fill + n > BUDGET:
                bin_idx += 1
                fill = 0
            want[doc_id] = (bucket, bin_idx, fill)
            fill += n
    assert got == want
    # capacity: no bin exceeds budget unless it holds a single oversize doc
    fills: dict[tuple[int, int], list[int]] = {}
    for r in out:
        fills.setdefault((r["bucket"], r["bin_idx"]), []).append(r["n_tokens"])
    for ns in fills.values():
        assert sum(ns) <= BUDGET or (len(ns) == 1 and ns[0] > BUDGET)


def test_packing_stats(spark, docs):
    packed = pack_nextfit(docs, BUDGET, N_BUCKETS)
    stats = {
        (r["bucket"], r["bin_idx"]): (r["n_docs"], r["fill_tokens"])
        for r in packing_stats(packed, BUDGET).collect()
    }
    assert sum(n for n, _ in stats.values()) == packed.count()
    assert all(f > 0 for _, f in stats.values())


def test_pack_nextfit_string_keys(spark):
    # key_col type must flow into the Arrow schema (was hardcoded long)
    from aroma_spark.operators.packing import pack_nextfit

    docs = spark.createDataFrame(
        [("doc-a", "one two three"), ("doc-b", "four five"), ("doc-c", "six")],
        "doc_key string, text string",
    )
    out = pack_nextfit(docs, budget=4, n_buckets=1, key_col="doc_key")
    rows = {r["doc_key"]: r for r in out.collect()}
    assert set(rows) == {"doc-a", "doc-b", "doc-c"}
    assert all(r["offset_in_bin"] + r["n_tokens"] <= 4 for r in rows.values())
