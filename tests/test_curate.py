"""Curation flagship: per-stage semantics, checkpoint/resume, lineage."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from aroma_spark.plans.curate import (
    STAGE_ORDER,
    curate_corpus,
    curate_stages,
    curate_stats,
)


@pytest.fixture(scope="module")
def corpus(spark):
    """30 docs covering every stage's drop reason: exact dups, near dups,
    too-short / non-alpha (quality), degenerate repetition, plus a body
    of ordinary docs spread across the hash split."""
    base = "the quick brown fox jumps over the lazy dog near the river bank"
    rows = [
        (0, base),
        (1, base),                        # exact dup of 0 -> dies at `exact`
        (2, base + " today"),             # near dup of 0 -> candidate at `near`
        (3, "1 2 3"),                     # numeric, short -> dies at `quality`
        (4, "spam " * 30),                # degenerate repetition -> `quality`
    ]
    rows += [
        (i, f"document number {i} talks about topic {i % 7} in plain "
            f"english words with enough variety to pass the quality gates")
        for i in range(5, 30)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _stats_dict(df):
    return {r["stage"]: r["n_rows"] for r in df.collect()}


def test_stage_semantics(spark, corpus):
    s = _stats_dict(curate_stats(corpus))
    assert set(s) == set(STAGE_ORDER)
    assert s["input"] == 30
    assert s["exact"] == 29            # doc 1 collapses into doc 0
    assert s["near"] <= s["exact"]
    assert s["quality"] <= s["near"] - 2   # docs 3 and 4 die here
    assert s["train"] <= s["quality"]
    assert s["decontam"] <= s["train"]
    assert s["packed"] >= 1

    # doc 3 (numeric) and doc 4 (repetition) must not survive quality
    frames = curate_stages(corpus)
    alive = {r["doc_id"] for r in frames["quality"].collect()}
    assert 3 not in alive and 4 not in alive
    assert 0 in alive  # exact-dup survivor is the min id


def test_curate_corpus_resume(spark, corpus, tmp_path):
    root = str(tmp_path / "curated")
    m1 = curate_corpus(spark, corpus, root)
    assert [m1[s]["skipped"] for s in STAGE_ORDER] == [False] * 7

    # materialized rows match the pure stats query stage-for-stage
    s = _stats_dict(curate_stats(corpus))
    for name in STAGE_ORDER[:-1]:
        assert m1[name]["rows"] == s[name], name
    packed = spark.read.parquet(f"{root}/stage=packed")
    n_bins = packed.select("bucket", "bin_idx").distinct().count()
    assert n_bins == s["packed"]

    # rerun: everything fresh -> every stage skipped, rows preserved
    m2 = curate_corpus(spark, corpus, root)
    assert [m2[s_]["skipped"] for s_ in STAGE_ORDER] == [True] * 7
    assert all(m2[n]["rows"] == m1[n]["rows"] for n in STAGE_ORDER)

    # crash simulation: stage=decontam vanishes mid-job -> resume
    # recomputes decontam and packed only, reading train from parquet
    from aroma_spark.plans.checkpoint import fs_delete

    fs_delete(spark, f"{root}/stage=decontam")
    m3 = curate_corpus(spark, corpus, root)
    assert [m3[s_]["skipped"] for s_ in STAGE_ORDER] == (
        [True] * 4 + [True, False, False]
    )
    assert all(m3[n]["rows"] == m1[n]["rows"] for n in STAGE_ORDER)


def test_curate_corpus_input_change_invalidates(spark, corpus, tmp_path):
    root = str(tmp_path / "curated2")
    curate_corpus(spark, corpus, root)
    grown = corpus.unionByName(
        spark.createDataFrame(
            [(99, "a brand new document with perfectly ordinary text inside")],
            "doc_id long, text string",
        )
    )
    m = curate_corpus(spark, grown, root)
    assert [m[s]["skipped"] for s in STAGE_ORDER] == [False] * 7
    assert m["input"]["rows"] == 31


def test_cli_curate_job(spark, corpus, tmp_path, monkeypatch, capsys):
    import json

    from aroma_spark import cli

    in_dir = str(tmp_path / "docs_in")
    corpus.write.parquet(in_dir)
    out_root = str(tmp_path / "curated_cli")
    monkeypatch.setattr(
        "sys.argv",
        ["cli.py", "--job", "curate", "--input", in_dir, "--out", out_root],
    )
    # keep the session-scoped fixture alive: reuse it and no-op stop()
    monkeypatch.setattr(cli, "get_spark", lambda *a, **k: spark)
    monkeypatch.setattr(spark, "stop", lambda: None)
    cli.main()
    metrics = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert metrics["input"]["rows"] == 30
    assert not metrics["packed"]["skipped"]


def test_curate_corpus_param_change_invalidates(spark, corpus, tmp_path):
    # different thresholds/budgets must recompute, not reuse old stages
    root = str(tmp_path / "curated3")
    curate_corpus(spark, corpus, root)
    m = curate_corpus(spark, corpus, root, pack_budget=64)
    assert [m[s]["skipped"] for s in STAGE_ORDER] == [False] * 7
