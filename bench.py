"""Benchmark harness — one JSON line for the driver.

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS]. The headline metric is
rolled-up points/sec across the raw->1m->1h->1d lattice (BASELINE.json):
total tier output rows / wall time of the full pipeline.

Set BENCH_SCALING=1 to also run the flagship job at local[8] vs
local[32] and report scaling efficiency (sandbox proxy for N vs 4N
executors; results also land in BENCH/BASELINE.md via
scripts/bench_scaling.py).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entrymod
from aroma_spark.session import get_spark


def _run(fn, *args):
    t0 = time.time()
    n = fn(*args).count()
    return time.time() - t0, n


def rollup_pipeline_points(spark, sf_dir: str) -> int:
    """Full lattice materialization; returns total rolled-up points."""
    from aroma_spark.operators.tiers import rollup_lattice

    tiers = rollup_lattice(entrymod._signals(spark, sf_dir))
    total = 0
    for df in tiers.values():
        total += df.count()
    return total


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    spark = get_spark("aroma-bench")
    spark.sparkContext.setLogLevel("ERROR")

    queries: dict[str, float] = {}
    qs = entrymod.queries()
    t0_all = time.time()

    # headline: full tier lattice — one warmup (JIT/codegen/page cache,
    # this box's first-touch page path is slow and noisy) then the
    # measured steady-state run
    rollup_pipeline_points(spark, sf_dir)
    t0 = time.time()
    total_points = rollup_pipeline_points(spark, sf_dir)
    lattice_sec = time.time() - t0
    queries["rollup_lattice"] = round(lattice_sec, 3)

    for name in (
        "signals",
        "gapfill_1h",
        "codec_roundtrip",
        "dedup_exact",
        "vocab_role",
        "encode_roles",
        "sessionize",
        "doc_minhash_pairs",
        "ann_topk",
        "pack_nextfit",
        "doc_dup_clusters",
    ):
        if name in qs:
            sec, _ = _run(qs[name], spark, sf_dir)
            queries[name] = round(sec, 3)

    # ANN recall vs exact ground truth (VERDICT r1 item 8): quantifies
    # the n_planes knob. Ground truth is one quadratic pass, persisted
    # across the sweep.
    t0 = time.time()
    from aroma_spark.operators.similarity import ann_recall, brute_force_pairs
    from aroma_spark.sources.transcripts import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    min_cos = 0.5
    truth = brute_force_pairs(emb, min_cos).persist()
    n_truth = truth.count()
    ann = {
        "min_cosine": min_cos,
        "n_true_pairs": n_truth,
        "recall": {
            f"bands{L}_planes{b}": (
                round(r, 4)
                if (r := ann_recall(emb, b, 64, min_cos, truth, n_bands=L))
                is not None
                else None
            )
            for (L, b) in ((1, 8), (8, 4), (32, 8))
        },
        "sec": None,
    }
    truth.unpersist()
    ann["sec"] = round(time.time() - t0, 3)

    # surface the committed two-parallelism scaling measurement
    # (scripts/bench_scaling.py -> BENCH/BASELINE.md) in the round JSON
    scaling = None
    try:
        raw = None
        with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "BENCH", "BASELINE.md")) as f:
            for line in f:
                if line.startswith("Raw runs:"):
                    raw = json.loads(line[len("Raw runs:"):].strip())
        if raw:
            med = {
                c: sorted(x["pps"] for x in rs)[len(rs) // 2]
                for c, rs in raw.items()
            }
            best = {c: max(x["pps"] for x in rs) for c, rs in raw.items()}
            scaling = {
                "levels_pps_median": med,
                "levels_pps_best": best,
                "efficiency_2to8_median": round((med["8"] / med["2"]) / 4, 3),
                "efficiency_2to8_best": round((best["8"] / best["2"]) / 4, 3),
                "efficiency_8to32_median": round((med["32"] / med["8"]) / 4, 3),
                "criterion": ">=0.8 N->4N",
            }
    except Exception:
        pass

    points_per_sec = total_points / lattice_sec if lattice_sec else 0.0
    out = {
        "metric": "rolled-up points/sec across raw->1m->1h->1d tiers",
        "value": round(points_per_sec, 1),
        "unit": "points/sec",
        "queries": queries,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "total_rollup_points": total_points,
        "ann_recall": ann,
        "scaling": scaling,
        "wall_sec_total": round(time.time() - t0_all, 3),
    }
    spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
