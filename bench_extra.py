"""Round-6 optimization harness — NOT the driver bench (bench.py is frozen).

Per-query isolation per the optimization guide §1.4: each declared bench
query is timed twice per mode — ``count`` (the frozen bench.py methodology)
and ``noop`` (``df.write.format("noop")`` — computes every column, no sink
cost) — and its ``explain("formatted")`` is dumped to ``plans/r06/``.

Usage:
    python bench_extra.py [--sf DIR] [--runs N] [--tag before|after]
                          [--queries a,b,c] [--phases] [--no-plans]

``--phases`` additionally times the bench.py ann/ivf/curate sub-phases
(the non-query wall hogs at sf1.0).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entrymod
from aroma_spark.session import get_spark

BENCH_QUERIES = [
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
    "ohlc_1h",
    "rolling_1h",
    "m4_downsample_1h",
    "twa_1h",
]


def _noop(df):
    df.write.format("noop").mode("overwrite").save()


def _median(xs):
    s = sorted(xs)
    return s[len(s) // 2] if len(s) % 2 else (s[len(s) // 2 - 1] + s[len(s) // 2]) / 2


def time_fn(fn, runs, warmups=1):
    for _ in range(warmups):
        fn()
    walls = []
    for _ in range(runs):
        t0 = time.time()
        fn()
        walls.append(round(time.time() - t0, 3))
    return walls


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--tag", default="before")
    ap.add_argument("--queries", default=None)
    ap.add_argument("--phases", action="store_true")
    ap.add_argument("--lattice", action="store_true")
    ap.add_argument("--no-plans", action="store_true")
    ap.add_argument("--no-noop", action="store_true")
    args = ap.parse_args()

    spark = get_spark("aroma-bench-extra")
    spark.sparkContext.setLogLevel("ERROR")
    sf_dir = args.sf
    plans_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), "plans", "r06")
    os.makedirs(plans_dir, exist_ok=True)

    qs = entrymod.queries()
    names = args.queries.split(",") if args.queries else BENCH_QUERIES
    out: dict = {"sf_dir": sf_dir, "tag": args.tag, "queries": {}}

    if args.lattice or not args.queries:
        from aroma_spark.operators.tiers import rollup_lattice

        def lattice():
            tiers = rollup_lattice(entrymod._signals(spark, sf_dir))
            return sum(df.count() for df in tiers.values())

        spark.sparkContext.setJobDescription("rollup_lattice")
        walls = time_fn(lattice, args.runs)
        out["queries"]["rollup_lattice"] = {"count": walls, "median": _median(walls)}
        print(f"rollup_lattice count={walls}", flush=True)
        if not args.no_plans:
            import io
            from contextlib import redirect_stdout

            tiers = rollup_lattice(entrymod._signals(spark, sf_dir))
            with open(f"{plans_dir}/rollup_lattice_{args.tag}.txt", "w") as f:
                for tn, df in tiers.items():
                    buf = io.StringIO()
                    with redirect_stdout(buf):
                        df.explain("formatted")
                    f.write(f"=== tier {tn} ===\n{buf.getvalue()}\n")

    for name in names:
        if name not in qs:
            continue
        q = qs[name]
        spark.sparkContext.setJobDescription(name)
        cw = time_fn(lambda: q(spark, sf_dir).count(), args.runs)
        nw = (
            []
            if args.no_noop
            else time_fn(lambda: _noop(q(spark, sf_dir)), args.runs)
        )
        out["queries"][name] = {
            "count": cw,
            "noop": nw,
            "median_count": _median(cw),
            "median_noop": _median(nw) if nw else None,
        }
        print(f"{name} count={cw} noop={nw}", flush=True)
        if not args.no_plans:
            import io
            from contextlib import redirect_stdout

            buf = io.StringIO()
            with redirect_stdout(buf):
                q(spark, sf_dir).explain("formatted")
            with open(f"{plans_dir}/{name}_{args.tag}.txt", "w") as f:
                f.write(buf.getvalue())
    spark.sparkContext.setJobDescription(None)

    if args.phases:
        from pyspark.sql import functions as F

        from aroma_spark.operators.similarity import (
            ann_recall,
            brute_force_pairs,
            brute_force_topk,
            ivf_recall,
            kmeans_codebook,
        )
        from aroma_spark.sources.transcripts import load_table

        emb = load_table(spark, sf_dir, "embeddings")
        phases = {}
        t0 = time.time()
        truth = brute_force_pairs(emb, 0.5).persist()
        n_truth = truth.count()
        phases["bf_pairs"] = round(time.time() - t0, 3)
        for (L, b) in ((1, 8), (8, 4), (32, 8)):
            t0 = time.time()
            r = ann_recall(emb, b, 64, 0.5, truth, n_bands=L)
            phases[f"ann_recall_b{L}p{b}"] = round(time.time() - t0, 3)
            print(f"ann_recall bands{L}_planes{b} recall={r}", flush=True)
        truth.unpersist()

        t0 = time.time()
        qd = emb.where((F.col("vec_id") >= 100) & (F.col("vec_id") < 300))
        topk_truth = brute_force_topk(emb, qd, k=5).persist()
        topk_truth.count()
        phases["bf_topk"] = round(time.time() - t0, 3)
        t0 = time.time()
        cb = kmeans_codebook(emb, n_centroids=16)
        phases["kmeans_train"] = round(time.time() - t0, 3)
        for n_probe in (4, 8):
            for label, cents in (("placeholder", None), ("kmeans", cb)):
                t0 = time.time()
                r = ivf_recall(emb, qd, 5, 16, n_probe, centroids=cents, truth=topk_truth)
                phases[f"ivf_{label}_p{n_probe}"] = round(time.time() - t0, 3)
                print(f"ivf {label} probe{n_probe} recall={r}", flush=True)
        topk_truth.unpersist()

        import shutil
        import tempfile

        from aroma_spark.plans.curate import curate_corpus

        docs = load_table(spark, sf_dir, "documents")
        outd = tempfile.mkdtemp(prefix="bx_curate_")
        try:
            t0 = time.time()
            m = curate_corpus(spark, docs, outd)
            phases["curate_total"] = round(time.time() - t0, 3)
            phases["curate_stages"] = {k: v["wall_sec"] for k, v in m.items()}
        finally:
            shutil.rmtree(outd, ignore_errors=True)
        out["phases"] = phases
        print(json.dumps(phases), flush=True)

    fname = f"/tmp/bx_{args.tag}_{os.path.basename(sf_dir.rstrip('/'))}.json"
    with open(fname, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({k: v.get("median_count", v.get("median")) for k, v in out["queries"].items()}))
    print(f"written {fname}")
    spark.stop()


if __name__ == "__main__":
    main()
