"""spark-submit entry point.

Cluster usage (the 10^12-turn deployment shape)::

    zip -r aroma_spark.zip aroma_spark
    spark-submit --py-files aroma_spark.zip \
        --conf spark.sql.adaptive.enabled=true \
        aroma_spark/cli.py --input <table-or-path> --out <warehouse-root>

    # training-corpus curation (documents parquet: doc_id, text)
    spark-submit --py-files aroma_spark.zip \
        aroma_spark/cli.py --job curate --input <docs-path> --out <root>

Sandbox usage::

    python -m aroma_spark.cli --synth-turns 100000 --out /tmp/rollups

Both jobs are resumable: rerunning with the same --out skips every
up-to-date partition (rollup) / stage (curate) via the committed
manifests.
"""

from __future__ import annotations

import argparse
import json

from aroma_spark.session import get_spark
from aroma_spark.plans.pipeline import run_pipeline
from aroma_spark.sources.transcripts import load_transcripts
from aroma_spark.synth import synth_transcripts


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--job",
        choices=("rollup", "curate"),
        default="rollup",
        help="rollup: tier lattice over transcripts; curate: the "
        "dedup->quality->split->decontam->packing corpus pipeline",
    )
    ap.add_argument("--input", help="input parquet path (rollup: conv_id, turn_idx, role, text, tool, ts; curate: doc_id, text)")
    ap.add_argument("--synth-turns", type=int, help="generate N synthetic turns instead of reading --input (rollup only)")
    ap.add_argument("--synth-convs", type=int, default=1000)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--out", required=True, help="warehouse root for outputs + manifests")
    ap.add_argument("--master", default=None)
    ap.add_argument("--no-dedup", action="store_true")
    ap.add_argument("--pack-budget", type=int, default=256)
    ap.add_argument("--pack-buckets", type=int, default=16)
    args = ap.parse_args()

    spark = get_spark(f"aroma-{args.job}", master=args.master)
    spark.sparkContext.setLogLevel("WARN")

    if args.job == "curate":
        if not args.input:
            ap.error("--job curate requires --input (documents parquet)")
        from aroma_spark.plans.curate import curate_corpus

        docs = spark.read.parquet(args.input)
        metrics = curate_corpus(
            spark,
            docs,
            args.out,
            pack_budget=args.pack_budget,
            pack_buckets=args.pack_buckets,
        )
        print(json.dumps(metrics))
        spark.stop()
        return

    if args.synth_turns:
        transcripts = synth_transcripts(
            spark, n_turns=args.synth_turns, n_convs=args.synth_convs, seed=args.seed
        )
    elif args.input:
        transcripts = load_transcripts(spark, args.input)
    else:
        ap.error("one of --input / --synth-turns is required")

    metrics = run_pipeline(spark, transcripts, args.out, dedup=not args.no_dedup)
    print(json.dumps(metrics))
    spark.stop()


if __name__ == "__main__":
    main()
