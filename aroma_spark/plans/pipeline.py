"""End-to-end rollup job orchestration — the spark-submit entry.

normalize -> signals -> (optional codec blobs) -> incremental tier
lattice with checkpoints -> metrics. This is the job that runs at
10^12-turn scale via ``spark-submit --py-files aroma_spark.zip
-m aroma_spark.cli`` (see aroma_spark/cli.py).
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, SparkSession

from aroma_spark.operators.normalize import normalize_for_rollup
from aroma_spark.operators.signals import with_signals
from aroma_spark.plans.checkpoint import incremental_rollup


def run_pipeline(
    spark: SparkSession,
    transcripts: DataFrame,
    out_root: str,
    dedup: bool = True,
    encode_blobs: bool = True,
) -> dict:
    """Run the full rollup pipeline; returns the metrics manifest.

    One logical plan: the normalize/dedup shuffle and the conv_id signal
    window are the only wide stages before the per-tier aggregations;
    the lattice re-aggregates materialized tiers so each higher tier
    reads orders of magnitude fewer rows.
    """
    t0 = time.time()
    # normalize_for_rollup replaces the text payload with
    # (xxhash64, length) BEFORE the dedup exchange — the engine's
    # largest shuffle carries ~16B/row instead of the text
    sig = with_signals(normalize_for_rollup(transcripts, dedup=dedup))
    # nothing downstream needs the text payload (the tier aggregates
    # text_len, blobs encode inter_time_us): prune it before the fan-out
    # — caching the payload column measurably destroyed scaling.
    sig = sig.select(
        "conv_id", "turn_idx", "ts", "inter_time_us", "text_len", "tool_call"
    )
    if encode_blobs:
        # the signal frame feeds two actions (1m tier + blob encode):
        # persist so the dedup exchange + window run once.
        sig = sig.persist()
    # change detection fingerprints the raw source (narrow scan); the
    # dedup+window pipeline runs once, inside the 1m tier.
    timings: dict = {}
    metrics = incremental_rollup(
        spark, sig, out_root, source=transcripts, timings=timings
    )
    blob_stats = None
    if encode_blobs:
        # north_rule: delta-of-delta timestamps + Gorilla XOR signals in
        # vectorized Arrow UDFs — materialized per (conv, day) blob.
        from pyspark.sql import functions as F

        from aroma_spark.operators.codec_ops import encode_series

        t_b = time.time()
        # cached signal partitions are conv-hashed and (conv, turn)-sorted
        # from the window — but the zero-shuffle encode path additionally
        # needs ts monotone in turn_idx per conversation (else (conv, day)
        # groups are non-contiguous and blob stitching would emit
        # duplicate (conv, day) rows). inter_time_us < 0 anywhere is
        # exactly that violation. Probe with a full aggregate, not
        # filter().isEmpty(): isEmpty is a limit(1) whose partition ramp
        # (1, 4, 16... tasks) materializes the cache nearly serially on
        # its first waves — min() materializes it at full parallelism.
        min_it = sig.agg(F.min("inter_time_us")).first()[0]
        monotone = min_it is None or min_it >= 0
        blobs = encode_series(sig, "inter_time_us", assume_clustered=monotone)
        # blob stats ride the write job (Observation) — the previous
        # read-back-and-aggregate was a full extra scan of what we just
        # wrote, i.e. one more serial job barrier in the spark-submit
        # path (and in every scaling-bench run)
        from pyspark.sql import Observation

        obs = Observation("blob_stats")
        blobs = blobs.observe(
            obs,
            F.count(F.lit(1)).alias("n_blobs"),
            F.sum("n").alias("n_values"),
            F.sum(
                F.octet_length("ts_blob") + F.octet_length("val_blob")
            ).alias("blob_bytes"),
        )
        blobs.write.mode("overwrite").parquet(f"{out_root}/blobs")
        enc = obs.get
        blob_stats = {
            "n_blobs": enc["n_blobs"],
            "n_values": enc["n_values"],
            "blob_bytes": enc["blob_bytes"],
            "compression_ratio": round(
                enc["blob_bytes"] / (16 * enc["n_values"]), 4
            )
            if enc["n_values"]
            else None,
            "wall_sec": round(time.time() - t_b, 3),
        }
    total_points = sum(m["row_count"] for m in metrics.values())
    # wall stops here: everything below is session teardown (cache
    # eviction), not pipeline work — a cluster-wide blocking barrier
    # that belongs to the harness, not the throughput
    wall = time.time() - t0
    if encode_blobs:
        # blocking so repeated invocations in one session (benchmarks,
        # notebooks) never stack cached copies of the signal frame
        sig.unpersist(blocking=True)
    return {
        "tiers": metrics,
        "fingerprint_wall": timings.get("fingerprint_wall"),
        "codec_blobs": blob_stats,
        "total_rollup_points": total_points,
        "wall_sec": round(wall, 3),
        "points_per_sec": round(total_points / wall, 1) if wall else None,
    }
