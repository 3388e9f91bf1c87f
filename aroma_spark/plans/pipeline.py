"""End-to-end rollup job orchestration — the spark-submit entry.

normalize -> signals -> cache -> two independent DAG branches run
CONCURRENTLY (Spark schedules jobs from multiple driver threads onto
the same executors):

- lattice branch: raw fingerprint scan -> incremental raw->1m->1h->1d
  tier writes with checkpoints/manifests
- codec branch: delta-of-delta + Gorilla XOR blob encode + write

Both branches read the one persisted signal frame; neither depends on
the other's output. Overlapping them converts each branch's
low-parallelism seconds (driver manifest commits, micro-tier jobs, the
fingerprint reduce) into useful work for the other branch — measured
on the 40M-turn scaling input, it removed most of the non-scaling
wall identified by scripts/diag_scaling.py. On a real cluster the same
shape holds: a DAG orchestrator would run independent branches
concurrently rather than serializing every job barrier.

This is the job that runs at 10^12-turn scale via ``spark-submit
--py-files aroma_spark.zip -m aroma_spark.cli`` (see aroma_spark/cli.py).
"""

from __future__ import annotations

import threading
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
    # (xxhash64, length) up front, and dedups by ADJACENCY inside the
    # conv_id window sort — the old full-row dedup exchange (the
    # engine's largest shuffle) is gone; dedup and the signal window
    # share ONE exchange + ONE sort (see normalize_for_rollup docstring)
    sig = with_signals(normalize_for_rollup(transcripts, dedup=dedup))
    # nothing downstream needs the text payload (the tier aggregates
    # text_len, blobs encode inter_time_us): prune it before the fan-out
    # — caching the payload column measurably destroyed scaling.
    sig = sig.select(
        "conv_id", "turn_idx", "ts", "inter_time_us", "text_len", "tool_call"
    )
    timings: dict = {}
    blob_stats = None
    if not encode_blobs:
        metrics = incremental_rollup(
            spark, sig, out_root, source=transcripts, timings=timings
        )
    else:
        # the signal frame feeds two branches (tier lattice + blob
        # encode): persist so the dedup exchange + window run once.
        sig = sig.persist()
        from pyspark.sql import functions as F

        # ONE job materializes the cache at full parallelism AND
        # answers the codec fast-path probe AND computes the lattice's
        # change-detection fingerprints (partition_fingerprints with
        # min_col fuses all three). The zero-shuffle encode path needs
        # ts monotone in turn_idx per conversation (else (conv, day)
        # groups are non-contiguous and blob stitching would emit
        # duplicate (conv, day) rows); inter_time_us < 0 anywhere is
        # exactly that violation. A full aggregate — not
        # filter().isEmpty(), whose limit(1) partition ramp (1, 4,
        # 16... tasks) materializes the cache nearly serially.
        # Fingerprinting the post-normalize signal frame is
        # output-sound (see incremental_rollup docstring) and removes
        # the second decode pass over the raw text payload that the
        # old source=transcripts fingerprint scan paid.
        from aroma_spark.plans.checkpoint import partition_fingerprints

        t_fp = time.time()
        fingerprints, min_it = partition_fingerprints(
            sig, min_col="inter_time_us"
        )
        timings["fingerprint_wall"] = round(time.time() - t_fp, 3)
        monotone = min_it is None or min_it >= 0

        blob_box: dict = {}

        def _codec_branch() -> None:
            try:
                from pyspark.sql import Observation

                from aroma_spark.operators.codec_ops import encode_series

                t_b = time.time()
                blobs = encode_series(
                    sig, "inter_time_us", assume_clustered=monotone
                )
                # blob stats ride the write job (Observation) — a
                # read-back-and-aggregate would be a full extra scan of
                # what was just written
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
                blob_box["stats"] = {
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
            except BaseException as exc:  # propagate into the caller
                blob_box["error"] = exc

        codec_thread = threading.Thread(
            target=_codec_branch, name="codec-branch", daemon=True
        )
        codec_thread.start()
        metrics = incremental_rollup(
            spark, sig, out_root, timings=timings, fingerprints=fingerprints
        )
        codec_thread.join()
        if "error" in blob_box:
            raise blob_box["error"]
        blob_stats = blob_box["stats"]
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
