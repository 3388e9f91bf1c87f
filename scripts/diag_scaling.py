"""Per-phase scaling diagnosis: run the flagship pipeline once per level
and print the full metrics manifest (per-tier wall, codec wall) so the
non-scaling phase is visible.

Usage: python scripts/diag_scaling.py [n_turns] [cores ...]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

JOB = r"""
import json, os, shutil, sys, time
sys.path.insert(0, {repo!r})
from aroma_spark.session import get_spark
from aroma_spark.synth import synth_transcripts
from aroma_spark.plans.pipeline import run_pipeline

cores = {cores}
n_turns = {n_turns}
spark = get_spark("diag-scaling", master=f"local[{{cores}}]",
                  shuffle_partitions=4 * cores)
spark.sparkContext.setLogLevel("ERROR")
if not os.path.exists({input_path!r} + "/_SUCCESS"):
    df = synth_transcripts(spark, n_turns=n_turns,
                           n_convs=max(64, n_turns // 500),
                           seed=42, partitions=128, gap_divisor=50)
    df.write.mode("overwrite").parquet({input_path!r})
src = spark.read.parquet({input_path!r})

out_runs = []
for i in range(2):
    out = f"/dev/shm/aroma_diag_out_{{cores}}_{{i}}"
    shutil.rmtree(out, ignore_errors=True)
    m = run_pipeline(spark, src, out)
    shutil.rmtree(out, ignore_errors=True)
    out_runs.append(m)
print(json.dumps(out_runs))
spark.stop()
"""


def main() -> None:
    n_turns = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000_000
    levels = [int(x) for x in sys.argv[2:]] or [2, 8]
    input_path = f"/tmp/aroma_scaling_dense_{n_turns}"
    for cores in levels:
        code = JOB.format(
            repo=REPO, cores=cores, n_turns=n_turns, input_path=input_path
        )
        res = subprocess.run(
            [sys.executable, "-c", code],
            capture_output=True,
            text=True,
            cwd=REPO,
        )
        if res.returncode != 0:
            print(res.stderr[-3000:])
            sys.exit(1)
        runs = json.loads(res.stdout.strip().splitlines()[-1])
        for j, m in enumerate(runs):
            tag = "warm" if j else "cold"
            tier_walls = {
                k: v["wall_sec"] for k, v in m["tiers"].items()
            }
            codec_wall = (m.get("codec_blobs") or {}).get("wall_sec")
            print(
                f"cores={cores} [{tag}] total={m['wall_sec']}s "
                f"pps={m['points_per_sec']} tiers={tier_walls} "
                f"codec={codec_wall}s",
                flush=True,
            )


if __name__ == "__main__":
    main()
