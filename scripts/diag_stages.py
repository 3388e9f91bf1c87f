"""Per-stage task-count/duration dump of one pipeline run at N cores.

Finds serialization chokes the phase-level diag cannot see: a phase
whose wall is dominated by a stage with fewer tasks than cores is an
Amdahl term no amount of parallelism fixes. Scrapes the live Spark UI
REST API (enabled just for this run) after the measured execution.

Usage: python scripts/diag_stages.py [n_turns] [cores] [warmups]
"""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

JOB = r"""
import json, shutil, sys, time, urllib.request
sys.path.insert(0, {repo!r})
from aroma_spark.session import get_spark
from aroma_spark.plans.pipeline import run_pipeline

cores = {cores}
local_dir = f"/dev/shm/aroma_diag_local_{{cores}}"
shutil.rmtree(local_dir, ignore_errors=True)
spark = get_spark("diag-stages", master=f"local[{{cores}}]",
                  shuffle_partitions=4 * cores,
                  extra_conf={{
                      "spark.driver.memory": "16g",
                      "spark.driver.extraJavaOptions":
                          "-Xms16g -XX:+AlwaysPreTouch",
                      "spark.local.dir": local_dir,
                      "spark.ui.enabled": "true",
                      "spark.ui.port": "4099",
                      "spark.sql.files.maxPartitionBytes": "33554432",
                  }})
spark.sparkContext.setLogLevel("ERROR")
src = spark.read.parquet({input_path!r})

def job(i):
    out = f"/dev/shm/aroma_diag_out_{{cores}}_{{i}}"
    shutil.rmtree(out, ignore_errors=True)
    m = run_pipeline(spark, src, out)
    shutil.rmtree(out, ignore_errors=True)
    return m

for w in range({warmups}):
    t0 = time.time(); job(0); print(f"warmup {{w}}: {{time.time()-t0:.1f}}s", flush=True)

def stages():
    app = json.load(urllib.request.urlopen(
        "http://localhost:4099/api/v1/applications"))[0]["id"]
    return json.load(urllib.request.urlopen(
        f"http://localhost:4099/api/v1/applications/{{app}}/stages?status=complete"))

before = {{s["stageId"] for s in stages()}}
t0 = time.time()
m = job(1)
wall = time.time() - t0
rows = [s for s in stages() if s["stageId"] not in before]
rows.sort(key=lambda s: -(s.get("executorRunTime") or 0))
print(f"\nmeasured wall {{wall:.1f}}s pps={{m['points_per_sec']}} "
      f"phases={{ {{t: v['wall_sec'] for t, v in m['tiers'].items()}} }} "
      f"fp={{m.get('fingerprint_wall')}} "
      f"blobs={{(m['codec_blobs'] or {{}}).get('wall_sec')}}", flush=True)
print(f"{{'stage':>6}} {{'tasks':>5}} {{'runTime_s':>9}} {{'cpu_s':>8}} "
      f"{{'submit->done_s':>14}}  name")
for s in rows:
    rt = (s.get("executorRunTime") or 0) / 1000.0
    cpu = (s.get("executorCpuTime") or 0) / 1e9
    try:
        from datetime import datetime
        fmt = "%Y-%m-%dT%H:%M:%S.%f%Z"
        dur = (datetime.strptime(s["completionTime"], fmt)
               - datetime.strptime(s["firstTaskLaunchedTime"], fmt)
               ).total_seconds()
    except Exception:
        dur = None
    if rt < 0.3:
        continue
    print(f"{{s['stageId']:>6}} {{s['numCompleteTasks']:>5}} {{rt:>9.1f}} "
          f"{{cpu:>8.1f}} {{(f'{{dur:.1f}}' if dur is not None else '?'):>14}}"
          f"  {{s['name'][:70]}}")
spark.stop()
shutil.rmtree(local_dir, ignore_errors=True)
"""


def main() -> None:
    n_turns = int(sys.argv[1]) if len(sys.argv) > 1 else 40_000_000
    cores = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    warmups = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    input_path = f"/dev/shm/aroma_scaling_dense_{n_turns}"
    from bench_scaling import GEN

    subprocess.run(
        [sys.executable, "-c", GEN.format(repo=REPO, n_turns=n_turns,
                                          input_path=input_path)],
        check=True, cwd=REPO,
    )
    code = JOB.format(repo=REPO, cores=cores, input_path=input_path,
                      warmups=warmups)
    subprocess.run(
        ["taskset", "-c", f"0-{cores - 1}", sys.executable, "-c", code],
        cwd=REPO, check=True,
    )


if __name__ == "__main__":
    sys.path.insert(0, os.path.join(REPO, "scripts"))
    main()
