#!/usr/bin/env python
"""Per-stage profiling for headline queries via the Spark UI REST API.

Usage: python tools/profile_query.py name [name ...]

Runs each query twice (cold then warm), then prints the warm run's Spark
jobs/stages sorted by executor task time: stage name, task count, task
time, shuffle read/write bytes.  This is the guide-§1 empirical loop:
find where the wall time actually goes before touching anything.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("SPARK_GRAFT_UI_ENABLED", "true")

from hadrodb_spark.queries import QUERIES  # noqa: E402
from hadrodb_spark.session import get_spark  # noqa: E402


def _get(url: str):
    with urllib.request.urlopen(url) as r:
        return json.loads(r.read())


def main() -> None:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("hadrodb_profile")
    spark.sparkContext.setLogLevel("ERROR")
    ui = spark.sparkContext.uiWebUrl
    if not ui:
        print("UI disabled; set spark.ui.enabled", file=sys.stderr)
        sys.exit(1)
    app_id = spark.sparkContext.applicationId
    base = f"{ui}/api/v1/applications/{app_id}"

    for name in names:
        fn = QUERIES[name]
        fn(spark, sf_dir).count()  # cold / fixture builds / shared persists
        jobs0 = {j["jobId"] for j in _get(f"{base}/jobs")}
        t0 = time.perf_counter()
        fn(spark, sf_dir).count()
        wall = time.perf_counter() - t0
        jobs = [j for j in _get(f"{base}/jobs") if j["jobId"] not in jobs0]
        stage_ids = sorted({s for j in jobs for s in j["stageIds"]})
        stages = []
        for sid in stage_ids:
            try:
                for att in _get(f"{base}/stages/{sid}"):
                    stages.append(att)
            except Exception:
                pass
        print(f"\n##### {name}: warm wall {wall:.3f}s, "
              f"{len(jobs)} jobs, {len(stages)} stages")
        stages.sort(key=lambda s: -s.get("executorRunTime", 0))
        tot_rt = sum(s.get("executorRunTime", 0) for s in stages)
        print(f"  total executorRunTime {tot_rt/1000.0:.3f}s across "
              f"{sum(s.get('numCompleteTasks',0) for s in stages)} tasks")
        for s in stages[:12]:
            nm = s.get("name", "?").split("\n")[0][:80]
            print(
                f"  stage {s['stageId']}: rt={s.get('executorRunTime',0)/1000.0:6.2f}s"
                f" tasks={s.get('numCompleteTasks',0):4d}"
                f" in={s.get('inputBytes',0)>>10:7d}K"
                f" sr={s.get('shuffleReadBytes',0)>>10:6d}K"
                f" sw={s.get('shuffleWriteBytes',0)>>10:6d}K  {nm}"
            )


if __name__ == "__main__":
    main()
