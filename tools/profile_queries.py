"""Per-query profiler for the optimization rounds.

For each named registry query:
  1. captures ``explain("formatted")`` to plans/<tag>/<name>_<suffix>.txt
  2. times plan-build and execution separately (build = calling the
     registry fn, which for iterative operators runs eager jobs via
     localCheckpoint/count; exec = the final .collect())
  3. snapshots the Spark REST API job list around the run and prints the
     top jobs by duration with their descriptions — the local-mode
     equivalent of reading the UI's Jobs tab (guide §1.1/§7.1)

Usage:
  python tools/profile_queries.py <tag> <suffix> name1,name2,...
  SPARK_GRAFT_SF_DIR picks the data dir (default sf0.1).

Writes plans under plans/<tag>/ and prints one summary block per query.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from big_data_computing__spark.session import get_session


def _api(spark, path):
    ui = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId
    with urllib.request.urlopen(f"{ui}/api/v1/applications/{app_id}{path}") as r:
        return json.load(r)


def main() -> None:
    tag, suffix, names = sys.argv[1], sys.argv[2], sys.argv[3].split(",")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    outdir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", tag)
    os.makedirs(outdir, exist_ok=True)
    spark = get_session(app_name="bdc_profile")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    # warm codegen/JVM once
    qs["o1_topk_orders"](spark, sf_dir).collect()

    for name in names:
        spark.sparkContext.setJobDescription(f"profile:{name}")
        jobs_before = {j["jobId"] for j in _api(spark, "/jobs")}
        t0 = time.time()
        df = qs[name](spark, sf_dir)
        t_build = time.time() - t0
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        with open(os.path.join(outdir, f"{name}_{suffix}.txt"), "w") as f:
            f.write(plan)
        t1 = time.time()
        df.collect()
        t_exec = time.time() - t1
        # second run for a steady-state wall number (first run of a
        # fresh plan pays codegen)
        t2 = time.time()
        qs[name](spark, sf_dir).collect()
        t_total2 = time.time() - t2
        spark.sparkContext.setJobDescription(None)
        jobs = [j for j in _api(spark, "/jobs") if j["jobId"] not in jobs_before]
        durs = []
        for j in jobs:
            try:
                sub = time.strptime(j["submissionTime"][:19], "%Y-%m-%dT%H:%M:%S")
                comp = time.strptime(j["completionTime"][:19], "%Y-%m-%dT%H:%M:%S")
                ms = (time.mktime(comp) - time.mktime(sub)) * 1000
            except Exception:
                ms = -1
            durs.append((ms, j["jobId"], (j.get("description") or j.get("name", ""))[:90]))
        durs.sort(reverse=True)
        print(f"== {name}: build={t_build:.2f}s exec={t_exec:.2f}s "
              f"run2={t_total2:.2f}s jobs={len(jobs)} "
              f"plan={os.path.join(outdir, name + '_' + suffix + '.txt')}")
        for ms, jid, desc in durs[:12]:
            print(f"   {ms/1000.0:7.2f}s  job {jid}  {desc}")
        sys.stdout.flush()
    spark.stop()


if __name__ == "__main__":
    main()
