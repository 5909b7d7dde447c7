#!/usr/bin/env python
"""Per-id optimization profiler (r14): isolated serial timings + plan
capture, the guide §1 'measure first' harness.

For each id: run the query REPEATS times end-to-end through the noop
sink on one fresh session (first run = cold plan, rest warm), print
all timings, and (with --plans DIR) write `<id>_<tag>.txt` containing
`explain("formatted")` of the exact DataFrame the bench executes.

Usage:
    python tools/profile_ids.py [--sf DIR] [--repeats N]
        [--plans plans/r14 --tag before] id [id ...]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, ".")

import __spark_entry__ as entrymod
from servicenow_cmdb_integration_to_aws_spark.session import build_session


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--plans", default=None)
    ap.add_argument("--tag", default="before")
    ap.add_argument("ids", nargs="+")
    args = ap.parse_args()

    queries = entrymod.queries()
    spark = build_session("profile-ids")
    # same warmup as bench.py: JVM + codegen + parquet footer
    entrymod.entry(spark).collect()

    for qid in args.ids:
        if qid not in queries:
            print(f"?? {qid}: not registered")
            continue
        runs = []
        for r in range(args.repeats):
            spark.sparkContext.setJobDescription(f"{qid} run{r}")
            t0 = time.perf_counter()
            df = queries[qid](spark, args.sf)
            df.write.mode("overwrite").format("noop").save()
            runs.append(round(time.perf_counter() - t0, 3))
        spark.sparkContext.setJobDescription(None)
        print(f"{qid}: {runs} (min {min(runs):.3f})", flush=True)
        if args.plans:
            os.makedirs(args.plans, exist_ok=True)
            df = queries[qid](spark, args.sf)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            with open(
                os.path.join(args.plans, f"{qid}_{args.tag}.txt"), "w"
            ) as fh:
                fh.write(plan)
    return 0


if __name__ == "__main__":
    sys.exit(main())
