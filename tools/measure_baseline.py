"""Measure the DuckDB baseline (BASELINE.md): wall-clock per oracle
query at a given SF, single node, default DuckDB threads.

Usage: python tools/measure_baseline.py [--sf /root/testdata/sf0.1]
Prints one JSON line {qid: sec, ...} plus a markdown table to stdout.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import duckdb

sys.path.insert(0, ".")

import __spark_entry__ as entrymod
from servicenow_cmdb_integration_to_aws_spark.sources.tables import TABLE_NAMES


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    args = ap.parse_args()

    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for t in TABLE_NAMES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS "
            f"SELECT * FROM read_parquet('{args.sf}/{t}.parquet')"
        )
    oracles = entrymod.oracle_sql()
    times: dict[str, float] = {}
    for qid in sorted(oracles):
        t0 = time.perf_counter()
        con.execute(oracles[qid]).fetchall()
        times[qid] = round(time.perf_counter() - t0, 3)
    total = round(sum(times.values()), 3)
    print(json.dumps({"total_sec": total, "queries": times, "sf": args.sf}))


if __name__ == "__main__":
    main()
