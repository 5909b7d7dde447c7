"""Local differential-parity harness — mimics the driver's t2 gate.

Runs every registered query on Spark and its oracle on DuckDB over the
same parquet tables, then compares row count, sorted column names, and
the exact multiset of canonicalized row values (stricter than the
driver's hash: we diff values directly).

Usage:
    python tools/check_parity.py [--sf /root/testdata/sf0.01] [id ...]
"""

from __future__ import annotations

import argparse
import math
import os
import sys
import time
from datetime import date, datetime
from decimal import Decimal

import duckdb

sys.path.insert(0, ".")

import __spark_entry__ as entrymod  # the exact surface the driver imports
from servicenow_cmdb_integration_to_aws_spark.session import build_session
from servicenow_cmdb_integration_to_aws_spark.sources.tables import TABLE_NAMES


def canon(v):
    """Canonicalize a cell value for cross-engine comparison."""
    if v is None:
        return None
    if isinstance(v, Decimal):
        return ("dec", str(v.normalize()))
    if isinstance(v, float):
        if math.isnan(v):
            return ("f", "nan")
        return ("f", v.hex())
    if isinstance(v, bool):
        return ("b", v)
    if isinstance(v, int):
        return ("i", v)
    if isinstance(v, datetime):
        return ("ts", v.replace(tzinfo=None).isoformat())
    if isinstance(v, date):
        return ("d", v.isoformat())
    if isinstance(v, (list, tuple)):
        return ("l", tuple(canon(x) for x in v))
    if isinstance(v, dict):
        return ("m", tuple(sorted((k, canon(x)) for k, x in v.items())))
    if isinstance(v, (bytes, bytearray)):
        return ("by", bytes(v).hex())
    return ("s", str(v))


def rows_canon(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(canon(r[i]) for i in order) for r in rows]
    out.sort(key=repr)
    return [cols[i] for i in order], out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("ids", nargs="*")
    args = ap.parse_args()

    queries, oracles = entrymod.queries(), entrymod.oracle_sql()
    ids = args.ids or sorted(queries)

    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for t in TABLE_NAMES:
        # testdata tables are single files; Spark-written copies (the
        # scale_probe dirs) are DIRECTORIES of part files — glob those
        p = f"{args.sf}/{t}.parquet"
        src = f"'{p}/*.parquet'" if os.path.isdir(p) else f"'{p}'"
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM read_parquet({src})"
        )

    spark = build_session("check-parity")
    passed = failed = skipped = 0
    for qid in ids:
        if qid not in queries:
            print(f"?? {qid}: not registered")
            failed += 1
            continue
        t0 = time.time()
        try:
            sdf = queries[qid](spark, args.sf)
            s_cols = list(sdf.columns)
            s_rows = [tuple(r) for r in sdf.collect()]
        except Exception as ex:  # noqa: BLE001
            print(f"FAIL {qid}: spark error: {type(ex).__name__}: {ex}")
            failed += 1
            continue
        if qid not in oracles:
            print(f"SKIP {qid}: rows-only ({len(s_rows)} rows, {time.time()-t0:.1f}s)")
            skipped += 1
            continue
        try:
            cur = con.execute(oracles[qid])
            d_cols = [d[0] for d in cur.description]
            d_rows = cur.fetchall()
        except Exception as ex:  # noqa: BLE001
            print(f"FAIL {qid}: duckdb error: {type(ex).__name__}: {ex}")
            failed += 1
            continue

        sc, s_can = rows_canon(s_cols, s_rows)
        dc, d_can = rows_canon(d_cols, d_rows)
        if sc != dc:
            print(f"FAIL {qid}: columns spark={sc} duckdb={dc}")
            failed += 1
            continue
        if len(s_can) != len(d_can):
            print(f"FAIL {qid}: rowcount spark={len(s_can)} duckdb={len(d_can)}")
            failed += 1
            continue
        if s_can != d_can:
            ndiff = sum(1 for a, b in zip(s_can, d_can) if a != b)
            print(f"FAIL {qid}: {ndiff}/{len(s_can)} rows differ; first:")
            for a, b in zip(s_can, d_can):
                if a != b:
                    print(f"  cols : {sc}")
                    print(f"  spark: {a}")
                    print(f"  duck : {b}")
                    break
            failed += 1
            continue
        print(f"PASS {qid} ({len(s_can)} rows, {time.time()-t0:.1f}s)")
        passed += 1

    print(f"\n{passed} passed, {failed} failed, {skipped} rows-only skipped")
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
