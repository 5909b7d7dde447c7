"""Double-run determinism harness (r12): run every registered query
TWICE in one session and require the exact canonicalized row multisets
to match.

Why this exists next to check_parity: the DuckDB differential catches
nondeterminism only at the moment the engine's arbitrary pick diverges
from DuckDB's — a shuffle-order-dependent tie pick can agree for any
number of runs and split later (the r11 --dupids canon findings were
exactly this class). Running the SAME engine twice catches the
nondeterminism itself: if two runs differ, the operator has an
unpinned tie rule, full stop, no oracle needed. Complementary, not a
substitute — parity proves the value is RIGHT, this proves it is
STABLE.

Queries that stage temp dirs (stores, sinks, streams) rebuild them per
run, so this also re-proves that scaffolding is rerun-safe in one
session (fresh mkdtemp per call — a collision would surface here).

With ``--vs-sf DIR`` the second run reads a DIFFERENT corpus dir that
must hold the SAME logical content (the --rowshuffle layout twin): the
two canonicalized multisets must still be equal, which proves the
result is independent of PHYSICAL ROW ORDER — the property a 100 TB
deployment actually needs, since splits/compactions/shuffles feed the
same table in arbitrary order. A same-corpus double run cannot see
this class (both runs read the same layout).

Usage:
    python tools/check_determinism.py [--sf /root/testdata/sf0.001] [id ...]
    python tools/check_determinism.py --sf <orig> --vs-sf <rowshuffled>
"""

from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, ".")

import __spark_entry__ as entrymod  # the exact surface the driver imports
from servicenow_cmdb_integration_to_aws_spark.session import build_session

sys.path.insert(0, "tools")
from check_parity import rows_canon  # same canonicalization


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.001")
    ap.add_argument(
        "--vs-sf", default=None,
        help="second corpus dir with identical logical content "
             "(e.g. the --rowshuffle twin); run 2 reads it instead",
    )
    ap.add_argument(
        "--cpus2", type=int, default=None,
        help="PARALLELISM axis (r14): rebuild the session with "
             "SPARK_GRAFT_CPUS=N before run 2 (local[N] master and N "
             "shuffle partitions) — results must be independent of "
             "core count and shuffle fan-out, the property a move "
             "from local[32] to a 1000-executor cluster needs. "
             "Composable with --vs-sf. Runs phase-wise (all ids on "
             "session 1, then all on session 2) to avoid a JVM "
             "restart per id.",
    )
    ap.add_argument("ids", nargs="*")
    args = ap.parse_args()

    queries = entrymod.queries()
    ids = args.ids or sorted(queries)
    spark = build_session("determinism")

    phase1: dict[str, tuple] = {}
    if args.cpus2 is not None:
        # phase-wise: collect run 1 for every id, rebuild the session
        # at the second parallelism, then run 2 compares against it
        import os as _os

        for qid in ids:
            t0 = time.time()
            try:
                df = queries[qid](spark, args.sf)
                phase1[qid] = rows_canon(df.columns, df.collect())
                print(f"run1 {qid} ({time.time() - t0:.1f}s)")
            except Exception as err:  # noqa: BLE001
                print(f"ERROR(run1) {qid}: {type(err).__name__}: {err}")
        spark.stop()
        _os.environ["SPARK_GRAFT_CPUS"] = str(args.cpus2)
        spark = build_session("determinism-cpus2")

    n_pass = n_fail = 0
    for qid in ids:
        t0 = time.time()
        try:
            if args.cpus2 is not None:
                if qid not in phase1:
                    n_fail += 1  # run-1 error already printed
                    continue
                df = queries[qid](spark, args.vs_sf or args.sf)
                runs = [phase1[qid], rows_canon(df.columns, df.collect())]
            else:
                runs = []
                for sf_dir in (args.sf, args.vs_sf or args.sf):
                    df = queries[qid](spark, sf_dir)
                    cols = df.columns
                    runs.append(rows_canon(cols, df.collect()))
            (c1, r1), (c2, r2) = runs
            if c1 != c2:
                print(f"FAIL {qid}: column sets differ {c1} vs {c2}")
                n_fail += 1
            elif r1 != r2:
                diffs = [a for a in r1 if a not in r2][:3]
                print(
                    f"FAIL {qid}: {len(r1)} vs {len(r2)} rows, multisets "
                    f"differ; sample only-in-run1: {diffs}"
                )
                n_fail += 1
            else:
                print(
                    f"PASS {qid} ({len(r1)} rows, {time.time() - t0:.1f}s)"
                )
                n_pass += 1
        except Exception as err:  # noqa: BLE001 — report and continue
            print(f"ERROR {qid}: {type(err).__name__}: {err}")
            n_fail += 1
    print(f"\n{n_pass} deterministic, {n_fail} failed")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
