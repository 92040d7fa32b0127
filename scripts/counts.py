#!/usr/bin/env python3
"""Emit the judge-facing counts FROM BUILD ARTIFACTS so README/SURVEY
can never drift from reality (round-5 verdict item 3; round-11 item 2
added the bench-of-record line — the same drift bit two rounds in a
row via hand-copied bench numbers):

    python3 scripts/counts.py <verify_outdir> <sbt_test_log> [bench_json] [--check]

- query count  = len(<verify_outdir>/oracle_sql.json)  (every query in
  SparkEntry.queries has an oracleSql entry; Verify dumps the map)
- test count   = the "Total number of tests run" line of the sbt test log
- bench line   = total/n_queries/failed read from bench_json (pass the
  DRIVER'S BENCH_r{N}.json — per the standing convention the driver's
  final artifact is the record, never the builder's committed run)

--check (round-13 verdict item 7, after the 306-vs-308 class of drift
shipped FOUR rounds running): turn the generator into a close GATE —
parse the counts README.md and SURVEY.md actually carry and exit
nonzero on any mismatch with the artifact counts. The close ritual is
then "run tests, run counts.py --check, fix, re-run" instead of
"remember to re-run the generator after the last test lands".
"""
import json
import re
import sys


def doc_counts():
    """The counts README.md / SURVEY.md currently claim."""
    readme = open("README.md", errors="replace").read()
    survey = open("SURVEY.md", errors="replace").read()
    rm = re.search(r"ScalaTest suites \((\d+) tests\)", readme)
    sg = re.search(r"\((\d+)/(\d+) green", survey)
    st = re.search(r"the (\d+)-test ScalaTest count", survey)
    return {
        "readme_tests": int(rm.group(1)) if rm else None,
        "survey_queries": int(sg.group(1)) if sg else None,
        "survey_queries2": int(sg.group(2)) if sg else None,
        "survey_tests": int(st.group(1)) if st else None,
    }


def main() -> None:
    args = [a for a in sys.argv[1:] if a != "--check"]
    check = "--check" in sys.argv
    outdir, testlog = args[0], args[1]
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
    if len(args) > 2:
        bench = json.load(open(args[2]))
        # driver artifacts wrap the parsed line under "parsed"; a raw
        # bench_out.json IS the line
        rec = bench.get("parsed", bench)
        total = rec["value"]
        n_timed = rec.get("n_queries", len(rec.get("queries", {})))
        failed = rec.get("failed", [])
        print(f"BENCH:   the record reads {total} s over {n_timed} timed "
              f"queries (failed={failed})")
    if check:
        d = doc_counts()
        bad = []
        if d["readme_tests"] != m:
            bad.append(f"README says {d['readme_tests']} tests, "
                       f"artifact says {m}")
        if d["survey_tests"] != m:
            bad.append(f"SURVEY says {d['survey_tests']}-test, "
                       f"artifact says {m}")
        if d["survey_queries"] != n_queries or \
                d["survey_queries2"] != n_queries:
            bad.append(f"SURVEY says {d['survey_queries']}/"
                       f"{d['survey_queries2']} green, artifact says "
                       f"{n_queries}/{n_queries}")
        if bad:
            for b in bad:
                print(f"DRIFT:   {b}", file=sys.stderr)
            sys.exit(1)
        print("CHECK:   README/SURVEY counts match the artifacts")


if __name__ == "__main__":
    main()
