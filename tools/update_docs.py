#!/usr/bin/env python3
"""Machine-write the round-closing numbers in README.md and
IMPLEMENTATION.md from the committed artifacts — hand-typed copies of
these numbers drifted four rounds in a row (r5-r8), so they are now
generated.

Sources:
  - bench:   the newest bench_queries_r*.json (graft.Bench's full
             per-query map: total secs, query count, sf, failures)
  - tests:   an `sbt test` log (parses scalatest's final summary:
             "Total number of tests run: N" / "Suites: completed M")

Rewrites:
  - README.md: the "<M> suites, <N> tests" inventory line
  - IMPLEMENTATION.md: everything between the GENERATED markers
      <!-- BEGIN GENERATED: closing-numbers --> ... <!-- END GENERATED -->

Usage: python3 tools/update_docs.py [--sbt-log /tmp/sbt_test.log]
(run from the repo root; bench artifact is auto-discovered)
"""
import glob, json, re, sys

BEGIN = "<!-- BEGIN GENERATED: closing-numbers -->"
END = "<!-- END GENERATED -->"


def _round_of(p):
    return int(re.search(r"r(\d+)", p).group(1))


def newest_bench():
    # sort by the parsed round NUMBER — lexicographic order would pick
    # r99 over r100 once the round counter hits three digits
    paths = sorted(glob.glob("bench_queries_r*.json"), key=_round_of)
    if not paths:
        sys.exit("no bench_queries_r*.json artifact found")
    path = paths[-1]
    # staleness guard: a driver BENCH_rN.json from a NEWER round than the
    # per-query artifact we are about to cite means the closing block
    # would silently publish a superseded total (the r13 block cited
    # r12's bench while BENCH_r13.json sat untracked). Refuse, naming
    # the fix, instead of writing a stale "machine-written" number.
    driver = sorted(glob.glob("BENCH_r*.json"), key=_round_of)
    if driver and _round_of(driver[-1]) > _round_of(path):
        sys.exit(
            f"stale bench: {driver[-1]} is newer than {path} — run "
            "graft.Bench (writes the next bench_queries_r*.json) or cite "
            f"{driver[-1]}'s round explicitly before regenerating docs")
    line = [l for l in open(path) if '"metric"' in l][-1]
    return path, json.loads(line)


def parse_sbt_log(path):
    txt = open(path).read()
    tests = re.findall(r"Total number of tests run: (\d+)", txt)
    suites = re.findall(r"Suites: completed (\d+)", txt)
    failed = re.findall(r"Tests: succeeded \d+, failed (\d+)", txt)
    if not tests or not suites:
        sys.exit(f"{path}: no scalatest summary found")
    if not failed:
        sys.exit(f"{path}: no 'Tests: succeeded N, failed M' summary found")
    return int(suites[-1]), int(tests[-1]), int(failed[-1])


def rewrite_readme(suites, tests):
    txt = open("README.md").read()
    new, n = re.subn(r"\d+ suites, \d+ tests",
                     f"{suites} suites, {tests} tests", txt)
    if n != 1:
        sys.exit(f"README.md: expected exactly one 'N suites, N tests' line, found {n}")
    open("README.md", "w").write(new)


def rewrite_impl(block):
    txt = open("IMPLEMENTATION.md").read()
    if BEGIN not in txt or END not in txt:
        sys.exit("IMPLEMENTATION.md: GENERATED markers missing")
    pre, rest = txt.split(BEGIN, 1)
    _, post = rest.split(END, 1)
    open("IMPLEMENTATION.md", "w").write(pre + BEGIN + "\n" + block + "\n" + END + post)


def main():
    sbt_log = None
    args = sys.argv[1:]
    while args:
        a = args.pop(0)
        if a == "--sbt-log":
            sbt_log = args.pop(0)
        else:
            sys.exit(f"unknown arg {a}")
    bench_path, bench = newest_bench()
    nq = len(bench["queries"]) + len(bench.get("failed", []))
    failed = bench.get("failed", [])
    lines = [
        f"BENCH ({bench_path}): {bench['value']} s total at {bench['sf']} over "
        f"{nq} queries, "
        + ("zero failures." if not failed else f"FAILED: {failed}."),
    ]
    if sbt_log:
        suites, tests, tfail = parse_sbt_log(sbt_log)
        lines.append(
            f"Tests: {suites} suites / {tests} tests"
            + (" green." if tfail == 0 else f" ({tfail} FAILED)."))
        rewrite_readme(suites, tests)
    rewrite_impl("\n".join(lines))
    print("\n".join(lines))


if __name__ == "__main__":
    main()
