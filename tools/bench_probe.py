#!/usr/bin/env python3
"""Build BENCH_sf1_probe.json: sf1 timings for the most expensive
queries vs their sf0.1 baseline, with scaling ratios.

Usage: python3 tools/bench_probe.py <bench_json_line_file> [out] [scale] [baseline]

The input is a file containing graft.Bench's final JSON line from a
run with SPARK_GRAFT_SF_DIR pointed at a scale-up directory and
SPARK_GRAFT_BENCH_ONLY restricted to the probe set. The sf0.1 baseline
defaults to the NEWEST bench_queries_r*.json (the current full
per-query map) so re-timed queries compare against the code that is
actually committed, not a stale round.
A ratio beyond ~1.5x the scale factor flags super-linear behavior the
sf0.1 bench cannot see (hidden skew, quadratic candidate growth, ...).
"""
import glob, json, sys

def main(inp, out="BENCH_sf1_probe.json", scale="10", baseline=None):
    # The final metric line keeps a hard byte budget (cheapest queries
    # dropped); the FULL map is echoed in 25-entry bench_chunk lines
    # printed just BEFORE their own run's metric line. A log may hold
    # several runs, so the chunk accumulator resets at every metric
    # line — only the block belonging to the LAST (selected) run is
    # merged, never an older run's timings.
    sf1, chunks = None, []
    for l in open(inp):
        if '"bench_chunk"' in l:
            chunks.append(json.loads(l[l.index('{'):]))
        elif '"metric"' in l:
            sf1 = json.loads(l)
            sf1["_chunks"], chunks = chunks, []
    if sf1 is None:
        sys.exit(f"no metric line in {inp}")
    spill = dict(sf1.get("spill_bytes", {}))
    for chunk in sf1.pop("_chunks"):
        for k, v in chunk["queries"].items():
            sf1["queries"].setdefault(k, v)
        spill.update(chunk.get("spill_bytes", {}))
    if baseline is None:
        # numeric round sort: lexicographic picks r99 over r100
        import re
        baseline = sorted(glob.glob("bench_queries_r*.json"),
                          key=lambda p: int(re.search(r"r(\d+)", p).group(1)))[-1]
    try:
        base = json.load(open(baseline))["queries"]
    except json.JSONDecodeError:
        base_line = [l for l in open(baseline) if '"metric"' in l][-1]
        base = json.loads(base_line)["queries"]
    rows = {}
    for name, sec in sorted(sf1["queries"].items(), key=lambda x: -x[1]):
        b = base.get(name)
        rows[name] = {
            "scaled_sec": sec,
            "sf01_sec": b,
            "ratio": round(sec / b, 2) if b else None,
        }
        # peak disk-spill bytes (max over bench passes) when the run's
        # Bench recorded them — the spill-regime diagnostic for scale
        # probes; absent key = ran before instrumentation, 0 = no spill
        if name in spill:
            rows[name]["spill_bytes"] = spill[name]
    scale = float(scale)
    # the super-linear flag only makes sense scaling UP: a DOWN-scale
    # probe (sf0.01 vs the sf0.1 baseline, scale = 0.1) has every query
    # floored at its constant overhead, so ratio > 1.5*scale is just
    # "has an overhead term", not a scale risk
    flagged = ([n for n, r in rows.items()
                if r["ratio"] is not None and r["ratio"] > 1.5 * scale]
               if scale > 1.0 else [])
    doc = {
        "metric": "scale_probe",
        "scaled_total_sec": sf1["value"],
        "n_queries": len(rows),
        "failed": sf1.get("failed", []),
        "flagged_superlinear": flagged,
        "scale_vs_sf01": scale,
        "note": "deterministic scale-up of sf0.1 (graft.ScaleUp); "
                "ratio = scaled/sf0.1 seconds; linear scaling ~= the "
                "scale factor, >1.5x scale flags super-linear behavior",
        "queries": rows,
    }
    with open(out, "w") as f:
        json.dump(doc, f, indent=1)
    print(json.dumps({k: doc[k] for k in
        ("scaled_total_sec", "n_queries", "failed", "flagged_superlinear")}))

if __name__ == "__main__":
    main(*sys.argv[1:])
