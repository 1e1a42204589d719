#!/usr/bin/env python3
"""Fit a per-query growth curve over the committed scale points
(sf0.01 / sf0.1 / sf1 / sf10) and flag super-linear queries mechanically.

Model: t(sf) = c + a * sf^e  (fixed per-query overhead + a scaling
term). With three DECADE-SPACED points the model has a closed-form
exact solution:

    (t10 - t1) / (t1 - t01) = (10^e - 1) / (1 - 10^-e) = 10^e
    =>  e = log10((t10 - t1) / (t1 - t01))

which is strictly better than a raw log-log slope: the overhead term c
flattens the low end of every cheap query, so a least-squares slope
over log t underestimates the tail exponent exactly where it matters
(a8_kw_jacobian fits e = 2.1 while its naive slope is 0.75).

Error bars: a 3-point fit has none — every exponent is an exact
interpolation, so fit noise is invisible. When a 4th (sf0.01) point is
supplied, each query additionally gets a LEAVE-ONE-OUT exponent range:
the model is re-fit on each of the four 3-point subsets (general
spacing solved by bisection on the delta ratio, which is monotone in
e), and [e_loo_min, e_loo_max] is reported. A range that spans 1.0
(`e_spans_linear`) documents that the data cannot distinguish the
query from linear — constant-dominated cheap queries land here. This
is REPORTING only and never exempts a query from the flag list: a
genuinely super-linear tail also produces a wide LOO range (its own
low-end triples are constant-dominated), so exempting on the range
would silently absolve real flags.

Tail probes: the one honest way OFF the flag list is a measurement
PAST the fitted window. TAIL_PROBES.json (committed) records isolated
re-measurements at a higher sf for specific queries; a flag whose
probe shows t(k·sf)/t(sf) <= 1.2·k is moved to `absolved_by_tail_probe`
(the spill-regime-shift verdict, now measured rather than argued).

Confidence: e is a ratio of two measured DELTAS, so when the sf0.1 ->
sf1 delta is inside measurement noise (host variance is ~+/-10% per
query, ~0.1 s absolute on sub-second queries) the exponent is
unreliable -- those queries are reported with confidence "low" and
flagged separately instead of polluting the main flag list.

Flag rule: e > FLAG_E (1.2) AND the TAIL decade itself is super-linear
(t_sf10 / t_sf1 > 10 -- the exponent alone over-weights the noisy
sf0.1 -> sf1 delta: a query with a 7x tail on 10x data is sub-linear
where it matters no matter what the 3-point model says) AND confidence
ok AND the sf10 cost is material (>= FLAG_T10 seconds); a surviving
flag with a committed linear tail probe moves to
`absolved_by_tail_probe`.

Usage: python3 tools/growth_curve.py [sf01_bench] [sf1_probe] [sf10_probe]
       [out] [sf001_probe] [sf20_probe] [sf10_fresh_probe]
Defaults: newest bench_queries_r*.json, BENCH_sf1_probe.json,
BENCH_sf10_full.json, GROWTH.json, then BENCH_sf001_probe.json /
BENCH_sf20_heavy.json / BENCH_sf10_heavy.json if present. The sf20 +
same-session-sf10 pair gives the heavy tier a fit window past JVM
overhead (and the flag rule moves there for those queries); spill
bytes from instrumented runs are passed through per query.
Prints the flag lists and a markdown table of the steepest queries.
"""
import glob, json, math, os, re, sys

FLAG_E = 1.2     # exponent above which growth is called super-linear
FLAG_T10 = 3.0   # sf10 seconds below which a steep exponent is immaterial
NOISE_ABS = 0.15 # seconds: smallest delta distinguishable from host noise
NOISE_REL = 0.25 # fraction of the sf0.1 time the sf0.1->sf1 delta must exceed
EPS_E = 1e-3     # |e| below this: the (1 - 10^-e) denominator is degenerate


def newest_bench():
    paths = sorted(glob.glob("bench_queries_r*.json"),
                   key=lambda p: int(re.search(r"r(\d+)", p).group(1)))
    if not paths:
        sys.exit("no bench_queries_r*.json artifact found")
    return paths[-1]


def load_queries(path):
    try:
        doc = json.load(open(path))
    except json.JSONDecodeError:
        doc = json.loads([l for l in open(path) if '"metric"' in l][-1])
    qs = doc["queries"]
    # bench_queries_r*.json maps name -> sec; probe artifacts map
    # name -> {scaled_sec, ...}
    return {k: (v if isinstance(v, (int, float)) else v["scaled_sec"])
            for k, v in qs.items()}


def load_spill(path):
    """Per-query peak disk-spill bytes, when the artifact carries them
    (bench detail lines: top-level "spill_bytes" map; probe artifacts:
    per-row "spill_bytes"). Empty dict for pre-instrumentation runs."""
    try:
        doc = json.load(open(path))
    except json.JSONDecodeError:
        doc = json.loads([l for l in open(path) if '"metric"' in l][-1])
    spill = dict(doc.get("spill_bytes", {}))
    for k, v in doc.get("queries", {}).items():
        if isinstance(v, dict) and "spill_bytes" in v:
            spill[k] = v["spill_bytes"]
    return spill


def fit(t01, t1, t10):
    """Closed-form (c, a, e) of t = c + a*sf^e through the three
    decade-spaced points; returns (None, None, None, reason) when the
    deltas do not support a growth estimate. Near e = 0 the exponent is
    fine but the (1 - 10^-e) denominator underflows, so c and a are
    nulled rather than reported at meaningless magnitudes."""
    d_lo, d_hi = t1 - t01, t10 - t1
    if d_lo <= 0 or d_hi <= 0:
        return None, None, None, "non-monotone (noise-dominated)"
    e = math.log10(d_hi / d_lo)
    if abs(e) < EPS_E:
        return None, None, e, "e ~ 0: c/a denominator degenerate"
    a = d_lo / (1.0 - 10.0 ** (-e))
    c = t1 - a
    return c, a, e, None


def fit_general(pts):
    """Exponent of t = c + a*sf^e through three (sf, t) points with
    ARBITRARY spacing: the delta ratio (t3-t2)/(t2-t1) =
    (s3^e - s2^e)/(s2^e - s1^e) is strictly increasing in e, so solve by
    bisection. Returns None when the deltas are non-monotone."""
    (s1, t1), (s2, t2), (s3, t3) = sorted(pts)
    d_lo, d_hi = t2 - t1, t3 - t2
    if d_lo <= 0 or d_hi <= 0:
        return None
    target = d_hi / d_lo

    def ratio(e):
        if abs(e) < 1e-12:
            # lim e->0: (ln s3 - ln s2)/(ln s2 - ln s1)
            return (math.log(s3) - math.log(s2)) / (math.log(s2) - math.log(s1))
        return (s3 ** e - s2 ** e) / (s2 ** e - s1 ** e)

    lo, hi = -6.0, 6.0
    if target <= ratio(lo) or target >= ratio(hi):
        return None  # outside the bracketing window: not a power law
    for _ in range(80):
        mid = (lo + hi) / 2.0
        if ratio(mid) < target:
            lo = mid
        else:
            hi = mid
    return (lo + hi) / 2.0


def loo_range(points):
    """Leave-one-out exponent range over 4 scale points: re-fit on each
    3-point subset; returns (min, max, n_fits) over the subsets whose
    deltas were monotone (None, None, 0 when no subset fits)."""
    es = []
    for drop in range(len(points)):
        subset = [p for i, p in enumerate(points) if i != drop]
        e = fit_general(subset)
        if e is not None:
            es.append(e)
    if not es:
        return None, None, 0
    return min(es), max(es), len(es)


def main(sf01=None, sf1="BENCH_sf1_probe.json", sf10="BENCH_sf10_full.json",
         out="GROWTH.json", sf001=None, sf20=None, sf10_fresh=None):
    sf01 = sf01 or newest_bench()
    if sf001 is None and os.path.exists("BENCH_sf001_probe.json"):
        sf001 = "BENCH_sf001_probe.json"
    if sf20 is None and os.path.exists("BENCH_sf20_heavy.json"):
        sf20 = "BENCH_sf20_heavy.json"
    if sf10_fresh is None and os.path.exists("BENCH_sf10_heavy.json"):
        sf10_fresh = "BENCH_sf10_heavy.json"
    b01, b1, b10 = load_queries(sf01), load_queries(sf1), load_queries(sf10)
    b001 = load_queries(sf001) if sf001 else {}
    # heavy-tier extension: an sf20 point (and a SAME-SESSION sf10
    # re-measurement to ratio it against — cross-session sf10/sf20
    # ratios inherit the +/-30-50% spill-probe variance) gives the top
    # queries a fit window past JVM overhead, where the default
    # sf0.01/sf0.1 points are constant-dominated noise
    b20 = load_queries(sf20) if sf20 else {}
    b10f = load_queries(sf10_fresh) if sf10_fresh else {}
    spill = {}
    for label, path in (("sf0.1", sf01), ("sf1", sf1), ("sf10", sf10),
                        ("sf20", sf20), ("sf10_fresh", sf10_fresh)):
        if path:
            for k, v in load_spill(path).items():
                spill.setdefault(k, {})[label] = v
    queries, flagged, low_conf = {}, [], []
    for name in sorted(b01):
        if name not in b1 or name not in b10:
            continue
        t01, t1, t10 = b01[name], b1[name], b10[name]
        if min(t01, t1, t10) <= 0:
            continue  # a -1 failure marker
        c, a, e, reason = fit(t01, t1, t10)
        ok = (e is not None
              and (t1 - t01) >= max(NOISE_ABS, NOISE_REL * t01))
        conf = "ok" if ok else "low"
        rec = {
            "t_sf01": t01, "t_sf1": t1, "t_sf10": t10,
            "tail_ratio": round(t10 / t1, 2),
            "exponent": round(e, 3) if e is not None else None,
            "overhead_c": round(c, 3) if c is not None else None,
            "scale_a": round(a, 3) if a is not None else None,
            "confidence": conf,
            **({"note": reason} if reason else {}),
        }
        spans_linear = None
        t001 = b001.get(name)
        if t001 is not None and t001 > 0:
            rec["t_sf001"] = t001
            lo, hi, nf = loo_range(
                [(0.01, t001), (0.1, t01), (1.0, t1), (10.0, t10)])
            if nf:
                spans_linear = lo <= 1.0 <= hi
                rec["e_loo_min"] = round(lo, 3)
                rec["e_loo_max"] = round(hi, 3)
                rec["e_loo_fits"] = nf
                rec["e_spans_linear"] = spans_linear
        if name in spill:
            rec["spill_bytes"] = spill[name]
        t20 = b20.get(name)
        if t20 is not None and t20 > 0:
            # high-scale window (sf1 / sf10 / sf20): for these queries
            # the FLAG RULE evaluates here, not on the overhead-dominated
            # low decades — e_high > FLAG_E plus a super-linear sf10->
            # sf20 step (ratio > 1.2 * 2x data) plus material cost
            t10h = b10f.get(name) or t10
            rec["t_sf20"] = t20
            if name in b10f:
                rec["t_sf10_fresh"] = b10f[name]
            e_high = fit_general([(1.0, t1), (10.0, t10h), (20.0, t20)])
            rec["e_high"] = round(e_high, 3) if e_high is not None else None
            rec["step_sf10_sf20"] = round(t20 / t10h, 2)
            queries[name] = rec
            if (e_high is not None and e_high > FLAG_E
                    and t20 / t10h > 1.2 * 2.0 and t20 >= FLAG_T10):
                flagged.append(name)
            continue
        queries[name] = rec
        if (e is not None and e > FLAG_E and t10 >= FLAG_T10
                and t10 / t1 > 10.0):
            (flagged if ok else low_conf).append(name)

    # tail probes: isolated same-session measurements past the fitted
    # window; a flag whose probe scales <= 1.2x linearly is absolved
    absolved = []
    if os.path.exists("TAIL_PROBES.json"):
        probes = json.load(open("TAIL_PROBES.json"))["probes"]
        for name, pr in probes.items():
            if name in flagged:
                k = pr["sf_hi"] / pr["sf_lo"]
                ratio = pr["t_hi"] / pr["t_lo"]
                if ratio <= 1.2 * k:
                    flagged.remove(name)
                    absolved.append(name)
                    queries[name]["tail_probe"] = {
                        **pr, "ratio": round(ratio, 2),
                        "linear_bound": round(1.2 * k, 2)}
    def esort(n):
        r = queries[n]
        return -(r.get("e_high") if r.get("t_sf20") is not None
                 and r.get("e_high") is not None
                 else (r["exponent"] if r["exponent"] is not None else -99))
    flagged.sort(key=esort)
    low_conf.sort(key=esort)
    doc = {
        "metric": "growth_curve",
        "model": "t(sf) = c + a*sf^e; e = log10((t10-t1)/(t1-t01)); "
                 "e_loo_* = leave-one-out refits over 4 scale points; "
                 "e_high = 3-point fit over sf1/sf10/sf20 where an sf20 "
                 "heavy-tier point exists",
        "inputs": {"sf0.1": sf01, "sf1": sf1, "sf10": sf10,
                   **({"sf0.01": sf001} if sf001 else {}),
                   **({"sf20": sf20} if sf20 else {}),
                   **({"sf10_fresh": sf10_fresh} if sf10_fresh else {})},
        "flag_rule": f"e > {FLAG_E} and tail t_sf10/t_sf1 > 10 and "
                     f"t_sf10 >= {FLAG_T10}s and sf0.1->sf1 delta "
                     "above noise; queries WITH an sf20 point instead "
                     f"flag on the high window: e_high > {FLAG_E} and "
                     "t_sf20/t_sf10_fresh > 2.4 and t_sf20 >= "
                     f"{FLAG_T10}s; flags with a committed linear tail "
                     "probe (TAIL_PROBES.json) are absolved",
        "flagged_superlinear": flagged,
        "absolved_by_tail_probe": absolved,
        "low_confidence_superlinear": low_conf,
        "n_queries": len(queries),
        "queries": queries,
    }
    with open(out, "w") as f:
        json.dump(doc, f, indent=1)
    print(f"fitted {len(queries)} queries -> {out}")
    print(f"flagged_superlinear: {flagged}")
    print(f"low_confidence_superlinear: {low_conf}")
    spanning = [q for q, r in queries.items()
                if r.get("e_spans_linear") and (r["exponent"] or 0) > FLAG_E]
    if spanning:
        print(f"steep-but-spans-linear (documented noise): {sorted(spanning)}")
    ranked = sorted((q for q, r in queries.items()
                     if r["exponent"] is not None and r["t_sf10"] >= FLAG_T10),
                    key=lambda q: -queries[q]["exponent"])[:10]
    print("\n| query | sf0.1 s | sf1 s | sf10 s | e | e_loo | c | conf |")
    print("|---|---|---|---|---|---|---|---|")
    for q in ranked:
        r = queries[q]
        loo = (f"[{r['e_loo_min']}, {r['e_loo_max']}]"
               if "e_loo_min" in r else "-")
        print(f"| {q} | {r['t_sf01']} | {r['t_sf1']} | {r['t_sf10']} "
              f"| {r['exponent']} | {loo} | {r['overhead_c']} | {r['confidence']} |")


if __name__ == "__main__":
    main(*sys.argv[1:])
