#!/usr/bin/env python3
"""Compare two Bench JSON lines and flag real regressions.

Usage: python3 tools/bench_diff.py OLD.json NEW.json [ratio]

When tools/bench_band.json exists (computed from the 29-run
BENCH_LOCAL.json git history by tools/bench_band.py), each query's
regression threshold is its MEASURED per-query noise band: flag when
new/old exceeds 1.25x the query's historical p95 run-to-run ratio AND
the absolute delta exceeds 1 s. This distinguishes environment wobble
(r12: t_tfidf x1.62 with zero code change) from real plan regressions
mechanically. Re-run bench_band.py after committing new BENCH_LOCAL
revisions to keep the band current.

Without a band file the legacy rule applies: flagged when new/old
exceeds `ratio` (default 2.0) AND the absolute delta exceeds 1 s
(sub-second queries swing 2-3x on JIT/scheduling noise alone). HTTP
gates (`h_*`) get a wider band either way: their quiet-window medians
(SURVEY §5) show ±0.8 s of stub/scheduling jitter, so they flag only
past old+0.8 s AND the ratio. Queries present on one side only are
listed separately (new/removed, not regressions).
"""
import json
import sys
from pathlib import Path

BAND_FILE = Path(__file__).resolve().parent / "bench_band.json"


def load(path):
    return json.loads(open(path).read())


def main():
    old, new = load(sys.argv[1]), load(sys.argv[2])
    ratio = float(sys.argv[3]) if len(sys.argv) > 3 else 2.0
    # band provenance (r14, per the r13 verdict): a stale band —
    # generated before the latest BENCH_LOCAL commits — silently
    # mis-calibrates; surface its vintage and flag staleness
    import band_util
    band_doc, recorded, actual = band_util.band_provenance()
    bands = {}
    if band_doc is not None:
        bands = band_doc.get("queries", {})
        stale = (" — STALE: %d BENCH_LOCAL revisions in history, re-run "
                 "tools/bench_band.py" % actual
                 if band_util.is_stale(recorded, actual) else "")
        print(f"band: {len(bands)} queries over {recorded} revisions "
              f"(generated at {band_doc.get('generated_at_commit', '?')})"
              f"{stale}")
    oq, nq = old["queries"], new["queries"]
    flags, improved = [], []
    for name in sorted(set(oq) & set(nq)):
        a, b = oq[name], nq[name]
        # measured per-query band when available (x1.25 headroom over the
        # historical p95 so the band's own tail doesn't flag), legacy
        # ratio otherwise
        r = bands[name]["band"] * 1.25 if name in bands else ratio
        if name.startswith("h_"):
            bad = b > a + 0.8 and b > a * r
        else:
            bad = b > a * r and b - a > 1.0
        if bad:
            flags.append((name, a, b))
        elif a > b * ratio and a - b > 1.0:
            improved.append((name, a, b))
    print(f"old total {old['value']:.1f}s ({len(oq)} queries) -> "
          f"new total {new['value']:.1f}s ({len(nq)} queries)")
    for name, a, b in flags:
        pa = bands.get(name, {}).get("priced_at")
        note = (f"  [priced at {pa['commit']}: {pa['note']}]" if pa else "")
        print(f"REGRESSED {name}: {a:.2f}s -> {b:.2f}s ({b / a:.1f}x){note}")
    for name, a, b in improved:
        print(f"improved  {name}: {a:.2f}s -> {b:.2f}s")
    only_new = sorted(set(nq) - set(oq))
    only_old = sorted(set(oq) - set(nq))
    if only_new:
        print(f"new queries: {', '.join(only_new)}")
    if only_old:
        print(f"removed queries: {', '.join(only_old)}")
    failed = new.get("failed")
    if failed:
        print(f"FAILED in new run: {', '.join(failed)}")
    sys.exit(1 if flags or failed else 0)


if __name__ == "__main__":
    main()
