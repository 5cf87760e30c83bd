#!/usr/bin/env python3
"""Compute the per-query bench variance band from BENCH_LOCAL.json history.

Every committed revision of BENCH_LOCAL.json is a full 32-CPU sf0.1 bench
run on this machine. Consecutive-revision ratios for the SAME query are
dominated by environment noise (JIT, scheduling, warm fixtures) — r12's
t_tfidf swung x1.62 with zero code change — so the per-query band is the
observed distribution of those run-to-run increases:

    band(q) = clamp(p95 of h[i+1]/h[i] over history, 1.3, 3.0)

`bench_diff.py` flags a regression only past this measured band (plus an
absolute floor), which separates real plan regressions from wobble
mechanically instead of by eyeball.

A refresh is NOT allowed to silently ratchet: folding a recent slowdown
into the band would let a same-size future regression pass unflagged
(r14 widened h_retry_exp 1.3->1.812 this way). By default each query's
band may grow at most WIDEN_CAP (x1.15) per refresh over the committed
band; queries capped this way are listed loudly. Pass --ack-widen only
after the widened readings have been adjudicated (quiet-window probes or
a named cause) — the acknowledgment is recorded in the band file.

A band may also carry a `priced_at` note (r16, per the r15 verdict's
ask #8): when a gate's IN-GATE work deliberately changes (a new audit,
an added quality floor), record the priced cost explicitly with

    python3 tools/bench_band.py --price QUERY "what was added and why"

so a later bench_diff flag on that query reads as "paid for new
verification at <commit>" instead of an unexplained slowdown. Notes
survive refreshes until re-priced.

Usage:
    python3 tools/bench_band.py            # writes tools/bench_band.json
    python3 tools/bench_band.py --ack-widen "reason"  # accept wider bands
    python3 tools/bench_band.py --price QUERY "note"  # annotate priced cost
    python3 tools/bench_band.py --print    # band summary for SURVEY §5
"""
import json
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
OUT = REPO / "tools/bench_band.json"


def histories():
    """query -> [seconds...] oldest->newest from git BENCH_LOCAL.json."""
    revs = subprocess.run(
        ["git", "rev-list", "--reverse", "HEAD", "--", "BENCH_LOCAL.json"],
        cwd=REPO, capture_output=True, text=True, check=True,
    ).stdout.split()
    hist = {}
    kept = 0
    for rev in revs:
        show = subprocess.run(
            ["git", "show", f"{rev}:BENCH_LOCAL.json"],
            cwd=REPO, capture_output=True, text=True)
        if show.returncode != 0:
            continue
        try:
            queries = json.loads(show.stdout).get("queries", {})
        except json.JSONDecodeError:
            continue
        if not queries:
            continue
        kept += 1
        for q, s in queries.items():
            hist.setdefault(q, []).append(float(s))
    return hist, kept, len(revs)


def quantile(xs, p):
    xs = sorted(xs)
    if not xs:
        return None
    i = min(len(xs) - 1, int(round(p * (len(xs) - 1))))
    return xs[i]


WIDEN_CAP = 1.15  # max per-refresh band growth without acknowledgment


def price(query, note):
    """Annotate one query's band entry with a priced in-gate-cost note."""
    doc = json.loads(OUT.read_text())
    entry = doc.setdefault("queries", {}).setdefault(query, {})
    head = subprocess.run(
        ["git", "rev-parse", "--short", "HEAD"],
        cwd=REPO, capture_output=True, text=True).stdout.strip()
    entry["priced_at"] = {"commit": head, "note": note}
    OUT.write_text(json.dumps(doc, indent=1, sort_keys=True) + "\n")
    print(f"priced {query} at {head}: {note}")


def main():
    if "--price" in sys.argv:
        i = sys.argv.index("--price")
        price(sys.argv[i + 1], sys.argv[i + 2])
        return
    hist, n_runs, n_revs = histories()
    prior = {}
    ack = None
    if "--ack-widen" in sys.argv:
        i = sys.argv.index("--ack-widen")
        ack = sys.argv[i + 1] if i + 1 < len(sys.argv) else "acknowledged"
    # committed = the COMMITTED band, not the on-disk file: repeated
    # uncommitted regens would otherwise compound the x1.15 allowance.
    # Loaded regardless of --ack-widen because priced_at notes must
    # survive every refresh; the widen-cap prior only applies sans ack.
    committed = {}
    show = subprocess.run(
        ["git", "show", "HEAD:tools/bench_band.json"],
        cwd=REPO, capture_output=True, text=True)
    if show.returncode == 0:
        try:
            committed = json.loads(show.stdout).get("queries", {})
        except json.JSONDecodeError:
            committed = {}
    if ack is None:
        prior = committed
    bands = {}
    all_ratios = []
    capped = []
    for q, h in hist.items():
        ratios = [b / a for a, b in zip(h, h[1:]) if a > 0.01]
        if len(ratios) < 2:
            continue  # too little history: bench_diff falls back to default
        all_ratios.extend(ratios)
        band = max(1.3, min(3.0, quantile(ratios, 0.95)))
        old_band = prior.get(q, {}).get("band")
        if old_band is not None and band > old_band * WIDEN_CAP:
            # refuse to silently ratchet up to a recent slowdown: cap the
            # growth and flag for adjudication (--ack-widen to accept)
            capped.append((q, old_band, round(band, 3)))
            band = old_band * WIDEN_CAP
        bands[q] = {
            "n": len(h),
            "median": round(sorted(h)[len(h) // 2], 3),
            "band": round(band, 3),
            "max_ratio_seen": round(max(ratios), 3),
        }
        if "priced_at" in committed.get(q, {}):
            bands[q]["priced_at"] = committed[q]["priced_at"]
    head = subprocess.run(
        ["git", "rev-parse", "--short", "HEAD"],
        cwd=REPO, capture_output=True, text=True).stdout.strip()
    out = {
        "generated_at_commit": head,
        "runs": n_runs,
        "revisions": n_revs,
        **({"widen_ack": ack} if ack else {}),
        "global_p50_ratio": round(quantile(all_ratios, 0.5), 3),
        "global_p95_ratio": round(quantile(all_ratios, 0.95), 3),
        "global_max_ratio": round(max(all_ratios), 3),
        "queries": bands,
    }
    if "--print" in sys.argv:
        wide = sorted(
            ((q, b["band"]) for q, b in bands.items() if b["band"] >= 2.0),
            key=lambda kv: -kv[1])
        print(f"{n_runs} historical runs; {len(bands)} queries banded")
        print(f"run-to-run ratio: p50 x{out['global_p50_ratio']}, "
              f"p95 x{out['global_p95_ratio']}, max x{out['global_max_ratio']}")
        print(f"{len(wide)} queries with band >= x2.0: "
              + ", ".join(f"{q} (x{b})" for q, b in wide[:15]))
    else:
        OUT.write_text(json.dumps(out, indent=1, sort_keys=True) + "\n")
        print(f"wrote {OUT} ({len(bands)} queries, {n_runs} runs)")
        if capped:
            print(f"CAPPED {len(capped)} band(s) at x{WIDEN_CAP}/refresh "
                  "(adjudicate, then --ack-widen to accept):")
            for q, old_b, new_b in sorted(capped, key=lambda t: -t[2]):
                print(f"  {q}: committed x{old_b} -> measured x{new_b}")


if __name__ == "__main__":
    main()
