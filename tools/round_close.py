#!/usr/bin/env python3
"""Round-close hygiene gate (r14, per the r13 verdict's ask #5): the
one-command check that the round's artifacts actually made it into git —
the regression that recurred in r12 and r13 (BENCH_rN/CORRECTNESS_rN
left untracked at judging time).

Checks, exiting non-zero on any failure:
  1. `git status --porcelain` is EMPTY (no untracked/modified files);
  2. the highest-numbered BENCH_r*.json and CORRECTNESS_r*.json on disk
     are git-tracked;
  3. tools/bench_band.json is not stale (its recorded BENCH_LOCAL
     revision count matches the history).

Run as the LAST step of a round, after the final artifact commit:
    python3 tools/round_close.py
"""

import re
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def sh(*args):
    return subprocess.run(
        args, cwd=REPO, capture_output=True, text=True, check=True).stdout


def main():
    failures = []

    porcelain = sh("git", "status", "--porcelain").strip()
    if porcelain:
        failures.append("working tree not clean:\n" + porcelain)

    tracked = set(sh("git", "ls-files").split())
    for pattern in ("BENCH_r*.json", "CORRECTNESS_r*.json"):
        on_disk = sorted(
            REPO.glob(pattern),
            key=lambda p: int(re.search(r"r(\d+)", p.name).group(1)))
        if on_disk and on_disk[-1].name not in tracked:
            failures.append(f"latest artifact {on_disk[-1].name} is untracked")

    import band_util
    _, recorded, actual = band_util.band_provenance()
    if band_util.is_stale(recorded, actual):
        failures.append(
            f"bench band is stale ({recorded} recorded vs {actual} "
            "BENCH_LOCAL revisions) — re-run tools/bench_band.py and "
            "commit")

    if failures:
        print("ROUND-CLOSE FAILED:")
        for f in failures:
            print(" -", f)
        sys.exit(1)
    print("round-close clean: tree committed, artifacts tracked, band fresh")


if __name__ == "__main__":
    main()
