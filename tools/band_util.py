"""Shared bench-band provenance check (used by bench_diff.py and
round_close.py so the staleness rule cannot drift between them).
"""
import json
import subprocess
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
BAND_FILE = REPO / "tools/bench_band.json"


def band_provenance():
    """(band_doc, recorded_revisions, actual_revisions).

    recorded is None for a legacy band file that lacks the 'revisions'
    key — its 'runs' field counts only parseable runs, undercounting the
    revision history, so trusting it would mask staleness. actual is
    None when git is unavailable OR the rev-list command fails (a
    nonzero returncode used to yield actual=0 and silently read as
    fresh); band_doc is None when no band file exists.
    """
    if not BAND_FILE.exists():
        return None, None, None
    doc = json.loads(BAND_FILE.read_text())
    recorded = doc.get("revisions")  # None => legacy file, treated stale
    try:
        proc = subprocess.run(
            ["git", "rev-list", "HEAD", "--", "BENCH_LOCAL.json"],
            cwd=REPO, capture_output=True, text=True)
        actual = len(proc.stdout.split()) if proc.returncode == 0 else None
    except Exception:
        actual = None
    return doc, recorded, actual


def is_stale(recorded, actual):
    """Stale when the band predates history we can see, or when the band
    file is legacy-format (recorded is None) — absence of provenance is
    staleness, not freshness. Unknown git state (actual None) stays
    un-flagged: we cannot distinguish stale from fresh without history.
    """
    if actual is None:
        return False
    return recorded is None or actual > recorded
