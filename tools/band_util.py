"""Shared bench-band provenance check (used by bench_diff.py and
round_close.py so the staleness rule cannot drift between them).
"""
import json
import subprocess
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
BAND_FILE = REPO / "tools/bench_band.json"


def band_provenance():
    """(band_doc, recorded_revisions, actual_revisions) — actual is None
    when git is unavailable; band_doc is None when no band file exists."""
    if not BAND_FILE.exists():
        return None, 0, None
    doc = json.loads(BAND_FILE.read_text())
    recorded = doc.get("revisions", doc.get("runs", 0))
    try:
        actual = len(subprocess.run(
            ["git", "rev-list", "HEAD", "--", "BENCH_LOCAL.json"],
            cwd=REPO, capture_output=True, text=True).stdout.split())
    except Exception:
        actual = None
    return doc, recorded, actual


def is_stale(recorded, actual):
    return actual is not None and actual > recorded
