"""Capture-commit stamping for probe artifacts (round-4 verdict weak #5:
probe JSONs carried no provenance, so staleness vs the current kernels was
undetectable). Every tool that writes a *.json artifact passes its report
through stamped() so the tree records which commit the numbers describe."""
import datetime
import os
import subprocess

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def capture_stamp() -> dict:
    try:
        commit = subprocess.run(
            ["git", "rev-parse", "--short", "HEAD"], cwd=_ROOT,
            capture_output=True, text=True, timeout=10).stdout.strip()
    except Exception:
        commit = "unknown"
    return dict(commit=commit or "unknown",
                captured=datetime.datetime.now(datetime.timezone.utc)
                .strftime("%Y-%m-%dT%H:%M:%SZ"))


def stamped(report: dict) -> dict:
    out = dict(report)
    out["capture"] = capture_stamp()
    return out
