#!/usr/bin/env python3
"""Artifact-citation lint: every BENCH_* / CORRECTNESS_* filename mentioned
in SURVEY.md or README.md must exist as a tracked file in the repo.

Rounds 13 and 14 both shipped prose quoting measured numbers from bench
artifacts that were never committed ("an uncommitted number is a claim,
not an artifact" — VERDICT r14). This lint makes that failure mode
mechanical: run it before committing any SURVEY/README edit, and in the
round-close checklist.

Exit 0 = every cited artifact resolves; exit 1 = at least one is missing
(each printed with the file:line that cites it).

Citations of artifacts that are deliberately historical (mentioned as
"absent"/"missing"/"does not exist", e.g. when SURVEY discusses a prior
round's evidence gap) can be suppressed by putting the token on a line
containing one of the ALLOW_MARKERS.
"""
import re
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
DOCS = ["SURVEY.md", "README.md"]
TOKEN = re.compile(r"\b((?:BENCH|CORRECTNESS)_[A-Za-z0-9_]+)(?:\.json)?\b")
ALLOW_MARKERS = ("absent", "missing", "does not exist", "never committed",
                 "uncommitted", "not re-captured")


def tracked_files():
    out = subprocess.run(["git", "ls-files"], cwd=REPO, check=True,
                         capture_output=True, text=True).stdout
    return set(out.split())


def main() -> int:
    tracked = tracked_files()
    # a cited artifact resolves if the token (with or without .json) is a
    # tracked repo file
    def resolves(tok: str) -> bool:
        if tok.endswith("_"):  # prose prefix like "BENCH_spill_r09_{1g,...}"
            return any(f.startswith(tok) for f in tracked)
        return tok in tracked or f"{tok}.json" in tracked

    failures = []
    for doc in DOCS:
        path = REPO / doc
        if not path.exists():
            continue
        for lineno, line in enumerate(path.read_text().splitlines(), 1):
            low = line.lower()
            if any(m in low for m in ALLOW_MARKERS):
                continue
            for tok in TOKEN.findall(line):
                if not resolves(tok):
                    failures.append((doc, lineno, tok))

    if failures:
        print("cited-but-missing artifacts (commit the artifact with the "
              "prose, or mark the line as historical):")
        for doc, lineno, tok in failures:
            print(f"  {doc}:{lineno}: {tok}")
        return 1
    print("artifact citations OK: every cited BENCH_*/CORRECTNESS_* file "
          "is tracked")
    return 0


if __name__ == "__main__":
    sys.exit(main())
