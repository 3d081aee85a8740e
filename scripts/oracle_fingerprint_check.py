#!/usr/bin/env python3
"""Compare every registered oracle_sql() text against a reference git
rev (default: the round-start commit) — a changed or missing oracle is
graded as a regression by the driver, so this must print ZERO diffs.

Usage: python3 scripts/oracle_fingerprint_check.py [ref_rev]
"""
from __future__ import annotations

import hashlib
import os
import subprocess
import sys

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def fingerprints(tree: str) -> dict:
    out = subprocess.run(
        [sys.executable, "-c",
         "import sys, hashlib; sys.path.insert(0, sys.argv[1]);"
         "import pdfspark.queries as q;"
         "print('\\n'.join(f'{n} {hashlib.md5(s.encode()).hexdigest()}'"
         " for n, s in sorted(q.ORACLES.items())))",
         tree],
        capture_output=True, text=True, check=True)
    return dict(line.split() for line in out.stdout.splitlines())


def main() -> None:
    ref = sys.argv[1] if len(sys.argv) > 1 else "aaa56f0"
    wt = "/tmp/oracle_fp_ref_wt"
    subprocess.run(["git", "-C", REPO_ROOT, "worktree", "add", "-q",
                    "--force", wt, ref], check=True)
    try:
        start = fingerprints(wt)
    finally:
        subprocess.run(["git", "-C", REPO_ROOT, "worktree", "remove",
                        "--force", wt], check=True)
    now = fingerprints(REPO_ROOT)
    missing = sorted(set(start) - set(now))
    changed = sorted(n for n in start if n in now and start[n] != now[n])
    print(f"ref={ref} oracles={len(start)} now={len(now)} "
          f"missing={missing} changed={changed}")
    if missing or changed:
        sys.exit(1)


if __name__ == "__main__":
    main()
