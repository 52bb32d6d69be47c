"""Round-end gate for the FNFT_SLOW_TESTS tier.

The scale tests (D=2^16 full spectrum, df64 at scale, rootfinder
ceiling, sharded nsep equivalence) are skipped in the default suite so
routine runs stay minutes, not hours — which means regressions at scale
can hide. This script runs the whole gated tier once and appends one
JSONL record to SLOW_GATE.jsonl so every round leaves a dated
pass/fail mark for the tier.

Usage:
    python tools/slow_gate.py             # full tier (can take ~1-2h)
    python tools/slow_gate.py --quick     # skip the deg-1e5 roots ceiling
"""

from __future__ import annotations

import argparse
import datetime
import json
import os
import pathlib
import re
import subprocess
import sys
import time

REPO = pathlib.Path(__file__).resolve().parents[1]
OUT = REPO / "SLOW_GATE.jsonl"

# every file that carries FNFT_SLOW_TESTS-gated cases (grep-maintained;
# the assertion below catches drift)
SLOW_FILES = [
    "tests/test_roots_scale.py",
    "tests/test_dshard_nsep.py",
    "tests/test_dshard_boundstates.py",
    "tests/test_finvscatter_staged.py",
    "tests/test_df64_inverse.py",
    "tests/test_df64.py",
    "tests/test_scatter_chunked.py",
]

# the roots ceiling case runs ~25 min alone; --quick deselects it
CEILING_PATTERN = "ceiling"


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true",
                    help="skip the deg>=1e5 rootfinder ceiling case")
    ap.add_argument("--timeout", type=int, default=7200)
    args = ap.parse_args()

    listed = subprocess.run(
        ["grep", "-rl", "FNFT_SLOW_TESTS", "tests/"],
        capture_output=True, text=True, cwd=REPO).stdout.split()
    missing = sorted(set(listed) - set(SLOW_FILES))
    if missing:
        print(f"slow_gate: SLOW_FILES is stale, add: {missing}",
              file=sys.stderr)
        return 2

    cmd = [sys.executable, "-m", "pytest", "-q", *SLOW_FILES]
    if args.quick:
        cmd += ["-k", f"not {CEILING_PATTERN}"]
    env = dict(os.environ, FNFT_SLOW_TESTS="1")

    t0 = time.monotonic()
    proc = subprocess.run(cmd, cwd=REPO, env=env, capture_output=True,
                          text=True, timeout=args.timeout)
    wall = time.monotonic() - t0

    tail = proc.stdout.strip().splitlines()[-1] if proc.stdout.strip() else ""
    counts = {key: int(n) for n, key in
              re.findall(r"(\d+) (passed|failed|skipped|error)", tail)}
    rec = {
        "ts": datetime.datetime.now().isoformat(timespec="seconds"),
        "ok": proc.returncode == 0,
        "wall_seconds": round(wall, 1),
        "quick": args.quick,
        **counts,
        "summary": tail[:200],
    }
    with OUT.open("a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec))
    if proc.returncode != 0:
        print(proc.stdout[-4000:], file=sys.stderr)
    return proc.returncode


if __name__ == "__main__":
    sys.exit(main())
