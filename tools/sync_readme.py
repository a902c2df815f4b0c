"""Derive README.md's volatile numeric claims from artifacts.

Three consecutive round verdicts flagged the same drift class: the README's
hand-typed test count and bench range fell behind the repo (138→142,
173→241, 267→272).  The fix is mechanical derivation (VERDICT r4 item 8):
the claims live between HTML-comment markers and this script rewrites them
from the ground truth —

- ``<!--TEST_COUNT-->…<!--/TEST_COUNT-->`` from
  ``pytest tests/ --collect-only -q`` (forced-CPU, same env as the suite),
- ``<!--BENCH_RANGE-->…<!--/BENCH_RANGE-->`` and
  ``<!--BENCH_VSBASE-->…<!--/BENCH_VSBASE-->`` from the committed
  ``BENCH_r*.json`` driver artifacts (headline train metric only).

Run after adding tests or landing a new BENCH record:

    python tools/sync_readme.py          # rewrites README.md in place
    python tools/sync_readme.py --check  # exit 1 if README is stale
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import re
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# The torch-CPU anchor for the headline ratio (BASELINE.md measured anchor).
ANCHOR_P20 = 7.618


def collect_test_count() -> int:
    env = dict(os.environ,
               PALLAS_AXON_POOL_IPS="",
               JAX_PLATFORMS="cpu",
               XLA_FLAGS="--xla_force_host_platform_device_count=8")
    out = subprocess.run(
        [sys.executable, "-m", "pytest", "tests/", "--collect-only", "-q"],
        cwd=ROOT, env=env, capture_output=True, text=True, timeout=600)
    m = re.search(r"(\d+) tests collected", out.stdout)
    if not m:
        # pytest prints "N/M tests collected" when deselection is active,
        # or "no tests ran"; surface whatever it said.
        raise RuntimeError(f"could not parse collect-only output:\n"
                           f"{out.stdout[-2000:]}\n{out.stderr[-2000:]}")
    return int(m.group(1))


def bench_headline_values() -> list[float]:
    vals = []
    for path in sorted(glob.glob(os.path.join(ROOT, "BENCH_r*.json"))):
        with open(path) as f:
            rec = json.load(f)
        parsed = rec.get("parsed") or {}
        if "phase1" in str(parsed.get("metric", "")):
            vals.append(float(parsed["value"]))
    if not vals:
        raise RuntimeError("no BENCH_r*.json with a parsed phase1 metric")
    return vals


def _sub(text: str, tag: str, value: str) -> str:
    pattern = re.compile(f"(<!--{tag}-->).*?(<!--/{tag}-->)", re.S)
    if not pattern.search(text):
        raise RuntimeError(f"README marker <!--{tag}--> missing")
    return pattern.sub(lambda m: m.group(1) + value + m.group(2), text)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--check", action="store_true",
                    help="exit 1 if README.md would change")
    args = ap.parse_args()

    readme = os.path.join(ROOT, "README.md")
    with open(readme) as f:
        text = f.read()

    n_tests = collect_test_count()
    vals = bench_headline_values()
    lo, hi = min(vals), max(vals)
    new = _sub(text, "TEST_COUNT", str(n_tests))
    new = _sub(new, "BENCH_RANGE", f"~{lo / 1000:.1f}k-{hi / 1000:.1f}k")
    new = _sub(new, "BENCH_VSBASE",
               f"~{lo / ANCHOR_P20:.0f}-{hi / ANCHOR_P20:.0f}×")

    if new == text:
        print(f"README in sync (tests={n_tests}, bench {lo:.0f}-{hi:.0f})")
        return 0
    if args.check:
        print("README.md is STALE — run tools/sync_readme.py", file=sys.stderr)
        return 1
    with open(readme, "w") as f:
        f.write(new)
    print(f"README updated: tests={n_tests}, bench {lo:.0f}-{hi:.0f} steps/s")
    return 0


if __name__ == "__main__":
    sys.exit(main())
