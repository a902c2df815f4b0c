"""README claim-drift guard (VERDICT r4 weak item 3 / item 8).

Three rounds in a row the README's hand-typed numbers fell behind the repo.
The fix is ``tools/sync_readme.py`` (derives them from artifacts into
marker-wrapped spans); these tests pin the mechanism so the drift class
cannot silently return:

- the markers exist (deleting one would break the sync tool),
- the bench-range / vs-baseline spans match what the committed
  ``BENCH_r*.json`` artifacts derive to (same logic as the tool, no
  subprocess), so a new driver record without a re-sync fails the suite.

The test-count span can't be checked here without a nested pytest run;
``tools/sync_readme.py --check`` covers it out-of-band.
"""

import pathlib
import re
import sys

ROOT = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT / "tools"))


def _span(text: str, tag: str) -> str:
    m = re.search(f"<!--{tag}-->(.*?)<!--/{tag}-->", text, re.S)
    assert m, f"README marker <!--{tag}--> missing"
    return m.group(1)


def test_readme_markers_present_and_bench_spans_in_sync():
    import sync_readme

    text = (ROOT / "README.md").read_text()
    vals = sync_readme.bench_headline_values()
    lo, hi = min(vals), max(vals)
    assert _span(text, "TEST_COUNT").isdigit()
    assert _span(text, "BENCH_RANGE") == f"~{lo / 1000:.1f}k-{hi / 1000:.1f}k"
    anchor = sync_readme.ANCHOR_P20
    assert _span(text, "BENCH_VSBASE") == f"~{lo / anchor:.0f}-{hi / anchor:.0f}×"


def test_bench_artifacts_parse():
    import sync_readme

    vals = sync_readme.bench_headline_values()
    # Every committed round's headline should be a sane steps/s figure.
    assert len(vals) >= 4
    assert all(1000 < v < 100000 for v in vals)
