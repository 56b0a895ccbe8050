"""README <-> PERFORMANCE.md consistency (round-3 verdict ask #5: the
README's headline perf number went stale against the measurement ledger
in two consecutive rounds; this pins them together).

Convention: PERFORMANCE.md's optimization-ledger table carries the
current headline as the LAST bold number in a table row
(`| **X.XXX** |`), and README.md states the same number as
`**X.XXX MDoF·Newmark-steps/s**` (whitespace/newline tolerated between
number and unit)."""

import os
import re

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _read(name):
    with open(os.path.join(ROOT, name)) as fh:
        return fh.read()


def test_readme_headline_matches_performance_ledger():
    readme = _read("README.md")
    perf = _read("PERFORMANCE.md")

    m = re.search(
        r"\*\*([\d.]+)\s*\n?\s*MDoF·Newmark-steps/s\*\*", readme
    )
    assert m, (
        "README.md must state the headline as "
        "'**<value> MDoF·Newmark-steps/s**'"
    )
    readme_value = float(m.group(1))

    ledger = re.findall(r"\|\s*\*\*([\d.]+)\*\*\s*\|", perf)
    assert ledger, (
        "PERFORMANCE.md's ledger must carry the current headline as a "
        "bold table cell '| **<value>** |'"
    )
    ledger_value = float(ledger[-1])

    assert readme_value == ledger_value, (
        f"README.md headline ({readme_value}) is stale against "
        f"PERFORMANCE.md's ledger ({ledger_value}) — update the README "
        "perf section whenever a new hardware measurement lands"
    )
