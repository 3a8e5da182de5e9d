"""Qualification-report fixture — the bdd_experiment ``pdf_report`` analog.

The reference threads a report-accumulator fixture through given/when/then
steps so acceptance evidence lands in a generated document
(bdd_experiment/test/conftest.py:6-22). Here the fixture collects
structured step evidence per test and writes a JSON + human-readable
report into ``tests/qualification/reports/`` at session end.
"""

import json
import time
from pathlib import Path

import pytest

_REPORT_DIR = Path(__file__).parent / "reports"


class QualificationReport:
    def __init__(self, test_name: str):
        self.test_name = test_name
        self.steps = []
        self.detail = {}

    def step(self, keyword: str, text: str, **evidence) -> None:
        """Record one Given/When/Then step with structured evidence."""
        self.steps.append(
            {"keyword": keyword, "text": text, "evidence": evidence}
        )

    def detail_entry(self, key: str, value) -> None:
        self.detail[key] = value


_collected = []


@pytest.fixture
def report(request):
    rep = QualificationReport(request.node.name)
    yield rep
    _collected.append(rep)


def pytest_sessionfinish(session, exitstatus):
    if not _collected:
        return
    _REPORT_DIR.mkdir(exist_ok=True)
    stamp = time.strftime("%Y%m%d-%H%M%S")
    doc = {
        "generated": stamp,
        "exitstatus": int(exitstatus),
        "tests": [
            {"name": r.test_name, "steps": r.steps, "detail": r.detail}
            for r in _collected
        ],
    }
    (_REPORT_DIR / f"qualification-{stamp}.json").write_text(
        json.dumps(doc, indent=2, default=str)
    )
    lines = [f"Qualification report — {stamp}", "=" * 40]
    for r in _collected:
        lines.append(f"\n{r.test_name}")
        for s in r.steps:
            ev = ", ".join(f"{k}={v}" for k, v in s["evidence"].items())
            lines.append(f"  {s['keyword']:6s} {s['text']}" + (f"  [{ev}]" if ev else ""))
    (_REPORT_DIR / f"qualification-{stamp}.txt").write_text("\n".join(lines))
    _collected.clear()
