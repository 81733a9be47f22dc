#!/usr/bin/env python
"""Line-coverage gate for the test suite (no external deps).

Rebuild of the reference's coverage gate (scripts/check-coverage.py +
coverage-thresholds.json, CI_rs.yml:88-110: cargo llvm-cov JSON checked
against per-file thresholds, default 75%). No coverage package is
installed here, so this uses Python 3.12's `sys.monitoring` (PEP 669)
LINE events with per-location disarming — near-zero steady-state
overhead — and computes executable lines from compiled code objects.

Usage:
    python scripts/coverage_gate.py [pytest args...]

Exit code 1 when any tensor4all_tpu file falls below its threshold.
Thresholds: scripts/coverage-thresholds.json {"default": pct,
"files": {"relative/path.py": pct}}.
"""

from __future__ import annotations

import json
import os
import sys
from collections import defaultdict

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = os.path.join(ROOT, "tensor4all_tpu")
THRESHOLDS = os.path.join(ROOT, "scripts", "coverage-thresholds.json")

executed: dict = defaultdict(set)


def _install() -> None:
    mon = sys.monitoring
    tool = mon.COVERAGE_ID
    mon.use_tool_id(tool, "t4a-coverage-gate")

    def on_line(code, line):
        fn = code.co_filename
        if fn.startswith(PKG):
            executed[fn].add(line)
        return mon.DISABLE  # disarm this location after the first hit

    mon.register_callback(tool, mon.events.LINE, on_line)
    mon.set_events(tool, mon.events.LINE)


def _executable_lines(path: str) -> set:
    """All line numbers carrying executable code (recursive co_lines)."""
    with open(path, "r") as f:
        src = f.read()
    try:
        top = compile(src, path, "exec")
    except SyntaxError:
        return set()
    lines: set = set()
    stack = [top]
    while stack:
        code = stack.pop()
        for _, _, ln in code.co_lines():
            if ln is not None:
                lines.add(ln)
        for const in code.co_consts:
            if hasattr(const, "co_lines"):
                stack.append(const)
    # docstring-only / def lines still count; that matches llvm-cov's
    # instrumented-line notion closely enough for a gate
    return lines


def main() -> int:
    sys.path.insert(0, ROOT)  # running from scripts/ loses the repo root
    os.chdir(ROOT)
    _install()
    import pytest

    args = sys.argv[1:] or ["tests/", "-q", "-x"]
    rc = pytest.main(args)
    if rc != 0:
        print(f"pytest failed (rc={rc}); coverage not evaluated")
        return int(rc)

    cfg = {"default": 75, "files": {}}
    if os.path.exists(THRESHOLDS):
        with open(THRESHOLDS) as f:
            cfg.update(json.load(f))

    rows = []
    failures = []
    for dirpath, _, files in os.walk(PKG):
        for f in sorted(files):
            if not f.endswith(".py"):
                continue
            path = os.path.join(dirpath, f)
            rel = os.path.relpath(path, ROOT)
            total = _executable_lines(path)
            if not total:
                continue
            hit = executed.get(path, set()) & total
            pct = 100.0 * len(hit) / len(total)
            thr = cfg["files"].get(rel, cfg["default"])
            rows.append((rel, pct, thr, len(hit), len(total)))
            if pct < thr:
                failures.append((rel, pct, thr))
    rows.sort(key=lambda r: r[1])
    print(f"\n{'file':58s} {'cov%':>6s} {'thr':>5s} {'lines':>12s}")
    for rel, pct, thr, h, t in rows:
        mark = " " if pct >= thr else "!"
        print(f"{mark}{rel:57s} {pct:6.1f} {thr:5.0f} {h:5d}/{t:<6d}")
    covered = sum(r[3] for r in rows)
    total = sum(r[4] for r in rows)
    print(f"\nTOTAL {100.0 * covered / total:.1f}% ({covered}/{total})")
    if failures:
        print(f"\nFAIL: {len(failures)} file(s) below threshold")
        return 1
    print("coverage gate OK")
    return 0


if __name__ == "__main__":
    sys.exit(main())
