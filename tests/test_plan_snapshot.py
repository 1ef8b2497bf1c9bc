"""Whole-surface plan-shape regression gate.

tests/test_plans.py pins a handful of hand-chosen plans; this test
compares EVERY statically-planned contract query's physical-plan
counters against the committed PLANS.json snapshot (see
tools/plan_snapshot.py). A rewrite that silently adds an exchange,
drops a broadcast, widens a scan, or pulls a Python worker into a JVM
path fails here with the exact counter diff.

On intentional plan changes: re-run
``python tools/plan_snapshot.py --write``, eyeball the PLANS.json diff
(is the new shape the plan you WANT at 100 TB?), and commit it with
the change.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")


def test_plan_snapshot_matches(spark):
    from plan_snapshot import SNAPSHOT_PATH, diff, snapshot

    assert os.path.exists(SNAPSHOT_PATH), (
        "PLANS.json missing — run: python tools/plan_snapshot.py --write"
    )
    with open(SNAPSHOT_PATH) as f:
        committed = json.load(f)
    current = snapshot(spark, "/root/testdata/sf0.001")
    drift = diff(committed, current)
    assert not drift, "\n".join(drift)
