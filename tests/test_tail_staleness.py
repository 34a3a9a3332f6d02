"""Rotation-staleness guard for the driver's 50-entry recording
window.

The driver records correctness for only the first 50 registry entries;
the tail rides on its last recorded green round. That is only sound if
tail entries are UNCHANGED since that round — this test enforces it by
digesting each tail entry's oracle SQL and normalized analyzed plan
against the snapshot taken when the tail was last rotated
(tests/data/tail_snapshots.json, written by tools/snapshot_tail.py).

A failure here means a tail query's semantics may have drifted after
its recorded pass: rotate it back into the 50-entry window (and move a
freshly-recorded green entry to the tail), then re-snapshot.
"""

from __future__ import annotations


import json
import os

import pytest

from sarfile_analyzer_ng_spark.queries import REGISTRY
from tools.snapshot_tail import SNAPSHOT_PATH, WINDOW, tail_digests

pytestmark = pytest.mark.driver  # driver-facing gate (see conftest)

TAIL = list(REGISTRY)[WINDOW:]


@pytest.fixture(scope="module")
def snapshot():
    assert os.path.exists(SNAPSHOT_PATH), (
        "tail snapshot missing - run tools/snapshot_tail.py when rotating"
    )
    with open(SNAPSHOT_PATH) as f:
        return json.load(f)


def test_every_tail_entry_is_snapshotted(snapshot):
    # a key in the tail but not in the snapshot is new/moved since the
    # last rotation - it belongs in the window until recorded green
    assert set(TAIL) == set(snapshot), (
        f"tail/snapshot drift: only_tail={sorted(set(TAIL) - set(snapshot))} "
        f"only_snapshot={sorted(set(snapshot) - set(TAIL))}"
    )


def test_tail_entries_unchanged_since_recorded_round(spark, snapshot):
    current = tail_digests(spark)
    stale = []
    for key in TAIL:
        want, got = snapshot.get(key, {}), current[key]
        if want.get("sql_sha") != got["sql_sha"]:
            stale.append(f"{key}: oracle SQL changed")
        elif want.get("plan_sha") != got["plan_sha"]:
            stale.append(f"{key}: analyzed plan changed")
    assert not stale, (
        "tail queries changed since their last driver-recorded pass - "
        "rotate them into the 50-entry window: " + "; ".join(stale)
    )
