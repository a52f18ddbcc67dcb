"""SURVEY.md §2.B.1 must stay in sync with the live registry.

Round-10 verdict item 8: the blueprint drifted from the code for part
of round 10 (453 vs 454). This test regenerates the inventory section
from the registry and requires the on-disk SURVEY.md to contain exactly
that text, and the stated counts to equal len(QUERIES)/len(ORACLES).
Fix a failure with `python tools/survey_inventory.py`.
"""

from __future__ import annotations

import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))


def test_survey_inventory_matches_registry():
    import survey_inventory

    from data_ingestion_tool_spark.queries import ORACLES, QUERIES

    want = survey_inventory.section()
    survey = open(os.path.join(REPO, "SURVEY.md")).read()
    assert want in survey, (
        "SURVEY.md §2.B.1 is stale — run `python tools/survey_inventory.py`"
    )

    m = re.search(r"Authoritative list \((\d+) queries, (\d+) with", survey)
    assert m, "inventory preamble missing from SURVEY.md"
    assert int(m.group(1)) == len(QUERIES)
    assert int(m.group(2)) == len(ORACLES)

    # every registered key appears in the table exactly once
    table = want.split("|---|---|---|", 1)[1]
    for name in QUERIES:
        assert table.count(f" {name}") >= 1, f"{name} missing from inventory"
