"""Commit gate: the full-catalog self-check artifact must be current.

Rounds 4 and 5 both left queries registered AFTER the committed
``CORRECTNESS_SELF_r*.json`` was generated — and round 4's only red row
(`quantile_normalized_values`) landed through exactly that gap. This
test makes the hole impossible to reopen: it fails whenever any name in
the catalog registry is absent from the NEWEST self-check artifact, or
whenever an artifact row is red. Adding a query therefore mechanically
requires regenerating (or ``--merge``-appending to) the artifact first:

    python tools/check_oracle.py --json CORRECTNESS_SELF_r6.json --merge NEW_QUERY
"""

from __future__ import annotations

import json
import re
from pathlib import Path

import pytest

from stock_streaming_data_pipeline_spark.plans import catalog as cat

REPO = Path(__file__).resolve().parent.parent


def newest_artifact() -> Path:
    arts = sorted(
        REPO.glob("CORRECTNESS_SELF_r*.json"),
        key=lambda p: int(re.search(r"r(\d+)", p.name).group(1)),
    )
    assert arts, "no CORRECTNESS_SELF_r*.json artifact committed"
    return arts[-1]


@pytest.fixture(scope="module")
def artifact() -> dict:
    with open(newest_artifact()) as fh:
        return json.load(fh)


def test_every_registered_query_has_a_self_check_row(artifact):
    registered = set(cat.catalog())
    missing = sorted(registered - set(artifact))
    assert not missing, (
        f"{len(missing)} registered queries are absent from "
        f"{newest_artifact().name} — run tools/check_oracle.py --json "
        f"{newest_artifact().name} --merge {' '.join(missing)}"
    )


def test_artifact_has_no_rows_for_unregistered_queries(artifact):
    registered = set(cat.catalog())
    stale = sorted(set(artifact) - registered)
    assert not stale, f"artifact rows for unregistered queries: {stale}"


def test_no_red_rows_in_artifact(artifact):
    red = []
    for name, rec in artifact.items():
        if rec.get("err") == "no_oracle":
            # documented rows-only query: spark side must still have run
            if rec.get("spark_rows") is None:
                red.append((name, "rows-only query produced no rows record"))
            continue
        if rec.get("err"):
            red.append((name, rec["err"]))
        elif not (rec.get("rows_match") and rec.get("schema_match") and rec.get("hash_match")):
            red.append((name, "mismatch"))
    assert not red, f"red rows in {newest_artifact().name}: {red}"
