"""Documentation-sync contracts: SURVEY.md is the single map a fresh
context rebuilds the engine from, so every registered query must
appear in it by name (r8 verdict item 7 — 101 granular faces had
drifted out of the survey). Pure-Python check, no Spark session."""

import os
import re

from aws_lakehouse_spark.registry import load_all

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_survey_lists_every_registry_query():
    survey = open(os.path.join(REPO, "SURVEY.md")).read()
    # word-boundary match: plain substring membership would let a name
    # that is a prefix of another listed name (dedup_simhash inside
    # dedup_simhash_pairs) pass without its own row (r9 advice)
    missing = [
        n
        for n in load_all()
        if not re.search(rf"\b{re.escape(n)}\b", survey)
    ]
    assert not missing, (
        f"{len(missing)} registry queries missing from SURVEY.md "
        f"(add a §2.15 face-index row each): {missing}"
    )
