"""Registry smoke: every declared query runs at sf0.001 and returns a
schema-stable DataFrame. Oracle parity itself is the driver's gate
(emulated in tools/check_correctness.py)."""

from __future__ import annotations

import pytest

from meshtastic_airsensor_database_spark.plans import REGISTRY

# exact O(n^2) pair queries are slow under local[4] test sessions;
# they are covered by tools/check_correctness.py instead.
SLOW = {"jaccard_neardup_pairs", "embedding_neardup_pairs"}


@pytest.mark.parametrize("name", [n for n in REGISTRY if n not in SLOW])
def test_query_runs(spark, sf_dir, name):
    q = REGISTRY[name]
    df = q.builder(spark, sf_dir)
    n = df.count()
    assert n >= 0
    assert df.columns  # non-empty schema
    if q.oracle is not None:
        assert q.oracle.strip().upper().startswith(("SELECT", "WITH"))


def test_registry_metadata():
    for q in REGISTRY.values():
        assert q.survey_ids, f"{q.name} missing SURVEY §2 mapping"
        assert q.description
