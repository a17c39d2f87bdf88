"""Model-based property test: merge_as_dataframe vs a dict-model reference.

Hypothesis drives random target/source batches through the pure-DataFrame
MERGE and checks the result row-for-row against the obvious Python model of
the reference's upsert semantics (db_connector.py:380-419): insert new keys,
replace matched keys whose hash differs, keep matched keys whose hash is
equal, keep unmatched target rows.
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from fund_data_pipeline_spark.merge import merge_as_dataframe

KEYS = st.integers(min_value=0, max_value=5)
VALS = st.one_of(st.none(), st.integers(min_value=-3, max_value=3))

row = st.tuples(KEYS, VALS, VALS)  # (k, v, hash-ish)


def _unique_by_key(rows):
    out = {}
    for k, v, h in rows:
        out[k] = (k, v, None if h is None else str(h))
    return list(out.values())


@pytest.fixture(scope="module")
def _spark(spark):
    return spark


@given(
    target=st.lists(row, max_size=8).map(_unique_by_key),
    source=st.lists(row, max_size=8).map(_unique_by_key),
)
@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
def test_merge_matches_dict_model(_spark, target, source):
    spark = _spark
    schema = "k int, v int, row_hash string"
    t = spark.createDataFrame(target, schema)
    s = spark.createDataFrame(source, schema)

    got = {r.k: (r.v, r.row_hash) for r in merge_as_dataframe(t, s, ["k"]).collect()}

    model = {k: (v, h) for k, v, h in target}
    for k, v, h in source:
        if k not in model:
            model[k] = (v, h)  # insert
        elif model[k][1] != h:  # null-safe IS DISTINCT FROM on the hash
            model[k] = (v, h)  # update
        # else: hash equal -> target row kept untouched

    assert got == model
