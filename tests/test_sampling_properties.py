"""Model-based property tests: the corpus-derived samplers vs pure-Python models.

``temperature_sample``'s whole cross-engine contract is that its derived
thresholds ``floor(N_BUCKETS * sqrt(n_min/n_l))`` and md5-bucket membership
are exactly reproducible anywhere IEEE doubles and md5 exist — so the model
here is a third implementation (CPython floats + hashlib), not DuckDB, and
the comparison is exact equality of the survivor SET, not a rate tolerance.
``cap_per_stratum``'s split under/over plan must be indistinguishable from
the naive single-window form; the model is that naive window in Python.
"""

from __future__ import annotations

import hashlib
import math

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from fund_data_pipeline_spark.operators.sampling import (
    N_BUCKETS,
    cap_per_stratum,
    temperature_sample,
)

STRATA = [None, "a", "b", "c"]


@pytest.fixture(scope="module")
def _spark(spark):
    return spark


def _bucket(key: int, salt: str) -> int:
    keyed = f"{salt}|{key}" if salt else str(key)
    return int(hashlib.md5(keyed.encode()).hexdigest()[:8], 16) % N_BUCKETS


@given(counts=st.lists(st.integers(min_value=1, max_value=25), min_size=1, max_size=4))
@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
def test_temperature_sample_matches_python_model_exactly(_spark, counts):
    spark = _spark
    rows, next_id = [], 0
    for stratum, n in zip(STRATA, counts):
        for _ in range(n):
            rows.append((next_id, stratum))
            next_id += 1
    df = spark.createDataFrame(rows, "doc_id long, lang string")

    got = {
        (r.doc_id, r.lang, r.thr)
        for r in temperature_sample(df, "doc_id", "lang", alpha=0.5, salt="t", thr_col="thr").collect()
    }

    n_min = min(counts)
    thr = {
        stratum: math.floor(N_BUCKETS * math.sqrt(n_min / n))
        for stratum, n in zip(STRATA, counts)
    }
    expect = {
        (i, s, thr[s]) for i, s in rows if _bucket(i, "t") < thr[s]
    }
    assert got == expect


ROW = st.tuples(
    st.sampled_from(STRATA),
    st.one_of(st.none(), st.integers(min_value=-3, max_value=3)),
)


@given(
    rows=st.lists(ROW, min_size=0, max_size=20),
    cap=st.integers(min_value=1, max_value=4),
)
@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
def test_cap_per_stratum_matches_naive_window_model(_spark, rows, cap):
    spark = _spark
    data = [(s, i, v) for i, (s, v) in enumerate(rows)]
    df = spark.createDataFrame(data, "src string, doc_id long, score long")

    from pyspark.sql import functions as F

    out = cap_per_stratum(
        df, ["src"], cap=cap, order_by=[F.col("score").desc_nulls_last()], tie_key="doc_id"
    )
    got = {(r.src, r.doc_id) for r in out.collect()}

    # naive window model: per stratum, order by score DESC NULLS LAST then id
    by_stratum: dict[object, list[tuple]] = {}
    for s, i, v in data:
        by_stratum.setdefault(s, []).append((v is None, -(v or 0), i))
    expect = set()
    for s, members in by_stratum.items():
        for _, _, i in sorted(members)[:cap]:
            expect.add((s, i))
    assert got == expect
