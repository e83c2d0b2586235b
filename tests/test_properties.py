"""Property-based tests (hypothesis): randomized inputs vs constructive
Python oracles for the composed operators whose edge cases (empty sides,
duplicate timestamps, keys present on only one side) a fixture can miss.
"""

from __future__ import annotations

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

pair = st.tuples(
    st.integers(min_value=0, max_value=3),  # key: few keys → collisions
    st.integers(min_value=0, max_value=100),  # ts
)


@settings(max_examples=15, deadline=None)
@given(
    left=st.lists(pair, min_size=0, max_size=12),
    right=st.lists(pair, min_size=0, max_size=12),
)
def test_asof_join_matches_python_oracle(spark, left, right):
    """For every left row: asof_ts == max right ts ≤ left ts on the key
    (None when no such row), including equal-timestamp and missing-key
    cases."""
    from final_project_big_data_spark.operators.asof import asof_join

    ldf = spark.createDataFrame(
        [(i, k, t) for i, (k, t) in enumerate(left)] or [(0, -1, -1)],
        "row_id int, user_id int, ts int",
    )
    rdf = spark.createDataFrame(
        right or [(-1, -1)], "user_id int, ts int"
    )
    got = {
        r.row_id: r.asof_ts
        for r in asof_join(ldf, rdf, on="user_id").collect()
    }
    rows = left or [(-1, -1)]
    rights = right or [(-1, -1)]
    for i, (k, t) in enumerate(rows):
        cands = [rt for rk, rt in rights if rk == k and rt <= t]
        assert got[i] == (max(cands) if cands else None), (i, k, t)


@settings(max_examples=10, deadline=None)
@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=5),
            st.integers(min_value=-1000, max_value=1000),
        ),
        min_size=1,
        max_size=30,
    ),
    n_salts=st.integers(min_value=1, max_value=5),
)
def test_salted_join_matches_plain_join(spark, rows, n_salts):
    """salted_join multiset-equals the plain join for arbitrary key skew
    (including every-row-same-key) and any salt count."""
    from final_project_big_data_spark.plans.skew import salted_join

    fact = spark.createDataFrame(rows, "k int, v int")
    dim = spark.createDataFrame(
        [(k, k * 10) for k in range(6)], "k int, d int"
    )
    plain = sorted(
        tuple(r) for r in fact.join(dim, "k").select("k", "v", "d").collect()
    )
    salted = sorted(
        tuple(r)
        for r in salted_join(fact, dim, "k", n_salts=n_salts)
        .select("k", "v", "d")
        .collect()
    )
    assert salted == plain
