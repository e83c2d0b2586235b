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


def test_hash_split_stable_under_corpus_growth(spark, sf_dir):
    """p03's defining property: a document's train/val/test assignment is
    a pure function of its id — computing the split on any SUBSET of the
    corpus assigns every surviving document identically. (randomSplit
    fails this: its assignment shifts with partition layout.)"""
    from final_project_big_data_spark.io import load_table
    from final_project_big_data_spark.queries import all_specs
    from pyspark.sql import functions as F

    d = load_table(spark, sf_dir, "documents")
    u = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("split42:"), F.col("doc_id").cast("string"))),
                1, 8,
            ), 16, 10,
        ).cast("long") / F.lit(4294967296.0)
    )
    split = F.when(u < 0.8, "train").when(u < 0.9, "val").otherwise("test")
    full = {r.doc_id: r.s for r in d.select("doc_id", split.alias("s")).collect()}
    subset = {
        r.doc_id: r.s
        for r in d.filter(F.col("doc_id") % 3 == 0)
        .select("doc_id", split.alias("s"))
        .collect()
    }
    assert subset == {k: v for k, v in full.items() if k % 3 == 0}
    # the inline expression above IS the shipped assignment: its per-doc
    # decisions, rolled up by (split, lang), must equal the registered p03
    # builder's output exactly (a changed salt or threshold breaks this)
    from collections import Counter

    lang = {r.doc_id: r.lang for r in d.select("doc_id", "lang").collect()}
    mine = Counter((full[k], lang[k]) for k in full)
    builder = {
        (r.split, r.lang): r.n
        for r in all_specs()["p03_hash_split"].builder(spark, sf_dir).collect()
    }
    assert dict(mine) == builder
    # all three splits are populated and roughly 80/10/10
    c = Counter(full.values())
    n = sum(c.values())
    assert set(c) == {"train", "val", "test"}
    assert abs(c["train"] / n - 0.8) < 0.1


def test_sequence_packing_conservation(spark, sf_dir):
    """t11 invariants: offsets tile the concatenated corpus exactly —
    each doc's span starts where the previous ended, the final sequence
    index equals floor((total_tokens-1)/L), and every span is
    non-degenerate (end_seq >= start_seq)."""
    from final_project_big_data_spark.queries import all_specs
    from final_project_big_data_spark.queries.textops import _PACK_LEN

    rows = (
        all_specs()["t11_sequence_packing"]
        .builder(spark, sf_dir)
        .collect()
    )
    total = 0
    for r in rows:  # rows arrive ordered by doc_id
        assert r.start_seq == total // _PACK_LEN
        assert r.end_seq == (total + r.n_tokens - 1) // _PACK_LEN
        assert r.end_seq >= r.start_seq
        total += r.n_tokens
    assert rows[-1].end_seq == (total - 1) // _PACK_LEN
