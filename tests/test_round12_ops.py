"""Round-12 operator/infrastructure pins: q14 automatic shape choice and
the shuffle-medium sniff behind it (VERDICT r11 #1)."""

from __future__ import annotations

from final_project_big_data_spark.plans.shuffle_medium import (
    per_byte_cost_high,
    shuffle_medium,
)
from final_project_big_data_spark.queries.relational import _q14_preagg


def test_shuffle_medium_ram_on_engine_session(spark):
    """The engine's local session puts spark.local.dir on /dev/shm —
    medium must read as ram."""
    assert shuffle_medium(spark) == "ram"


def test_shuffle_medium_disk_via_env(spark, monkeypatch):
    """SPARK_LOCAL_DIRS overrides the conf (Spark's own precedence) —
    pointing it at a real-disk path flips the medium."""
    monkeypatch.setenv("SPARK_LOCAL_DIRS", "/root")
    assert shuffle_medium(spark) == "disk"
    assert per_byte_cost_high(spark)


def test_shuffle_medium_local_cluster_is_network():
    """``local-cluster[n,c,m]`` executors are separate JVMs — shuffle
    crosses the netty transport, so the sniff must read network (round
    13, VERDICT r12 #4: the old ``startswith("local")`` test lumped the
    only validatable multi-JVM master in with ``local[*]``, so the
    network-gated q14 branches could never fire on their own sniff).
    String-level stub: a second master cannot share the suite's
    SparkContext (see tests/test_local_cluster.py)."""
    from types import SimpleNamespace

    fake = SimpleNamespace(
        sparkContext=SimpleNamespace(master="local-cluster[2,8,2048]")
    )
    assert shuffle_medium(fake) == "network"
    assert per_byte_cost_high(fake)


def test_per_byte_cost_tracks_codec(spark, monkeypatch):
    """On RAM-shuffle, cost is high iff the codec is on (compression CPU
    is proportional to bytes on both ends; spark.shuffle.compress is a
    static conf, so the explicit override is the testable path)."""
    monkeypatch.delenv("SPARK_LOCAL_DIRS", raising=False)
    assert not per_byte_cost_high(spark, compress=False)
    assert per_byte_cost_high(spark, compress=True)
    # engine local session pins the codec OFF → conf-read path agrees
    assert per_byte_cost_high(spark) == (
        str(spark.conf.get("spark.shuffle.compress", "true")).lower() == "true"
    )


def test_q14_shape_choice(spark, sf_dir, monkeypatch):
    """Env knob forces either shape; the automatic pre-agg rule narrowed
    in the round-12 OPTIMIZATION pass (OPTIMIZATION_r12.md §q14): the
    reordered join-first shape measured faster on EVERY local medium
    (tmpfs and disk+codec, 100× and 1000×), so pre-agg now needs a
    NETWORK master (where its byte cut must pay by §1.3 arithmetic) plus
    a big fact — and yields to the stronger semi reduction when the
    keyset bracket fits."""
    monkeypatch.setenv("SPARK_GRAFT_Q14_PREAGG", "1")
    assert _q14_preagg(spark, sf_dir)
    monkeypatch.setenv("SPARK_GRAFT_Q14_PREAGG", "0")
    assert not _q14_preagg(spark, sf_dir)
    monkeypatch.delenv("SPARK_GRAFT_Q14_PREAGG")
    # local master: never pre-agg, whatever the local medium/codec —
    # measured, not argued (disk+codec 1000×: reorder 15.16 s vs the two
    # r12-matrix shapes 23.65 / 29.8 s)
    monkeypatch.setenv("SPARK_LOCAL_DIRS", "/root")
    assert not _q14_preagg(spark, sf_dir)
    assert not _q14_preagg(spark, "hdfs://nowhere/sf100")
    monkeypatch.delenv("SPARK_LOCAL_DIRS")
    # network master (mocked medium): big unstat-able fact → pre-agg,
    # unless the semi bracket takes precedence (stat-able orders inside
    # the broadcastable bracket)
    import final_project_big_data_spark.queries.relational as R

    monkeypatch.setattr(
        "final_project_big_data_spark.plans.shuffle_medium.shuffle_medium",
        lambda s: "network",
    )
    assert R._q14_preagg(spark, "hdfs://nowhere/sf100")
    assert R._q14_semi(spark, sf_dir) is False  # orders below bracket floor
    monkeypatch.setattr(
        R, "_q14_semi", lambda s, sf: True
    )
    assert not R._q14_preagg(spark, "hdfs://nowhere/sf100")


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "simple"
    )


def test_q14_semi_bracket(spark, sf_dir, monkeypatch):
    """Round-12 optimization: the semi prefilter needs a NETWORK master
    (local media measured it a loss) AND orders' on-disk bytes inside
    the broadcastable-keyset bracket — unstat-able cluster paths must
    NOT gamble executor memory; the env knob forces both ways."""
    from final_project_big_data_spark.queries.relational import _q14_semi

    monkeypatch.setenv("SPARK_GRAFT_Q14_SEMI", "1")
    assert _q14_semi(spark, sf_dir)
    monkeypatch.setenv("SPARK_GRAFT_Q14_SEMI", "0")
    assert not _q14_semi(spark, sf_dir)
    monkeypatch.delenv("SPARK_GRAFT_Q14_SEMI")
    assert not _q14_semi(spark, sf_dir)  # local master: reorder measured faster
    monkeypatch.setattr(
        "final_project_big_data_spark.plans.shuffle_medium.shuffle_medium",
        lambda s: "network",
    )
    assert not _q14_semi(spark, sf_dir)  # 2.6 MB orders: below bracket floor
    assert not _q14_semi(spark, "hdfs://nowhere/sf100")  # unknown: no gamble


def test_q14_flat_gate(sf_dir, monkeypatch):
    """Flat shape fires exactly in the everything-broadcasts regime:
    fixture orders (KBs) → flat; unstat-able cluster path → reorder
    (assume big); env knob forces both ways."""
    from final_project_big_data_spark.queries.relational import _q14_flat

    assert _q14_flat(sf_dir)
    assert not _q14_flat("hdfs://nowhere/sf100")
    monkeypatch.setenv("SPARK_GRAFT_Q14_FLAT", "0")
    assert not _q14_flat(sf_dir)
    monkeypatch.setenv("SPARK_GRAFT_Q14_FLAT", "1")
    assert _q14_flat("hdfs://nowhere/sf100")


def test_q14_reorder_and_semi_plan(spark, sf_dir, monkeypatch):
    """Above the flat cap the dim⋈dim join (customer onto orders, on
    o_custkey) sits BELOW the fact join (on l_orderkey) — the round-12
    reorder; at fixture volume the flat shape applies (both dims
    broadcast concurrently, no nested build) and the customer join sits
    ABOVE; the LeftSemi prefilter appears exactly when the bracket/knob
    says."""
    from final_project_big_data_spark.queries import all_specs

    build = all_specs()["q14_multiway_join"].builder

    # fixture volume: orders ≪ _Q14_FLAT_MAX_BYTES → flat (li⋈o)⋈c
    plan = _plan(build(spark, sf_dir))
    assert "LeftSemi" not in plan  # below the bracket: no redundant pass
    lines = plan.splitlines()
    [i_fact] = [
        i for i, l in enumerate(lines) if "Join [l_orderkey" in l
    ]
    [i_dim] = [i for i, l in enumerate(lines) if "Join [o_custkey" in l]
    assert i_dim < i_fact, "flat shape: customer join above the fact join"

    # past the cap (forced): the reorder — customer nested under the fact
    monkeypatch.setenv("SPARK_GRAFT_Q14_FLAT", "0")
    lines = _plan(build(spark, sf_dir)).splitlines()
    [i_fact] = [
        i for i, l in enumerate(lines) if "Join [l_orderkey" in l
    ]
    [i_dim] = [i for i, l in enumerate(lines) if "Join [o_custkey" in l]
    assert i_dim > i_fact, "customer join must be nested under the fact join"
    monkeypatch.delenv("SPARK_GRAFT_Q14_FLAT")

    monkeypatch.setenv("SPARK_GRAFT_Q14_SEMI", "1")
    assert "LeftSemi" in _plan(build(spark, sf_dir))
    monkeypatch.delenv("SPARK_GRAFT_Q14_SEMI")

    # pre-agg branch keeps the reordered dim side too
    monkeypatch.setenv("SPARK_GRAFT_Q14_PREAGG", "1")
    pre = _plan(build(spark, sf_dir))
    assert "Join [o_custkey" in pre or "Join [c_custkey" in pre
    monkeypatch.delenv("SPARK_GRAFT_Q14_PREAGG")


def test_iterative_graph_plans_grow_linearly_with_rounds(spark):
    """Round-12 linearization pin: the step-relation recurrence references
    the previous round's frame exactly ONCE, so the unrolled logical plan
    must grow LINEARLY in the iteration count. The pre-r12 x09 merge
    (dist ⟕ relax(dist)) embedded the previous round twice — 2^k growth —
    which this guard would catch as a plan-string explosion (6 rounds
    would be ≥8× the 3-round size; linear growth stays ≤~2.5×)."""
    from final_project_big_data_spark.operators.pagerank import pagerank

    edges = spark.createDataFrame(
        [(i, (i + 1) % 7) for i in range(7)], "src long, dst long"
    )

    def plan_size(n_iter: int) -> int:
        return len(
            pagerank(edges, n_iter=n_iter)._jdf.queryExecution()
            .logical()
            .toString()
        )

    s3, s6 = plan_size(3), plan_size(6)
    assert s6 < 2.5 * s3, (s3, s6)


def test_q14_fact_exchange_is_narrow(spark, sf_dir, monkeypatch):
    """Round-13 pin (guide §2.3): the fact side crossing q14's exchange
    carries exactly (l_orderkey, _rev) — the revenue product is folded
    into ONE double BEFORE the shuffle (measured −22% fact-exchange
    bytes at 1000×). Forced past the flat cap so the exchange exists;
    the raw price/discount columns must not appear above the scan's
    project."""
    from final_project_big_data_spark.queries import all_specs

    monkeypatch.setenv("SPARK_GRAFT_Q14_FLAT", "0")
    plan = _plan(
        all_specs()["q14_multiway_join"].builder(spark, sf_dir)
    )
    monkeypatch.delenv("SPARK_GRAFT_Q14_FLAT")
    assert "_rev" in plan
    # the product is computed in the scan-side project; nothing above it
    # (exchange, sort, join, agg) references the two raw columns
    [proj_line] = [
        l
        for l in plan.splitlines()
        if "_rev" in l and "l_extendedprice" in l and "Project" in l
    ]
    above = plan.split(proj_line)[0]
    assert "l_extendedprice" not in above and "l_discount" not in above


def test_x09_bfs_plan_grows_linearly_with_rounds(spark, sf_dir, monkeypatch):
    """Same linear-growth pin over x09's INLINE step-relation loop
    (ADVICE r12: the pagerank guard above covers x05's operator, but the
    documented 2^k offender — x09's dist⟕relax(dist) merge in
    queries/connectors.py — is inline code the operator guard cannot see;
    reintroducing the quadratic merge there would otherwise pass CI).
    ``_BFS_ITER`` is a module global the builder reads at call time, so
    patching it exercises the real registry builder."""
    from final_project_big_data_spark.queries import all_specs, connectors

    build = all_specs()["x09_bfs_distance"].builder

    def plan_size(n_iter: int) -> int:
        monkeypatch.setattr(connectors, "_BFS_ITER", n_iter)
        return len(
            build(spark, sf_dir)._jdf.queryExecution().logical().toString()
        )

    s3, s6 = plan_size(3), plan_size(6)
    assert s6 < 2.5 * s3, (s3, s6)
