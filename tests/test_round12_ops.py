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
    """Env knob forces either shape; the automatic rule needs BOTH
    costly bytes and a big fact — the tiny fixture never flips to
    pre-agg, a fake cluster path (unstat-able → big) with costly bytes
    does."""
    monkeypatch.setenv("SPARK_GRAFT_Q14_PREAGG", "1")
    assert _q14_preagg(spark, sf_dir)
    monkeypatch.setenv("SPARK_GRAFT_Q14_PREAGG", "0")
    assert not _q14_preagg(spark, sf_dir)
    monkeypatch.delenv("SPARK_GRAFT_Q14_PREAGG")
    # tiny fixture: small fact → join-first whatever the medium
    monkeypatch.setenv("SPARK_LOCAL_DIRS", "/root")
    assert not _q14_preagg(spark, sf_dir)
    # big fact (unstat-able cluster path) + costly bytes → pre-agg
    assert _q14_preagg(spark, "hdfs://nowhere/sf100")
    # big fact but free bytes (tmpfs, codec off — the engine's local
    # session pins spark.shuffle.compress=false) → join-first
    monkeypatch.delenv("SPARK_LOCAL_DIRS")
    assert str(spark.conf.get("spark.shuffle.compress")).lower() == "false"
    assert not _q14_preagg(spark, "hdfs://nowhere/sf100")
