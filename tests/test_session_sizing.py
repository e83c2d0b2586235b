"""Unit tests for the data-sized session knobs (no SparkSession needed).

Both helpers apply the same submitter rule at every scale: size the work
unit to the data, clamp to [floor, ceiling]. The scan-split helper exists
because the 128 MiB cluster default planned ONE scan task for an 18 MiB
local table (and two for the 10x probe's 184 MiB file) — serializing the
fused scan stage on a 32-core host; see session.py docstrings and
tools/scale_probe.py for the measurements.
"""

from __future__ import annotations

import os

from final_project_big_data_spark.session import (
    _largest_table_bytes,
    _local_cores,
    sized_max_partition_bytes,
    sized_shuffle_partitions,
)


def _mkparquet(d, name, nbytes):
    p = os.path.join(d, f"{name}.parquet")
    with open(p, "wb") as f:
        f.write(b"\0" * nbytes)


def test_largest_table_bytes_picks_dominant(tmp_path):
    _mkparquet(tmp_path, "small", 1000)
    _mkparquet(tmp_path, "big", 5000)
    (tmp_path / "ignored.csv").write_bytes(b"\0" * 99999)
    assert _largest_table_bytes(str(tmp_path)) == 5000


def test_largest_table_bytes_sums_directory_tables(tmp_path):
    d = tmp_path / "parts.parquet"
    d.mkdir()
    (d / "part-0").write_bytes(b"\0" * 3000)
    (d / "part-1").write_bytes(b"\0" * 4000)
    assert _largest_table_bytes(str(tmp_path)) == 7000


def test_largest_table_bytes_missing_dir_is_zero():
    assert _largest_table_bytes("/nonexistent/dir") == 0


def test_shuffle_partitions_scales_with_data(tmp_path):
    _mkparquet(tmp_path, "t", 20 * 1024 * 1024)
    got = sized_shuffle_partitions(str(tmp_path), advisory_bytes=1024 * 1024)
    assert got == 20
    # floor clamp
    assert sized_shuffle_partitions(str(tmp_path), advisory_bytes=1 << 40) == 8
    # ceiling is tasks-per-core waves, not a large constant: the round-4
    # 4096 cap planned 1841 one-MiB sort tasks at the 100x probe (q06
    # 21.9 s of mostly scheduling; see session.py docstring)
    assert (
        sized_shuffle_partitions(str(tmp_path), advisory_bytes=1)
        == _local_cores() * 4
    )
    assert (
        sized_shuffle_partitions(
            str(tmp_path), advisory_bytes=1, tasks_per_core=2
        )
        == _local_cores() * 2
    )


def test_max_partition_bytes_targets_data_per_core(tmp_path):
    _mkparquet(tmp_path, "t", 184 * 1024 * 1024)
    # 184 MiB / 32 cores ≈ 5.75 MiB per split — 32-way scan parallelism
    got = sized_max_partition_bytes(str(tmp_path), cores=32)
    assert got == (184 * 1024 * 1024) // 32
    # tiny data floors at 4 MiB (round 6: a scan task does ~3 ms/MiB of
    # decode vs ~1-2 ms launch cost, so 1 MiB splits spent more scheduler
    # than scanner — measured -13% on sort/agg headline shapes at sf0.1)
    _mkparquet(tmp_path, "t", 2 * 1024 * 1024)
    assert sized_max_partition_bytes(str(tmp_path), cores=32) == 4 * 1024 * 1024
    # huge data caps at the 128 MiB cluster default
    _mkparquet(tmp_path, "t", 184 * 1024 * 1024)
    assert (
        sized_max_partition_bytes(str(tmp_path), cores=1)
        == 128 * 1024 * 1024
    )


def test_max_partition_bytes_missing_dir_keeps_cluster_default():
    assert (
        sized_max_partition_bytes("/nonexistent/dir", cores=32)
        == 128 * 1024 * 1024
    )
