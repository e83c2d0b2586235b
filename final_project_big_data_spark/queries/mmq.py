"""Multimodal binary-column driver entries (SURVEY C23+).

mm01 differentially checks the distributed blob plumbing: the synthetic
media table is generated *inside Spark* (mapInPandas over a range), headers
are parsed back by an Arrow-batched UDF, and DuckDB recomputes the expected
metadata arithmetically from the generator's definition — a real
cross-engine check of the binary path without needing media libs.

mm02/mm03 (features, frame sampling) run byte-level Python compute with no
SQL analogue → registered without oracles (driver records rows-only
checks, per the contract's weaker-check clause).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from final_project_big_data_spark.multimodal.binaryops import (
    extract_features,
    extract_metadata,
    sample_frames,
    synth_media,
)
from final_project_big_data_spark.queries import query

N_MEDIA = 48  # fixed-size synthetic table; independent of sf (blob plumbing
# scales with partition count, not fixture rows)


@query(
    "mm01_media_metadata",
    oracle=f"""
    SELECT CAST(range AS BIGINT) AS media_id,
           'fake' AS fmt,
           CAST(8 + range % 5 AS INT) AS width,
           CAST(6 + range % 4 AS INT) AS height,
           CAST(1 + range % 3 AS INT) AS channels,
           CAST(9 + (8 + range % 5) * (6 + range % 4) * (1 + range % 3)
                AS BIGINT) AS n_bytes
    FROM range({N_MEDIA}) ORDER BY media_id
    """,
    category="multimodal",
)
def mm01(spark: SparkSession, sf: str) -> DataFrame:
    """Binary header extraction over distributed blobs == arithmetic oracle."""
    media = synth_media(spark, n=N_MEDIA)
    return extract_metadata(media).orderBy("media_id")


@query("mm02_media_features", oracle=None, category="multimodal")
def mm02(spark: SparkSession, sf: str) -> DataFrame:
    """Decode-stub feature extraction (mean intensity, byte entropy) —
    deterministic but byte-level Python; rows-only driver check."""
    media = synth_media(spark, n=N_MEDIA)
    return extract_features(media).orderBy("media_id")


@query("mm03_frame_sampling", oracle=None, category="multimodal")
def mm03(spark: SparkSession, sf: str) -> DataFrame:
    """Video-style frame sampling fan-out; rows-only driver check
    (frame bytes dropped — binary cells don't canonicalize portably)."""
    media = synth_media(spark, n=N_MEDIA)
    return (
        sample_frames(media, frame_bytes=16, every=2)
        .select("media_id", "frame_no", "frame_len")
        .orderBy("media_id", "frame_no")
    )
