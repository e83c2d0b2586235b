"""Multimodal binary-column driver entries (SURVEY C23+).

mm01 differentially checks the distributed blob plumbing: the synthetic
media table is generated *inside Spark* (mapInPandas over a range), headers
are parsed back by an Arrow-batched UDF, and DuckDB recomputes the expected
metadata arithmetically from the generator's definition — a real
cross-engine check of the binary path without needing media libs.

mm02/mm03 are oracle-checked the same way: the payload is an md5 chain in
the hex-string domain (``binaryops._payload``), so DuckDB regrows the
identical bytes with a recursive CTE and recomputes mean intensity / byte
entropy / frame fan-out arithmetically — the whole multimodal surface gets
value-hash verification, no rows-only fallback.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from final_project_big_data_spark.multimodal.binaryops import (
    extract_audio_features,
    extract_audio_metadata,
    extract_features,
    extract_metadata,
    jpeg_roundtrip_facets,
    sample_frames,
    synth_audio,
    synth_jpeg_media,
    synth_media,
    synth_png_media,
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


# DuckDB regrows the md5-chain payload: block0 = md5(id), block_{i+1} =
# md5(hex(block_i)) — the generator chains in the hex domain precisely so a
# VARCHAR-only md5 can follow it. Bytes come from hex pairs via strpos.
_PAYLOAD_BYTES_SQL = f"""
    WITH RECURSIVE m AS (
      SELECT range AS media_id,
             (8 + range % 5) * (6 + range % 4) * (1 + range % 3) AS n
      FROM range({N_MEDIA})
    ),
    blocks AS (
      SELECT media_id, 0 AS i, md5(CAST(media_id AS VARCHAR)) AS h, n FROM m
      UNION ALL
      SELECT media_id, i + 1, md5(h), n FROM blocks WHERE (i + 1) * 16 < n
    ),
    bytes AS (
      SELECT media_id, i * 16 + j AS pos,
             (strpos('0123456789abcdef', substr(h, 2 * j + 1, 1)) - 1) * 16
             + strpos('0123456789abcdef', substr(h, 2 * j + 2, 1)) - 1 AS v,
             n
      FROM blocks, UNNEST(range(16)) AS u(j)
      WHERE i * 16 + j < n
    )
"""


@query(
    "mm02_media_features",
    oracle=_PAYLOAD_BYTES_SQL
    + """
    , counts AS (
      SELECT media_id, v, count(*) AS c, any_value(n) AS n
      FROM bytes GROUP BY media_id, v
    )
    SELECT CAST(media_id AS BIGINT) AS media_id,
           ROUND(SUM(v * c) / CAST(n AS DOUBLE), 4) AS mean_intensity,
           ROUND(-SUM((c / CAST(n AS DOUBLE))
                      * log2(c / CAST(n AS DOUBLE))), 4) AS byte_entropy
    FROM counts GROUP BY media_id, n ORDER BY media_id
    """,
    category="multimodal",
)
def mm02(spark: SparkSession, sf: str) -> DataFrame:
    """Decode-stub feature extraction (mean intensity, byte entropy) over
    distributed blobs == DuckDB's arithmetic regrowth of the same payload."""
    media = synth_media(spark, n=N_MEDIA)
    return (
        extract_features(media)
        .select(
            "media_id",
            F.round("mean_intensity", 4).alias("mean_intensity"),
            F.round("byte_entropy", 4).alias("byte_entropy"),
        )
        .orderBy("media_id")
    )


@query(
    "mm03_frame_sampling",
    oracle=f"""
    WITH m AS (
      SELECT range AS media_id,
             (8 + range % 5) * (6 + range % 4) * (1 + range % 3) AS psize
      FROM range({N_MEDIA})
    )
    SELECT CAST(media_id AS BIGINT) AS media_id,
           CAST(k AS INT) AS frame_no,
           CAST(16 AS INT) AS frame_len
    FROM m, UNNEST(range(0, psize // 16, 2)) AS t(k)
    ORDER BY media_id, frame_no
    """,
    category="multimodal",
)
def mm03(spark: SparkSession, sf: str) -> DataFrame:
    """Video-style frame sampling fan-out == closed-form frame arithmetic
    (frame bytes dropped from the checked projection — binary cells don't
    canonicalize portably; the bytes themselves are pinned by
    tests/test_multimodal.py's slice check)."""
    media = synth_media(spark, n=N_MEDIA)
    return (
        sample_frames(media, frame_bytes=16, every=2)
        .select("media_id", "frame_no", "frame_len")
        .orderBy("media_id", "frame_no")
    )


# --------------------------------------------- round 7: live WAV + PNG codecs
#
# mm04/mm05 run REAL RIFF/WAVE files (stdlib `wave` writes/reads them;
# samples are the mm02 md5 chain read as little-endian int16), mm06 runs
# REAL PNG files (vendored zlib codec, filter_type = id % 5 so the corpus
# exercises every scanline filter). All three are value-oracle-checked:
# DuckDB regrows the byte chain and recomputes the decoded numbers.


@query(
    "mm04_audio_metadata",
    oracle=f"""
    SELECT CAST(range AS BIGINT) AS media_id,
           'wav' AS fmt,
           CAST(8000 + 4000 * (range % 3) AS INT) AS sample_rate,
           CAST(1 + range % 2 AS INT) AS channels,
           CAST(2 AS INT) AS sample_width,
           CAST(40 + (range % 7) * 8 AS INT) AS n_frames,
           CAST(44 + 2 * (40 + (range % 7) * 8) * (1 + range % 2)
                AS BIGINT) AS n_bytes
    FROM range({N_MEDIA}) ORDER BY media_id
    """,
    category="multimodal",
)
def mm04(spark: SparkSession, sf: str) -> DataFrame:
    """REAL WAV decode (stdlib wave) over distributed blobs == arithmetic
    oracle: rate/channels/frames are id-derived, the 44-byte canonical
    PCM header is pinned by construction (and by test_multimodal)."""
    media = synth_audio(spark, n=N_MEDIA)
    return extract_audio_metadata(media).orderBy("media_id")


# Audio payload regrowth: n = 2 * n_frames * channels bytes per id, then
# little-endian int16 assembly — sample_j = b[2j] + 256*b[2j+1], wrapped
# to signed. Same hex-domain chain as mm02's _PAYLOAD_BYTES_SQL, different
# size arithmetic, so it is restated here with the audio n.
_AUDIO_BYTES_SQL = f"""
    WITH RECURSIVE m AS (
      SELECT range AS media_id,
             2 * (40 + (range % 7) * 8) * (1 + range % 2) AS n
      FROM range({N_MEDIA})
    ),
    blocks AS (
      SELECT media_id, 0 AS i, md5(CAST(media_id AS VARCHAR)) AS h, n FROM m
      UNION ALL
      SELECT media_id, i + 1, md5(h), n FROM blocks WHERE (i + 1) * 16 < n
    ),
    bytes AS (
      SELECT media_id, i * 16 + j AS pos,
             (strpos('0123456789abcdef', substr(h, 2 * j + 1, 1)) - 1) * 16
             + strpos('0123456789abcdef', substr(h, 2 * j + 2, 1)) - 1 AS v,
             n
      FROM blocks, UNNEST(range(16)) AS u(j)
      WHERE i * 16 + j < n
    ),
    samples AS (
      SELECT lo.media_id,
             lo.v + 256 * hi.v
             - CASE WHEN hi.v >= 128 THEN 65536 ELSE 0 END AS s
      FROM bytes lo JOIN bytes hi
        ON lo.media_id = hi.media_id AND hi.pos = lo.pos + 1
      WHERE lo.pos % 2 = 0
    )
"""


@query(
    "mm05_audio_features",
    oracle=_AUDIO_BYTES_SQL
    + """
    SELECT CAST(media_id AS BIGINT) AS media_id,
           ROUND(AVG(CAST(s AS DOUBLE)), 4) AS mean_amplitude,
           CAST(MAX(ABS(s)) AS INT) AS peak
    FROM samples GROUP BY media_id ORDER BY media_id
    """,
    category="multimodal",
)
def mm05(spark: SparkSession, sf: str) -> DataFrame:
    """REAL WAV decode → per-blob mean amplitude / peak == DuckDB's
    int16 reassembly of the regrown byte chain."""
    media = synth_audio(spark, n=N_MEDIA)
    return (
        extract_audio_features(media)
        .select(
            "media_id",
            F.round("mean_amplitude", 4).alias("mean_amplitude"),
            "peak",
        )
        .orderBy("media_id")
    )


@query(
    "mm06_png_roundtrip_features",
    oracle=f"""
    WITH RECURSIVE m AS (
      SELECT range AS media_id,
             (8 + range % 5) * (6 + range % 4) AS n
      FROM range({N_MEDIA})
    ),
    blocks AS (
      SELECT media_id, 0 AS i, md5(CAST(media_id AS VARCHAR)) AS h, n FROM m
      UNION ALL
      SELECT media_id, i + 1, md5(h), n FROM blocks WHERE (i + 1) * 16 < n
    ),
    bytes AS (
      SELECT media_id, i * 16 + j AS pos,
             (strpos('0123456789abcdef', substr(h, 2 * j + 1, 1)) - 1) * 16
             + strpos('0123456789abcdef', substr(h, 2 * j + 2, 1)) - 1 AS v,
             n
      FROM blocks, UNNEST(range(16)) AS u(j)
      WHERE i * 16 + j < n
    ),
    counts AS (
      SELECT media_id, v, count(*) AS c, any_value(n) AS n
      FROM bytes GROUP BY media_id, v
    )
    SELECT CAST(media_id AS BIGINT) AS media_id,
           ROUND(SUM(v * c) / CAST(n AS DOUBLE), 4) AS mean_intensity,
           ROUND(-SUM((c / CAST(n AS DOUBLE))
                      * log2(c / CAST(n AS DOUBLE))), 4) AS byte_entropy
    FROM counts GROUP BY media_id, n ORDER BY media_id
    """,
    category="multimodal",
)
def mm06(spark: SparkSession, sf: str) -> DataFrame:
    """REAL PNG encode→decode in the middle of the mm02 arithmetic: the
    greyscale pixels ARE the payload bytes, so the oracle's mean/entropy
    only match if the vendored zlib codec round-trips every scanline
    filter (filter_type = media_id % 5) bit-exactly."""
    media = synth_png_media(spark, n=N_MEDIA)
    return (
        extract_features(media)
        .select(
            "media_id",
            F.round("mean_intensity", 4).alias("mean_intensity"),
            F.round("byte_entropy", 4).alias("byte_entropy"),
        )
        .orderBy("media_id")
    )


@query(
    "mm07_jpeg_roundtrip_facets",
    oracle=f"""
    SELECT CAST(range AS BIGINT) AS media_id,
           CAST(8 + range % 5 AS INT) AS width,
           CAST(6 + range % 4 AS INT) AS height,
           TRUE AS n_px_ok,
           TRUE AS err_bounded
    FROM range({N_MEDIA}) ORDER BY media_id
    """,
    category="multimodal",
)
def mm07(spark: SparkSession, sf: str) -> DataFrame:
    """REAL JPEG encode→decode over distributed blobs (round 9 — the
    vendored baseline codec, multimodal/jpeg.py): pixels are the mm02
    md5-chain payload, written at quality 95 and decoded back through
    the full baseline pipeline (DHT Huffman → dequant → IDCT). JPEG is
    lossy, so unlike mm06's bit-exact PNG arithmetic the oracle checks
    the SOF0 dims arithmetically and falsifies two literal facets:
    n_px_ok (decode produced width·height samples) and err_bounded
    (max |decoded−payload| ≤ 8 — the measured q95 quantization bound
    over this noise corpus is 7; a Huffman/IDCT/zigzag defect blows
    ~100+ past it)."""
    media = synth_jpeg_media(spark, n=N_MEDIA)
    return jpeg_roundtrip_facets(media).orderBy("media_id")
