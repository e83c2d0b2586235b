"""Multimodal (image/audio/video) column operators (SURVEY C23+).

Media are opaque ``BinaryType`` columns with typed metadata, processed by
Arrow-batched pandas UDFs over ``mapInPandas`` — the only layer where Python
touches bytes, and it touches them a batch at a time, never a row at a time.

The container has no image/audio libraries, so the *decode* step is stubbed
(``decode_image`` raises ``NotImplementedError`` unless PIL is importable,
with a clearly-marked deterministic fake for tests). Everything Spark-side —
schema, partitioning, UDF signatures, batch iteration, binaryFile ingestion —
is real and tested (tests/test_multimodal.py).

Wire format of the synthetic blobs (deterministic, seed-free):
  bytes 0-3   magic ``FAKE``
  bytes 4-5   width  (uint16 big-endian)
  bytes 6-7   height (uint16 big-endian)
  byte  8     channels (uint8)
  bytes 9..   payload (md5-chained pseudo-noise, width*height*channels bytes)

The payload chain advances in the HEX-STRING domain — block₀ =
md5(str(id)), blockᵢ₊₁ = md5(hex(blockᵢ)) — so a SQL engine whose md5()
only accepts VARCHAR (DuckDB) can reproduce the exact bytes: that is what
makes mm02/mm03 fully oracle-checkable, not rows-only.
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MAGIC = b"FAKE"

META_SCHEMA = (
    "media_id bigint, fmt string, width int, height int, channels int, n_bytes long"
)
FEATURE_SCHEMA = "media_id bigint, mean_intensity double, byte_entropy double"
FRAME_SCHEMA = "media_id bigint, frame_no int, frame binary, frame_len int"


def _payload(media_id: int, n: int) -> bytes:
    """md5-chained pseudo-noise: deterministic bytes, no RNG state.

    The chain feeds each block's lowercase HEX back into md5 (not the raw
    digest) so engines with VARCHAR-only md5 can recompute it — see module
    docstring.
    """
    out = bytearray()
    h = hashlib.md5(str(media_id).encode()).hexdigest()
    while len(out) < n:
        out.extend(bytes.fromhex(h))
        h = hashlib.md5(h.encode()).hexdigest()
    return bytes(out[:n])


def encode_blob(media_id: int, width: int, height: int, channels: int) -> bytes:
    header = MAGIC + struct.pack(">HHB", width, height, channels)
    return header + _payload(media_id, width * height * channels)


def synth_media(spark: SparkSession, n: int = 64) -> DataFrame:
    """Deterministic media table: (media_id, kind, blob). Sizes vary by id."""
    from final_project_big_data_spark.session import ship_package

    ship_package(spark)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["media_id"]
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "kind": ["image" if i % 3 else "video" for i in ids],
                    "blob": [
                        encode_blob(i, 8 + i % 5, 6 + i % 4, 1 + i % 3)
                        for i in ids
                    ],
                }
            )

    base = spark.range(n).withColumnRenamed("id", "media_id").repartition(4)
    return base.mapInPandas(gen, schema="media_id bigint, kind string, blob binary")


def extract_metadata(media: DataFrame) -> DataFrame:
    """Parse the typed header out of each blob (Arrow-batched).

    Recognizes the synthetic FAKE wire format AND real uncompressed
    24-bit BMP (vendored pure-Python parser, no PIL) — the same operator
    serves both the deterministic test corpus and real files arriving via
    the binaryFile source.
    """

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, blob in zip(pdf["media_id"], pdf["blob"]):
                b = bytes(blob)
                if b[:4] == MAGIC and len(b) >= 9:
                    w, h, c = struct.unpack(">HHB", b[4:9])
                    fmt = "fake"
                elif b[:2] == BMP_MAGIC:
                    try:
                        w, h, _stride, _off = _bmp_header(b)
                        # top-down BMPs carry negative biHeight; report the
                        # pixel height, mirroring decode_bmp's abs(height)
                        h = abs(h)
                        c, fmt = 3, "bmp"
                    except ValueError:
                        w = h = c = 0
                        fmt = "unknown"
                else:
                    w = h = c = 0
                    fmt = "unknown"
                rows.append((mid, fmt, w, h, c, len(b)))
            yield pd.DataFrame(
                rows,
                columns=["media_id", "fmt", "width", "height", "channels", "n_bytes"],
            )

    return media.select("media_id", "blob").mapInPandas(parse, schema=META_SCHEMA)


# ------------------------------------------------- vendored BMP codec (no PIL)

BMP_MAGIC = b"BM"


def encode_bmp(width: int, height: int, pixels: list[tuple[int, int, int]]) -> bytes:
    """Write an uncompressed 24-bit BI_RGB BMP (BITMAPINFOHEADER).

    ``pixels`` is row-major top-down RGB; the file stores rows bottom-up
    in BGR with each row padded to 4 bytes — the standard on-disk layout,
    so the output opens in any image viewer / PIL."""
    if len(pixels) != width * height:
        raise ValueError("pixels must be width*height RGB tuples")
    stride = (width * 3 + 3) & ~3
    body = bytearray()
    for y in range(height - 1, -1, -1):  # bottom-up
        row = bytearray()
        for x in range(width):
            r, g, b = pixels[y * width + x]
            row += bytes((b, g, r))  # BGR on disk
        row += b"\x00" * (stride - len(row))
        body += row
    info = struct.pack("<IiiHHIIiiII", 40, width, height, 1, 24, 0,
                       len(body), 2835, 2835, 0, 0)
    head = struct.pack("<2sIHHI", BMP_MAGIC, 14 + 40 + len(body), 0, 0, 14 + 40)
    return head + info + bytes(body)


def _bmp_header(b: bytes) -> tuple[int, int, int, int]:
    """Validate + parse a 24-bit BI_RGB BMP header.

    Returns (width, height, stride, pixel_offset); raises ``ValueError``
    on anything this vendored parser does not support (compressed,
    paletted, or non-24-bit files — hand those to PIL where it exists)."""
    if len(b) < 54 or b[:2] != BMP_MAGIC:
        raise ValueError("not a BMP")
    (pixel_off,) = struct.unpack_from("<I", b, 10)
    hdr_size, width, height = struct.unpack_from("<Iii", b, 14)
    planes, bpp, compression = struct.unpack_from("<HHI", b, 26)
    if hdr_size < 40 or planes != 1 or bpp != 24 or compression != 0:
        raise ValueError("unsupported BMP variant (need uncompressed 24-bit)")
    if width <= 0 or height == 0:
        raise ValueError("bad BMP dimensions")
    stride = (width * 3 + 3) & ~3
    if pixel_off + stride * abs(height) > len(b):
        raise ValueError("truncated BMP pixel array")
    return width, height, stride, pixel_off


def decode_bmp(blob: bytes) -> dict:
    """Pure-Python decode of an uncompressed 24-bit BMP — same return
    shape as the PIL path of :func:`decode_image` (``pixels`` is
    row-major top-down RGB tuples, exactly ``Image.getdata()``)."""
    b = bytes(blob)
    width, height, stride, off = _bmp_header(b)
    top_down = height < 0
    height = abs(height)
    pixels: list[tuple[int, int, int]] = []
    for y in range(height):
        src_row = y if top_down else height - 1 - y
        base = off + src_row * stride
        for x in range(width):
            i = base + x * 3
            pixels.append((b[i + 2], b[i + 1], b[i]))  # BGR → RGB
    return {"width": width, "height": height, "mode": "RGB", "pixels": pixels}


def decode_image(blob: bytes) -> dict:
    """Real image decode.

    Uncompressed 24-bit BMP decodes in-sandbox via the vendored
    pure-Python parser (round 6 — the live branch of this seam no longer
    needs PIL); every other format requires PIL (a full cluster image),
    and raises ``NotImplementedError`` here. The Spark-side plumbing
    (batching, schema, partitioning) is identical whichever decoder runs
    — tests/test_multimodal.py executes the BMP path unconditionally and
    the PIL path wherever PIL imports.
    """
    b = bytes(blob)
    if b[:2] == BMP_MAGIC:
        try:
            return decode_bmp(b)
        except ValueError:
            pass  # unsupported BMP variant → PIL below
    try:
        from PIL import Image
    except ImportError as exc:
        raise NotImplementedError(
            "non-BMP image decode requires PIL; use fake_decode for the "
            "deterministic test path"
        ) from exc
    import io

    img = Image.open(io.BytesIO(b))
    return {
        "width": img.width,
        "height": img.height,
        "mode": img.mode,
        "pixels": list(img.getdata()),
    }


def fake_decode(blob: bytes) -> list[int]:
    """Deterministic fake decode: payload bytes as intensities."""
    return list(blob[9:])


def decode_intensities(blob: bytes) -> list[int]:
    """Dispatch decode → flat per-channel intensities (the mm02 feature
    input): FAKE blobs yield their payload bytes (unchanged — the
    md5-chain oracle depends on it), BMP blobs yield the decoded RGB
    bytes flattened row-major — the LIVE branch, pure Python."""
    b = bytes(blob)
    if b[:2] == BMP_MAGIC:
        return [v for px in decode_bmp(b)["pixels"] for v in px]
    return fake_decode(b)


def extract_features(media: DataFrame) -> DataFrame:
    """Feature extraction over decoded pixels (mean intensity, byte entropy).

    Runs the same Arrow-batched pipeline over synthetic FAKE blobs and
    real BMP files (via :func:`decode_intensities`)."""
    import math

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, blob in zip(pdf["media_id"], pdf["blob"]):
                px = decode_intensities(bytes(blob))
                n = len(px) or 1
                mean = sum(px) / n
                counts: dict[int, int] = {}
                for v in px:
                    counts[v] = counts.get(v, 0) + 1
                ent = -sum(
                    (c / n) * math.log2(c / n) for c in counts.values()
                )
                # raw doubles: rounding happens Spark-side (F.round matches
                # SQL ROUND half-up; Python round() is banker's)
                rows.append((mid, mean, ent))
            yield pd.DataFrame(
                rows, columns=["media_id", "mean_intensity", "byte_entropy"]
            )

    return media.select("media_id", "blob").mapInPandas(feats, schema=FEATURE_SCHEMA)


def sample_frames(media: DataFrame, frame_bytes: int = 32, every: int = 2) -> DataFrame:
    """Video frame sampling: slice the payload into fixed-size frames and
    keep every ``every``-th (Arrow-batched fan-out — rows out > rows in)."""

    def frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_id, out_no, out_frame, out_len = [], [], [], []
            for mid, blob in zip(pdf["media_id"], pdf["blob"]):
                payload = bytes(blob)[9:]
                n_frames = len(payload) // frame_bytes
                for k in range(0, n_frames, every):
                    fr = payload[k * frame_bytes : (k + 1) * frame_bytes]
                    out_id.append(mid)
                    out_no.append(k)
                    out_frame.append(fr)
                    out_len.append(len(fr))
            yield pd.DataFrame(
                {
                    "media_id": out_id,
                    "frame_no": out_no,
                    "frame": out_frame,
                    "frame_len": out_len,
                }
            )

    return media.select("media_id", "blob").mapInPandas(frames, schema=FRAME_SCHEMA)


def ingest_binary_files(spark: SparkSession, path: str) -> DataFrame:
    """File-system media ingestion via the binaryFile source (reference-free
    generalization of O1: content + path + length + modificationTime)."""
    return spark.read.format("binaryFile").load(path)
