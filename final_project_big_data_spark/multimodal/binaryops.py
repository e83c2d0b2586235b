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

from final_project_big_data_spark.multimodal.jpeg import (
    JPEG_MAGIC,
    decode_jpeg,
    encode_jpeg,
    jpeg_header,
)

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
                elif b[:8] == PNG_MAGIC:
                    try:
                        w, h, c = _png_header(b)
                        fmt = "png"
                    except ValueError:
                        w = h = c = 0
                        fmt = "unknown"
                elif b[:3] == JPEG_MAGIC:
                    try:
                        w, h, c = jpeg_header(b)
                        fmt = "jpeg"
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


# ------------------------------------------------- vendored PNG codec (no PIL)
#
# PNG is signature + chunked (IHDR / IDAT* / IEND), IDAT is zlib — which is
# stdlib — so 8-bit greyscale/RGB non-interlaced PNG decodes in pure Python:
# inflate, then undo the per-scanline byte filters (None/Sub/Up/Average/
# Paeth, the whole filter set of the spec). Exotic variants (palette,
# 16-bit, interlaced) still hand off to PIL where it exists.

PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


def _png_chunks(b: bytes):
    if b[:8] != PNG_MAGIC:
        raise ValueError("not a PNG")
    pos = 8
    while pos + 8 <= len(b):
        (length,) = struct.unpack_from(">I", b, pos)
        ctype = b[pos + 4 : pos + 8]
        data = b[pos + 8 : pos + 8 + length]
        if len(data) != length:
            raise ValueError("truncated PNG chunk")
        yield ctype, data
        pos += 12 + length  # length + type + data + crc
        if ctype == b"IEND":
            return
    raise ValueError("missing IEND")


def _png_header(b: bytes) -> tuple[int, int, int]:
    """Validate + parse the IHDR of a PNG this vendored decoder supports.

    Returns (width, height, channels); raises ``ValueError`` for variants
    outside 8-bit greyscale/RGB non-interlaced (palette, 16-bit, alpha,
    interlace → PIL where it exists)."""
    for ctype, data in _png_chunks(b):
        if ctype != b"IHDR" or len(data) != 13:
            raise ValueError("first chunk is not a valid IHDR")
        w, h, depth, color, comp, filt, interlace = struct.unpack(
            ">IIBBBBB", data
        )
        if w <= 0 or h <= 0:
            raise ValueError("bad PNG dimensions")
        if (depth, comp, filt, interlace) != (8, 0, 0, 0) or color not in (0, 2):
            raise ValueError(
                "unsupported PNG variant (need 8-bit grey/RGB, no interlace)"
            )
        return w, h, 1 if color == 0 else 3
    raise ValueError("empty PNG")


def decode_png(blob: bytes) -> dict:
    """Pure-Python decode of an 8-bit grey/RGB non-interlaced PNG — same
    return shape as the PIL path of :func:`decode_image` (greyscale
    pixels are ints, RGB pixels are tuples, exactly ``Image.getdata()``)."""
    import zlib

    b = bytes(blob)
    width, height, ch = _png_header(b)
    raw = zlib.decompress(
        b"".join(d for t, d in _png_chunks(b) if t == b"IDAT")
    )
    stride = width * ch
    if len(raw) != (stride + 1) * height:
        raise ValueError("PNG pixel data length mismatch")
    prior = bytearray(stride)
    flat = bytearray()
    for y in range(height):
        ftype = raw[y * (stride + 1)]
        line = bytearray(raw[y * (stride + 1) + 1 : (y + 1) * (stride + 1)])
        if ftype == 1:  # Sub
            for x in range(ch, stride):
                line[x] = (line[x] + line[x - ch]) & 0xFF
        elif ftype == 2:  # Up
            for x in range(stride):
                line[x] = (line[x] + prior[x]) & 0xFF
        elif ftype == 3:  # Average
            for x in range(stride):
                a = line[x - ch] if x >= ch else 0
                line[x] = (line[x] + (a + prior[x]) // 2) & 0xFF
        elif ftype == 4:  # Paeth
            for x in range(stride):
                a = line[x - ch] if x >= ch else 0
                c = prior[x - ch] if x >= ch else 0
                p = a + prior[x] - c
                pa, pb, pc = abs(p - a), abs(p - prior[x]), abs(p - c)
                pred = a if pa <= pb and pa <= pc else (prior[x] if pb <= pc else c)
                line[x] = (line[x] + pred) & 0xFF
        elif ftype != 0:
            raise ValueError(f"bad PNG filter type {ftype}")
        flat.extend(line)
        prior = line
    if ch == 1:
        pixels: list = list(flat)
        mode = "L"
    else:
        pixels = [tuple(flat[i : i + 3]) for i in range(0, len(flat), 3)]
        mode = "RGB"
    return {"width": width, "height": height, "mode": mode, "pixels": pixels}


def encode_png(width: int, height: int, pixels, mode: str = "RGB",
               filter_type: int = 0) -> bytes:
    """Write an 8-bit grey/RGB non-interlaced PNG (pure Python, stdlib
    zlib). ``pixels`` is row-major top-down: ints for mode "L", RGB
    tuples for mode "RGB". ``filter_type`` applies one spec filter
    (0–4) to every scanline — the encoder's way of exercising every
    decoder filter path with real files."""
    import zlib

    if mode not in ("L", "RGB"):
        raise ValueError("mode must be L or RGB")
    ch = 1 if mode == "L" else 3
    if len(pixels) != width * height:
        raise ValueError("pixels must be width*height entries")
    if filter_type not in (0, 1, 2, 3, 4):
        raise ValueError("filter_type must be 0..4")
    stride = width * ch
    flat = bytearray()
    for px in pixels:
        flat.extend((px,) if ch == 1 else px)
    raw = bytearray()
    prior = bytearray(stride)
    for y in range(height):
        line = flat[y * stride : (y + 1) * stride]
        raw.append(filter_type)
        for x in range(stride):
            a = line[x - ch] if x >= ch else 0
            bb = prior[x]
            c = prior[x - ch] if x >= ch else 0
            if filter_type == 0:
                v = line[x]
            elif filter_type == 1:
                v = line[x] - a
            elif filter_type == 2:
                v = line[x] - bb
            elif filter_type == 3:
                v = line[x] - (a + bb) // 2
            else:
                p = a + bb - c
                pa, pb_, pc = abs(p - a), abs(p - bb), abs(p - c)
                pred = a if pa <= pb_ and pa <= pc else (bb if pb_ <= pc else c)
                v = line[x] - pred
            raw.append(v & 0xFF)
        prior = line

    def chunk(ctype: bytes, data: bytes) -> bytes:
        import zlib as _z

        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", _z.crc32(ctype + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0 if ch == 1 else 2, 0, 0, 0)
    return (
        PNG_MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


def synth_png_media(spark: SparkSession, n: int = 48) -> DataFrame:
    """Deterministic REAL-PNG table: (media_id, blob). Greyscale pixels
    are the md5-chain payload bytes (the mm02 chain), written through
    :func:`encode_png` with ``filter_type = media_id % 5`` — the corpus
    collectively exercises every scanline filter of the PNG spec, and
    because decode must invert the filter + inflate exactly, a
    feature-level oracle on the decoded pixels checks the real codec
    end-to-end."""
    from final_project_big_data_spark.session import ship_package

    ship_package(spark)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["media_id"]
            blobs = []
            for i in ids:
                w, h = 8 + i % 5, 6 + i % 4
                px = list(_payload(i, w * h))
                blobs.append(encode_png(w, h, px, "L", filter_type=i % 5))
            yield pd.DataFrame({"media_id": ids, "blob": blobs})

    base = spark.range(n).withColumnRenamed("id", "media_id").repartition(4)
    return base.mapInPandas(gen, schema="media_id bigint, blob binary")


def synth_jpeg_media(spark: SparkSession, n: int = 48) -> DataFrame:
    """Deterministic REAL-JPEG table: (media_id, blob). Greyscale pixels
    are the md5-chain payload bytes (the mm02 chain) written through the
    vendored baseline encoder (:mod:`multimodal.jpeg`) at quality 95 —
    lossy, but boundedly so (measured max |err| = 7 per sample over this
    noise corpus), which is what the mm07 facets assert after a real
    decode."""
    from final_project_big_data_spark.session import ship_package

    ship_package(spark)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["media_id"]
            blobs = []
            for i in ids:
                w, h = 8 + i % 5, 6 + i % 4
                px = list(_payload(i, w * h))
                blobs.append(encode_jpeg(w, h, px, "L", quality=95))
            yield pd.DataFrame({"media_id": ids, "blob": blobs})

    base = spark.range(n).withColumnRenamed("id", "media_id").repartition(4)
    return base.mapInPandas(gen, schema="media_id bigint, blob binary")


def jpeg_roundtrip_facets(media: DataFrame) -> DataFrame:
    """Decode each (vendored-encoder) JPEG blob and compare against the
    regenerated md5-chain payload: dims from the real SOF0 header plus
    two decode-quality facets an oracle can falsify as literals —
    n_px_ok (decoded sample count == width·height) and err_bounded
    (max |decoded−original| ≤ 8: the measured q95 bound over the
    md5-noise corpus is 7, while a Huffman/zigzag/IDCT defect lands
    ~100+)."""

    def facets(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from final_project_big_data_spark.multimodal.jpeg import (
            decode_jpeg as _dec,
        )

        for pdf in batches:
            rows = []
            for mid, blob in zip(pdf["media_id"], pdf["blob"]):
                out = _dec(bytes(blob))
                want = _payload(mid, out["width"] * out["height"])
                got = out["pixels"]
                err = max(
                    (abs(a - b) for a, b in zip(want, got)), default=0
                )
                rows.append(
                    (
                        mid,
                        out["width"],
                        out["height"],
                        len(got) == out["width"] * out["height"],
                        err <= 8,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "width", "height", "n_px_ok", "err_bounded",
                ],
            )

    return media.select("media_id", "blob").mapInPandas(
        facets,
        schema="media_id bigint, width int, height int, "
        "n_px_ok boolean, err_bounded boolean",
    )


# ------------------------------------------------ vendored WAV codec (stdlib)
#
# PCM WAV needs no third-party lib at all: the stdlib ``wave`` module
# reads and writes RIFF/WAVE PCM containers. Round 7 makes the audio leg
# of the multimodal surface live in-sandbox with real files — 16-bit PCM,
# any rate/channel count.

WAV_MAGIC = (b"RIFF", b"WAVE")  # bytes 0-3, bytes 8-11


def is_wav(b: bytes) -> bool:
    return len(b) >= 12 and b[:4] == WAV_MAGIC[0] and b[8:12] == WAV_MAGIC[1]


def encode_wav(samples: list[int], sample_rate: int, channels: int) -> bytes:
    """Write a real 16-bit PCM RIFF/WAVE file (stdlib ``wave``).

    ``samples`` is channel-interleaved int16; ``len(samples)`` must be a
    multiple of ``channels``."""
    import io
    import wave

    if len(samples) % channels:
        raise ValueError("samples must interleave to whole frames")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(channels)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(struct.pack(f"<{len(samples)}h", *samples))
    return buf.getvalue()


def decode_wav(blob: bytes) -> dict:
    """Real audio decode (stdlib ``wave``): params + int16 samples."""
    import io
    import wave

    with wave.open(io.BytesIO(bytes(blob)), "rb") as w:
        n = w.getnframes()
        raw = w.readframes(n)
        if w.getsampwidth() != 2:
            raise ValueError("vendored WAV path is 16-bit PCM only")
        return {
            "sample_rate": w.getframerate(),
            "channels": w.getnchannels(),
            "sample_width": w.getsampwidth(),
            "n_frames": n,
            "samples": list(struct.unpack(f"<{n * w.getnchannels()}h", raw)),
        }


AUDIO_META_SCHEMA = (
    "media_id bigint, fmt string, sample_rate int, channels int, "
    "sample_width int, n_frames int, n_bytes long"
)
AUDIO_FEATURE_SCHEMA = "media_id bigint, mean_amplitude double, peak int"


def synth_audio(spark: SparkSession, n: int = 48) -> DataFrame:
    """Deterministic REAL-WAV table: (media_id, blob), 16-bit PCM whose
    samples are the md5-chain payload bytes read as little-endian int16 —
    the same hex-domain chain mm02 uses, so a VARCHAR-md5 SQL engine can
    regrow every sample and the audio surface stays value-oracle-checked
    even though the blobs are genuine RIFF/WAVE files."""
    from final_project_big_data_spark.session import ship_package

    ship_package(spark)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["media_id"]
            blobs = []
            for i in ids:
                rate = 8000 + 4000 * (i % 3)
                ch = 1 + i % 2
                n_frames = 40 + (i % 7) * 8
                payload = _payload(i, 2 * n_frames * ch)
                samples = list(
                    struct.unpack(f"<{n_frames * ch}h", payload)
                )
                blobs.append(encode_wav(samples, rate, ch))
            yield pd.DataFrame({"media_id": ids, "blob": blobs})

    base = spark.range(n).withColumnRenamed("id", "media_id").repartition(4)
    return base.mapInPandas(gen, schema="media_id bigint, blob binary")


def extract_audio_metadata(media: DataFrame) -> DataFrame:
    """Parse RIFF/WAVE params out of each blob (Arrow-batched) — the
    audio analogue of :func:`extract_metadata`."""

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, blob in zip(pdf["media_id"], pdf["blob"]):
                b = bytes(blob)
                if is_wav(b):
                    try:
                        d = decode_wav(b)
                        rows.append(
                            (mid, "wav", d["sample_rate"], d["channels"],
                             d["sample_width"], d["n_frames"], len(b))
                        )
                        continue
                    except Exception:
                        pass
                rows.append((mid, "unknown", 0, 0, 0, 0, len(b)))
            yield pd.DataFrame(
                rows,
                columns=["media_id", "fmt", "sample_rate", "channels",
                         "sample_width", "n_frames", "n_bytes"],
            )

    return media.select("media_id", "blob").mapInPandas(
        parse, schema=AUDIO_META_SCHEMA
    )


def extract_audio_features(media: DataFrame) -> DataFrame:
    """Decode WAV → (mean amplitude, peak |sample|) per blob — a real
    decode feeding per-batch Python arithmetic, Arrow in and out."""

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, blob in zip(pdf["media_id"], pdf["blob"]):
                s = decode_wav(bytes(blob))["samples"]
                n = len(s) or 1
                rows.append(
                    (mid, sum(s) / n, max((abs(v) for v in s), default=0))
                )
            yield pd.DataFrame(
                rows, columns=["media_id", "mean_amplitude", "peak"]
            )

    return media.select("media_id", "blob").mapInPandas(
        feats, schema=AUDIO_FEATURE_SCHEMA
    )


def decode_image(blob: bytes) -> dict:
    """Real image decode.

    Uncompressed 24-bit BMP (round 6), 8-bit grey/RGB non-interlaced
    PNG (round 7) and baseline sequential JPEG (round 9) decode
    in-sandbox via the vendored pure-Python parsers — the live branches
    of this seam need no PIL; anything else (progressive JPEG, palette
    PNG, ...) requires PIL (a full cluster image), and raises
    ``NotImplementedError`` here. The Spark-side plumbing (batching,
    schema, partitioning) is identical whichever decoder runs —
    tests/test_multimodal.py executes the BMP/PNG/JPEG paths
    unconditionally and the PIL paths wherever PIL imports.
    """
    b = bytes(blob)
    if b[:2] == BMP_MAGIC:
        try:
            return decode_bmp(b)
        except ValueError:
            pass  # unsupported BMP variant → PIL below
    if b[:8] == PNG_MAGIC:
        try:
            return decode_png(b)
        except ValueError:
            pass  # unsupported PNG variant → PIL below
    if b[:3] == JPEG_MAGIC:
        try:
            return decode_jpeg(b)
        except ValueError:
            pass  # non-baseline JPEG → PIL below
    try:
        from PIL import Image
    except ImportError as exc:
        raise NotImplementedError(
            "image decode beyond vendored BMP/PNG requires PIL; use "
            "fake_decode for the deterministic test path"
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
    """Dispatch decode → flat per-channel intensities (the mm02/mm06
    feature input): FAKE blobs yield their payload bytes (unchanged —
    the md5-chain oracle depends on it), BMP/PNG blobs yield the decoded
    pixel bytes flattened row-major — the LIVE branches, pure Python."""
    b = bytes(blob)
    if b[:2] == BMP_MAGIC:
        return [v for px in decode_bmp(b)["pixels"] for v in px]
    if b[:8] == PNG_MAGIC or b[:3] == JPEG_MAGIC:
        out = decode_png(b) if b[:8] == PNG_MAGIC else decode_jpeg(b)
        if out["mode"] == "L":
            return list(out["pixels"])
        return [v for px in out["pixels"] for v in px]
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
