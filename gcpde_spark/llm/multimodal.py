"""Multimodal (image/audio/video) columns over binary data
(SURVEY.md §2B-16; no reference counterpart — 100 TB extension layer).

Media are opaque ``binary`` columns with typed metadata, loaded through
Spark's ``binaryFile`` source and processed with Arrow-batched
``mapInPandas`` — the Spark-side plumbing (schema, partitioning, UDF
signatures, batch shapes) is real and tested. ``decode="real"`` parses
container headers (PNG/GIF/BMP/JPEG/WAV — published specs, stdlib only)
for width/height/channels/duration, and :func:`resize_images` REALLY
resamples uncompressed 24/32-bpp BMP pixels (``resize_applied`` marks
which rows got real pixel work). Pixel/sample decoding for compressed
codecs (PNG/JPEG/MP3/H.264) is STUBBED (``decode="fake"`` is a
deterministic content-hash stand-in) because no codec library
(PIL/pyav/torchaudio) ships in this environment — swapping one in is a
body-only change to ``_decode_batch``/``_resize_batch``.

Scale notes: ``binaryFile`` gives one row per file with the content as a
single cell — fine for images/short audio; for long video, store
pre-chunked segments. ``maxPartitionBytes`` controls files-per-task;
decode parallelism is task parallelism, and Arrow moves bytes to Python
in batches, not per row.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

_EXT_TO_TYPE = {
    "jpg": "image", "jpeg": "image", "png": "image", "gif": "image", "bmp": "image",
    "wav": "audio", "mp3": "audio", "flac": "audio", "ogg": "audio",
    "mp4": "video", "mkv": "video", "webm": "video", "avi": "video",
}


def read_binary_files(
    spark: SparkSession,
    path: str,
    glob: str | None = None,
    recursive: bool = True,
) -> DataFrame:
    """Load files as binary rows (path, modificationTime, length, content)
    via the built-in ``binaryFile`` source, plus a ``media_type`` column
    derived from the extension ('image' | 'audio' | 'video' | 'other')."""
    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    reader = reader.option("recursiveFileLookup", str(recursive).lower())
    df = reader.load(path)
    ext = F.lower(F.element_at(F.split(F.col("path"), r"\."), -1))
    mapping = F.create_map(
        *[F.lit(x) for pair in _EXT_TO_TYPE.items() for x in pair]
    )
    return df.withColumn("media_type", F.coalesce(mapping[ext], F.lit("other")))


_DECODED_FIELDS = [
    StructField("width", IntegerType(), True),
    StructField("height", IntegerType(), True),
    StructField("n_channels", IntegerType(), True),
    StructField("duration_ms", LongType(), True),
]


def _real_decode(content: bytes, media_type: str) -> dict[str, Any]:
    """Header-level decode of common container formats using only the
    published format specs and the stdlib — no codec libraries:

    - PNG: IHDR width/height/bit-depth/color-type (channels per spec)
    - GIF: logical screen descriptor (RGB)
    - BMP: BITMAPINFOHEADER width/height/bpp
    - JPEG: SOF0/1/2 frame header (height, width, components)
    - WAV: stdlib ``wave`` (channels, frame rate → duration_ms)

    Unrecognized content degrades to all-null metadata rather than
    failing the batch (a 100 TB corpus always contains junk rows; route
    them with ``WHERE width IS NULL``). Pixel/sample decoding (and with
    it resize/feature extraction on real pixels) still requires a codec
    library and remains stubbed.
    """
    out: dict[str, Any] = {
        "width": None, "height": None, "n_channels": None, "duration_ms": None
    }
    b = bytes(content or b"")
    try:
        if b[:8] == b"\x89PNG\r\n\x1a\n" and b[12:16] == b"IHDR":
            out["width"] = int.from_bytes(b[16:20], "big")
            out["height"] = int.from_bytes(b[20:24], "big")
            color_type = b[25]
            out["n_channels"] = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(color_type)
        elif b[:6] in (b"GIF87a", b"GIF89a"):
            out["width"] = int.from_bytes(b[6:8], "little")
            out["height"] = int.from_bytes(b[8:10], "little")
            out["n_channels"] = 3
        elif b[:2] == b"BM" and len(b) >= 32:
            out["width"] = int.from_bytes(b[18:22], "little", signed=True)
            out["height"] = abs(int.from_bytes(b[22:26], "little", signed=True))
            out["n_channels"] = max(1, int.from_bytes(b[28:30], "little") // 8)
        elif b[:2] == b"\xff\xd8":  # JPEG: walk segments to a SOF marker
            i = 2
            while i + 9 < len(b) and b[i] == 0xFF:
                marker, seglen = b[i + 1], int.from_bytes(b[i + 2 : i + 4], "big")
                if marker in (0xC0, 0xC1, 0xC2):  # baseline/extended/progressive
                    out["height"] = int.from_bytes(b[i + 5 : i + 7], "big")
                    out["width"] = int.from_bytes(b[i + 7 : i + 9], "big")
                    out["n_channels"] = b[i + 9]
                    break
                i += 2 + seglen
        elif b[:4] == b"RIFF" and b[8:12] == b"WAVE":
            import io
            import wave

            with wave.open(io.BytesIO(b)) as w:
                out["n_channels"] = w.getnchannels()
                rate = w.getframerate()
                if rate:
                    out["duration_ms"] = int(w.getnframes() * 1000 / rate)
    except Exception:
        return {
            "width": None, "height": None, "n_channels": None, "duration_ms": None
        }
    return out


def _fake_decode(content: bytes, media_type: str) -> dict[str, Any]:
    """Deterministic stand-in decode: metadata derived from the content
    hash. STUB — replace with a real codec; kept deterministic so tests
    and oracles are stable."""
    h = hashlib.sha256(content or b"").digest()
    if media_type == "image":
        return {
            "width": 16 + h[0] % 240,
            "height": 16 + h[1] % 240,
            "n_channels": 1 + h[2] % 3,
            "duration_ms": None,
        }
    return {
        "width": None,
        "height": None,
        "n_channels": 1 + h[2] % 2,
        "duration_ms": 1000 + int.from_bytes(h[3:5], "big"),
    }


def decode_media(df: DataFrame, decode: str = "fake") -> DataFrame:
    """Decode binary content to typed metadata columns with
    ``mapInPandas`` (Arrow batches of rows, not per-row calls).

    ``decode="real"`` parses real container headers (PNG/GIF/BMP/JPEG
    dimensions + channels, WAV channels + duration) from the published
    format specs — stdlib only, see :func:`_real_decode`; unrecognized
    bytes yield null metadata. ``decode="fake"`` is the deterministic
    content-hash stub used by tests/oracles. Both paths share the same
    schema contract; pixel/sample-level decoding still requires a codec
    library (PIL/pyav) and would be a body-only swap here.
    """
    if decode not in ("fake", "real"):
        raise ValueError(f"decode must be 'fake' or 'real', got {decode!r}")
    decode_fn = _real_decode if decode == "real" else _fake_decode
    out_schema = StructType(
        [f for f in df.schema.fields if f.name != "content"] + _DECODED_FIELDS
    )
    passthrough = [f.name for f in df.schema.fields if f.name != "content"]

    def _decode_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            meta = [
                decode_fn(c, t)
                for c, t in zip(pdf["content"], pdf["media_type"])
            ]
            out = pdf[passthrough].copy()
            for field in _DECODED_FIELDS:
                out[field.name] = [m[field.name] for m in meta]
            yield out

    return df.mapInPandas(_decode_batch, out_schema)


def extract_features(df: DataFrame, dim: int = 64) -> DataFrame:
    """Add a ``features: array<float>`` pseudo-embedding per media row.

    Arrow-batched ``mapInPandas``; the feature values are a deterministic
    content-hash expansion (STUB for a real vision/audio encoder — the
    batch shape, schema, and partition behavior match what an ONNX/torch
    encoder plugged into ``_embed_batch`` would see).
    """
    out_schema = StructType(
        list(df.schema.fields) + [StructField("features", ArrayType(FloatType()), True)]
    )
    cols = [f.name for f in df.schema.fields]

    def _embed_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for content in pdf["content"]:
                raw = bytes(content or b"")
                vals: list[float] = []
                counter = 0
                while len(vals) < dim:
                    h = hashlib.sha256(raw + counter.to_bytes(4, "big")).digest()
                    vals.extend(b / 255.0 - 0.5 for b in h)
                    counter += 1
                feats.append(vals[:dim])
            out = pdf[cols].copy()
            out["features"] = feats
            yield out

    return df.mapInPandas(_embed_batch, out_schema)


def _bmp_resize(b: bytes, tw: int, th: int) -> bytes | None:
    """Real nearest-neighbor resize of an uncompressed 24/32-bpp BMP,
    using only the published BMP spec (BITMAPFILEHEADER +
    BITMAPINFOHEADER, BI_RGB, 4-byte-padded rows) and numpy. Returns the
    re-encoded BMP, or None when the content is not a BMP this decoder
    covers (other bpp, RLE compression, exotic DIB headers)."""
    import struct

    import numpy as np

    if len(b) < 54 or b[:2] != b"BM":
        return None
    data_off = int.from_bytes(b[10:14], "little")
    dib_size = int.from_bytes(b[14:18], "little")
    if dib_size < 40:  # BITMAPCOREHEADER et al. — out of scope
        return None
    w = int.from_bytes(b[18:22], "little", signed=True)
    h_raw = int.from_bytes(b[22:26], "little", signed=True)
    bpp = int.from_bytes(b[28:30], "little")
    compression = int.from_bytes(b[30:34], "little")
    h, top_down = abs(h_raw), h_raw < 0
    if compression != 0 or bpp not in (24, 32) or w <= 0 or h == 0:
        return None
    nbytes = bpp // 8
    stride = (w * nbytes + 3) // 4 * 4
    if data_off + stride * h > len(b):
        return None
    rows = np.frombuffer(b, dtype=np.uint8, count=stride * h, offset=data_off)
    px = rows.reshape(h, stride)[:, : w * nbytes].reshape(h, w, nbytes)
    if not top_down:  # resample in image (top-down) coordinates
        px = px[::-1]
    ys = (np.arange(th) * h) // th
    xs = (np.arange(tw) * w) // tw
    resized = px[ys][:, xs]  # nearest neighbor
    out_stride = (tw * nbytes + 3) // 4 * 4
    padded = np.zeros((th, out_stride), dtype=np.uint8)
    # encode bottom-up, the positive-height layout the header declares
    padded[:, : tw * nbytes] = resized[::-1].reshape(th, tw * nbytes)
    pixel_bytes = padded.tobytes()
    info = struct.pack(
        "<IiiHHIIiiII", 40, tw, th, 1, bpp, 0, len(pixel_bytes), 2835, 2835, 0, 0
    )
    header = struct.pack("<2sIHHI", b"BM", 14 + 40 + len(pixel_bytes), 0, 0, 14 + 40)
    return header + info + pixel_bytes


def resize_images(df: DataFrame, width: int, height: int) -> DataFrame:
    """Resize image rows to ``width``×``height`` with Arrow-batched
    ``mapInPandas``; non-image rows pass through untouched with null
    resize metadata.

    Pixel semantics are explicit per row via ``resize_applied``:
    uncompressed 24/32-bpp BMPs are REALLY resampled (nearest-neighbor,
    :func:`_bmp_resize` — stdlib+numpy, no codec library) and their
    ``content`` bytes replaced; every other image format has no stdlib
    pixel codec in this environment, so bytes pass through UNCHANGED with
    ``resize_applied = false`` — only the metadata records the target
    box. Plugging in PIL for those formats is a body-only change to
    ``_resize_batch``. The Spark-side contract is a single map-side pass
    with no shuffle.
    """
    from pyspark.sql.types import BooleanType

    out_schema = StructType(
        list(df.schema.fields)
        + [
            StructField("resized_width", IntegerType(), True),
            StructField("resized_height", IntegerType(), True),
            StructField("resize_applied", BooleanType(), True),
        ]
    )
    cols = [f.name for f in df.schema.fields]

    def _resize_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf[cols].copy()
            rw, rh, applied, contents = [], [], [], []
            for content, mtype in zip(pdf["content"], pdf["media_type"]):
                if mtype != "image":
                    rw.append(None), rh.append(None), applied.append(None)
                    contents.append(content)
                    continue
                resized = _bmp_resize(bytes(content or b""), width, height)
                rw.append(width), rh.append(height)
                applied.append(resized is not None)
                contents.append(resized if resized is not None else content)
            out["content"] = contents
            out["resized_width"] = rw
            out["resized_height"] = rh
            out["resize_applied"] = applied
            yield out

    return df.mapInPandas(_resize_batch, out_schema)


def sample_frames(df: DataFrame, n_frames: int = 4) -> DataFrame:
    """Explode each video row into ``n_frames`` evenly-spaced frame rows
    ``(path, media_type, frame_idx, frame_offset_ms)``.

    This is frame-sample PLUMBING only — the output schema deliberately
    carries no pixel payload (there is no stdlib video codec), so it
    cannot be mistaken for real frame extraction: rows are (offset, idx)
    plans a real decoder (pyav) would fill by yielding a ``frame:
    binary`` column from the same batch iterator."""
    base = decode_media(df)
    out_schema = StructType(
        [
            StructField("path", StringType(), True),
            StructField("media_type", StringType(), True),
            StructField("frame_idx", IntegerType(), True),
            StructField("frame_offset_ms", LongType(), True),
        ]
    )

    def _frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                dur = r["duration_ms"] or 0
                for i in range(n_frames):
                    rows.append(
                        {
                            "path": r["path"],
                            "media_type": r["media_type"],
                            "frame_idx": i,
                            "frame_offset_ms": int(dur * i / n_frames),
                        }
                    )
            yield pd.DataFrame(rows, columns=[f.name for f in out_schema.fields])

    return base.where(F.col("media_type") == "video").mapInPandas(_frames, out_schema)
