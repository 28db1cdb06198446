"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The Spark-side plumbing is real and tested — schema (schemas.MULTIMODAL_BLOB
convention), partitioning, Arrow batch shape, mapInPandas signature.  The
actual media decode is STUBBED (no image/audio libraries in this
container): ``decode_media`` raises NotImplementedError, and
``fake_decode`` provides a deterministic stand-in (md5-derived
dimensions) so the full pipeline is executable and oracle-checkable.

Scale notes: binary payloads ride the same columnar batches as any other
column; mapInPandas streams Arrow record batches so a partition never
fully materializes in Python memory.  Keep payload partitions bounded
with spark.sql.files.maxPartitionBytes; never groupBy a payload column.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType


def decode_media(payload: bytes, media_type: str):
    """Real decode hook — NOT IMPLEMENTED in this container (no
    PIL/ffmpeg/librosa).  Swap in the real implementation on a cluster
    with media libs; everything around it (schema, batching,
    partitioning) is already exercised via fake_decode."""
    raise NotImplementedError(
        "media decode requires image/audio libraries not present in this "
        "container; use fake_decode for the deterministic test path"
    )


def fake_decode(payload: bytes) -> tuple[int, int]:
    """Deterministic stand-in for decode: 'dimensions' derived from the
    payload's md5 (first two bytes) — stable across engines and runs."""
    h = hashlib.md5(payload).hexdigest()
    return int(h[0:2], 16), int(h[2:4], 16)


def to_blob_table(df: DataFrame, id_col: str, payload_col: str, media_type: str = "image") -> DataFrame:
    """Wrap an existing column as the multimodal blob convention:
    (media_id, media_type, payload binary, metadata map)."""
    return df.select(
        F.col(id_col).alias("media_id"),
        F.lit(media_type).alias("media_type"),
        F.col(payload_col).cast("binary").alias("payload"),
        F.create_map(
            F.lit("orig_len"), F.length(F.col(payload_col)).cast("string")
        ).alias("metadata"),
    )


FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("byte_len", LongType()),
        StructField("content_md5", StringType()),
        StructField("fake_width", LongType()),
        StructField("fake_height", LongType()),
    ]
)


def extract_features(blobs: DataFrame) -> DataFrame:
    """Feature extraction over binary payloads via mapInPandas.

    Iterates Arrow record batches (bounded memory), computes per-payload
    features in vectorized pandas where possible.  The decode step uses
    fake_decode (see module docstring); a real cluster swaps decode_media
    in without touching the plumbing.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = pdf["payload"]
            md5s = payloads.map(lambda b: hashlib.md5(bytes(b)).hexdigest())
            dims = payloads.map(lambda b: fake_decode(bytes(b)))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "byte_len": payloads.map(len).astype("int64"),
                    "content_md5": md5s,
                    "fake_width": dims.map(lambda d: d[0]).astype("int64"),
                    "fake_height": dims.map(lambda d: d[1]).astype("int64"),
                }
            )

    return blobs.mapInPandas(batches, schema=FEATURE_SCHEMA)


def png_dimensions(payload) -> tuple:
    """(width, height) parsed straight from PNG IHDR bytes — REAL
    metadata extraction with zero media libraries and zero Python: the
    PNG signature is 8 fixed bytes, the IHDR chunk follows immediately,
    so width/height are the big-endian 4-byte words at offsets 17/21
    (1-based).  Pure substring + hex + conv — whole-stage-codegen'd,
    runs at scan speed over any payload volume.  Returns NULL for
    payloads that don't carry the PNG signature (the E4 drop-don't-fail
    policy applied to binary)."""
    payload = F.col(payload) if isinstance(payload, str) else payload
    is_png = F.hex(F.substring(payload, 1, 8)) == "89504E470D0A1A0A"
    w = F.conv(F.hex(F.substring(payload, 17, 4)), 16, 10).cast("long")
    h = F.conv(F.hex(F.substring(payload, 21, 4)), 16, 10).cast("long")
    return (
        F.when(is_png, w).alias("png_width"),
        F.when(is_png, h).alias("png_height"),
    )


def wav_sample_rate(payload):
    """Sample rate parsed from a canonical RIFF/WAVE header — the
    little-endian 4-byte word at offset 25 (1-based), valid when the
    RIFF and WAVE magics match and the first subchunk is 'fmt '.
    Little-endian means per-byte extraction and positional weights
    (conv on the hex of the whole word would read it big-endian).
    JVM-side expressions only; NULL on anything that isn't a canonical
    WAV."""
    payload = F.col(payload) if isinstance(payload, str) else payload

    def byte_at(pos: int):
        return F.conv(F.hex(F.substring(payload, pos, 1)), 16, 10).cast("long")

    is_wav = (
        (F.hex(F.substring(payload, 1, 4)) == "52494646")  # 'RIFF'
        & (F.hex(F.substring(payload, 9, 4)) == "57415645")  # 'WAVE'
        & (F.hex(F.substring(payload, 13, 4)) == "666D7420")  # 'fmt '
    )
    rate = (
        byte_at(25)
        + byte_at(26) * F.lit(256)
        + byte_at(27) * F.lit(65536)
        + byte_at(28) * F.lit(16777216)
    )
    return F.when(is_wav, rate).alias("wav_sample_rate")


def jpeg_dimensions(payload) -> tuple:
    """(width, height) parsed from a JPEG SOF marker — the third
    ubiquitous container, same zero-codec substring/hex/conv technique
    as PNG/WAV but with one twist: JPEG headers are a CHAIN of
    variable-length segments (APPn, EXIF, quantization tables, ...)
    that must be walked to reach the frame header.  The walk is a
    BOUNDED fold: ``F.aggregate`` over a 16-element sequence hops
    marker-to-marker (offset += 2 + big-endian segment length) until it
    lands on SOF0/SOF1/SOF2 (baseline/extended/progressive), then reads
    height/width as the big-endian words at SOF+5/SOF+7.  Sixteen hops
    covers real-world files (JFIF + EXIF + a few DQT/DHT segments
    before SOF); deeper pathological headers yield NULL, never an
    error.  Everything is JVM-side expression evaluation — no Python,
    no codec, runs at scan speed; NULL for payloads without the FFD8
    signature or with a corrupt segment chain (E4 drop-don't-fail on
    binary)."""
    payload = F.col(payload) if isinstance(payload, str) else payload

    def byte_at(pos):
        return F.coalesce(
            F.conv(F.hex(F.substring(payload, pos, 1)), 16, 10).cast("long"),
            F.lit(-1),
        )

    is_jpeg = F.hex(F.substring(payload, 1, 2)) == "FFD8"
    dead = F.struct(
        F.lit(-1).cast("long").alias("off"), F.lit(-1).cast("long").alias("sof")
    )

    def hop(acc, _):
        off, sof = acc["off"], acc["sof"]
        marker = byte_at(off + 1)
        seglen = byte_at(off + 2) * 256 + byte_at(off + 3)
        return (
            F.when((sof >= 0) | (off < 0), acc)  # found / dead: hold state
            .when(byte_at(off) != 255, dead)  # not at a marker: corrupt
            .when(
                marker.isin(0xC0, 0xC1, 0xC2),  # SOF0/1/2 frame header
                F.struct(off.alias("off"), off.alias("sof")),
            )
            .when(seglen < 2, dead)  # corrupt length
            .otherwise(
                F.struct(
                    (off + 2 + seglen).alias("off"),
                    F.lit(-1).cast("long").alias("sof"),
                )
            )
        )

    # offset 3 (1-based) = first marker after the 2-byte SOI
    init = F.struct(
        F.lit(3).cast("long").alias("off"), F.lit(-1).cast("long").alias("sof")
    )
    sof = F.aggregate(F.sequence(F.lit(1), F.lit(16)), init, hop)["sof"]
    h = byte_at(sof + 5) * 256 + byte_at(sof + 6)
    w = byte_at(sof + 7) * 256 + byte_at(sof + 8)
    # the last dim byte present implies all earlier ones are too
    ok = is_jpeg & (sof >= 0) & (byte_at(sof + 8) >= 0)
    return (F.when(ok, w).alias("jpeg_width"), F.when(ok, h).alias("jpeg_height"))


def parse_media_headers(blobs: DataFrame) -> DataFrame:
    """Typed header metadata for every blob, entirely JVM-side: PNG
    dimensions, JPEG SOF dimensions and WAV sample rate (NULL where
    the magic bytes don't match).  This is the non-stubbed half of the multimodal story —
    container-format metadata needs byte arithmetic, not codec
    libraries, so it runs in whole-stage codegen at any scale; only
    pixel/sample DECODE stays behind the decode_media gate."""
    w, h = png_dimensions(F.col("payload"))
    jw, jh = jpeg_dimensions(F.col("payload"))
    return blobs.select(
        "media_id",
        "media_type",
        F.length("payload").cast("long").alias("byte_len"),
        w,
        h,
        jw,
        jh,
        wav_sample_rate(F.col("payload")),
    )


def frame_sample_plan(blobs: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame-sampling plumbing: expands each payload row into frame
    index rows (decode stubbed — indexes only).  Shows the 1->N explode
    shape a real frame sampler uses; frames inherit the payload row's
    partitioning."""
    return blobs.select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), (F.length("payload") / every_n).cast("int"))
        ).alias("frame_idx"),
    )
