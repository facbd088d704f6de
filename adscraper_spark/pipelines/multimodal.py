"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed by Arrow-batched pandas UDFs.

The image path does REAL decode: corpus image payloads are genuine
binary PPM files (``P6`` header + raw RGB pixels) built JVM-side, and
``decode_image`` parses PPM and 24-bit BMP with pure numpy (~40 LoC) —
no image library needed. Compressed formats (jpeg/png) fall back to
PIL when importable, mirroring a full runtime. Audio/video stay
byte-statistic fakes (no codec in this container), exercising the same
Arrow binary path.

Oracle strategy: an image payload's pixel plane is a prefix of
``documents.text`` (ASCII, so char==byte), so DuckDB can verify TRUE
pixel statistics and the exact md5 of the resized PPM by
reconstructing header+pixels as strings — the Spark side decodes the
binary for real; the SQL side never needs a decoder.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .common import spread

FRAME_BYTES = 64  # fake "frame" = 64-byte slice of the payload

IMG_W = 16                 # corpus image width (pixels)
IMG_LINE = IMG_W * 3       # bytes per pixel row
RESIZE_X_STRIDE = 2        # resize = keep every 2nd pixel column


# ---------------------------------------------------------------------------
# real image codecs (pure numpy — uncompressed header+raw formats)
# ---------------------------------------------------------------------------

def encode_ppm(width: int, height: int, pixels) -> bytes:
    """Binary PPM (P6, maxval 255) from raw RGB bytes / uint8 array."""
    body = pixels.tobytes() if hasattr(pixels, "tobytes") else bytes(pixels)
    if len(body) != width * height * 3:
        raise ValueError(f"pixel buffer is {len(body)} bytes, "
                         f"want {width * height * 3}")
    return b"P6\n%d %d\n255\n" % (width, height) + body


def decode_image(payload: bytes):
    """Decode an uncompressed image payload to
    ``(width, height, pixels)`` with pixels a uint8 ndarray of shape
    (height, width, 3), RGB.

    Native decoders (pure numpy): binary PPM (``P6``, incl. header
    comments) and 24-bit uncompressed BMP (bottom-up or top-down,
    4-byte row padding, BGR→RGB). Anything else goes through PIL when
    importable (the compressed-format path of a full runtime), else
    ValueError."""
    import numpy as np

    if payload[:2] == b"P6":
        pos, vals = 2, []
        while len(vals) < 3:
            while (pos < len(payload)
                   and payload[pos:pos + 1].isspace()):
                pos += 1
            if payload[pos:pos + 1] == b"#":
                while (pos < len(payload)
                       and payload[pos:pos + 1] != b"\n"):
                    pos += 1
                continue
            start = pos
            while (pos < len(payload)
                   and not payload[pos:pos + 1].isspace()):
                pos += 1
            vals.append(int(payload[start:pos]))
        pos += 1  # exactly one whitespace byte before the raster
        w, h, maxval = vals
        if maxval > 255:
            raise ValueError("16-bit PPM not supported")
        px = np.frombuffer(payload, dtype=np.uint8, count=w * h * 3,
                           offset=pos)
        return w, h, px.reshape(h, w, 3)

    if payload[:2] == b"BM":
        import struct

        off, = struct.unpack_from("<I", payload, 10)
        w, h = struct.unpack_from("<ii", payload, 18)
        bpp, = struct.unpack_from("<H", payload, 28)
        comp, = struct.unpack_from("<I", payload, 30)
        if bpp != 24 or comp != 0:
            raise ValueError("only 24-bit uncompressed BMP supported")
        bottom_up = h > 0
        h = abs(h)
        stride = (w * 3 + 3) & ~3  # rows padded to 4 bytes
        rows = (np.frombuffer(payload, dtype=np.uint8,
                              count=stride * h, offset=off)
                .reshape(h, stride)[:, :w * 3].reshape(h, w, 3))
        if bottom_up:
            rows = rows[::-1]
        return w, h, rows[..., ::-1].copy()  # BGR → RGB

    try:
        import io

        from PIL import Image
    except ImportError as e:
        raise ValueError(
            "unsupported image format (PPM/BMP decode natively; "
            "install PIL for compressed formats)") from e
    img = Image.open(io.BytesIO(payload)).convert("RGB")
    return img.width, img.height, np.asarray(img, dtype=np.uint8)


def _round4(x: float) -> float:
    """Half-away-from-zero to 4 places (matches SQL ROUND; Python's
    round() is banker's and would diverge on exact .5 boundaries)."""
    import math

    return math.floor(x * 10000 + 0.5) / 10000


def fake_features(payload: bytes) -> list[float]:
    """Deterministic stand-in for a decoded-media feature vector
    (audio/video: no codec in this container): byte-level statistics
    through the same Arrow binary path a real decoder uses."""
    import numpy as np

    if not payload:
        return [0.0, 0.0, 0.0, 0.0]
    arr = np.frombuffer(payload, dtype=np.uint8)
    n = arr.size
    mean = _round4(int(arr.sum(dtype=np.int64)) / n)
    return [float(n), mean, float(arr.min()), float(arr.max())]


# ---------------------------------------------------------------------------
# media table (JVM-side payload construction)
# ---------------------------------------------------------------------------

def _media_cols():
    """Shared JVM-side expressions: media type + payload. Image rows
    (doc_id % 3 == 0 with ≥ one pixel row of text) carry a REAL binary
    PPM whose raster is the text prefix; audio/video carry raw bytes.
    Short % 3 == 0 docs that can't fill a pixel row fall to 'video'."""
    h = F.floor(F.length("text") / IMG_LINE).cast("long")
    is_img = (F.col("doc_id") % 3 == 0) & (F.length("text") >= IMG_LINE)
    media_type = (F.when(is_img, "image")
                  .when(F.col("doc_id") % 3 == 1, "audio")
                  .otherwise("video"))
    header = F.concat(F.lit(f"P6\n{IMG_W} "), h.cast("string"),
                      F.lit("\n255\n"))
    raster = F.col("text").substr(F.lit(1), (h * IMG_LINE).cast("int"))
    payload = F.when(is_img, F.concat(header, raster).cast("binary")) \
        .otherwise(F.col("text").cast("binary"))
    return media_type, payload


#: SQL mirror of _media_cols (ASCII text ⇒ char ops == byte ops)
_MEDIA_CTE = f"""
WITH m AS (
  SELECT doc_id, text, length(text) AS L,
         CAST(floor(length(text) / {IMG_LINE}) AS BIGINT) AS h,
         (doc_id % 3 = 0 AND length(text) >= {IMG_LINE}) AS is_img
  FROM documents
), p AS (
  SELECT doc_id, text, L, h, is_img,
         CASE WHEN is_img THEN 'image'
              WHEN doc_id % 3 = 1 THEN 'audio'
              ELSE 'video' END AS media_type,
         CASE WHEN is_img
              THEN 'P6' || chr(10) || '{IMG_W} ' || CAST(h AS VARCHAR)
                   || chr(10) || '255' || chr(10)
                   || substr(text, 1, CAST({IMG_LINE} * h AS INT))
              ELSE text END AS payload,
         CASE WHEN is_img
              THEN substr(text, 1, CAST({IMG_LINE} * h AS INT))
              ELSE text END AS body
  FROM m
)
"""


def _media_with_payload(spark: SparkSession, sf_dir: str) -> DataFrame:
    # spread: the Arrow-batched decode/resize UDFs downstream otherwise
    # receive the testdata file's 1-2 scan partitions — 1-2 python
    # workers instead of one per core (common.spread — identity on any
    # real multi-split corpus)
    doc = spread(spark.read.parquet(f"{sf_dir}/documents.parquet"),
                 "doc_id")
    media_type, payload = _media_cols()
    return doc.select("doc_id", media_type.alias("media_type"),
                      payload.alias("payload"))


def multimodal_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → media table (doc_id, media_type, n_bytes,
    payload_md5). Image payloads are real PPM binaries; the md5 is the
    md5 of the ACTUAL file bytes the decoder consumes."""
    # raw scan, no spread: one md5 + length per payload is cheaper
    # than the fan-out exchange (the spread is for the decode UDFs)
    doc = spark.read.parquet(f"{sf_dir}/documents.parquet")
    media_type, payload = _media_cols()
    media = doc.select("doc_id", media_type.alias("media_type"),
                       payload.alias("payload"))
    return (media.select(
        "doc_id", "media_type",
        F.length("payload").cast("long").alias("n_bytes"),
        F.md5("payload").alias("payload_md5"))
        .orderBy("doc_id"))


MULTIMODAL_INGEST_SQL = _MEDIA_CTE + """
SELECT doc_id, media_type,
       CAST(length(payload) AS BIGINT) AS n_bytes,
       md5(payload) AS payload_md5
FROM p ORDER BY doc_id
"""


def media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched feature extraction over the binary column. Image
    rows are DECODED for real (PPM → uint8 pixel array) and the
    statistics are over the pixel plane, with true width/height;
    audio/video get byte statistics over the raw payload
    (width = height = 0)."""
    media = _media_with_payload(spark, sf_dir)

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            out = {"doc_id": [], "media_type": [],
                   "n_bytes": [], "byte_mean": [], "byte_min": [],
                   "byte_max": [], "width": [], "height": []}
            for did, mt, p in zip(pdf["doc_id"], pdf["media_type"],
                                  pdf["payload"]):
                buf = bytes(p)
                if mt == "image":
                    w, h, px = decode_image(buf)
                    flat = px.reshape(-1)
                    if not flat.size:
                        # empty byte domain: the oracle's WHERE L > 0
                        # drops it — stay symmetric (also avoids a
                        # 0-division in the mean)
                        continue
                    row = (float(flat.size),
                           _round4(int(flat.sum(dtype=np.int64))
                                   / flat.size),
                           float(flat.min()), float(flat.max()),
                           float(w), float(h))
                else:
                    if not buf:
                        continue  # oracle WHERE L > 0 symmetry
                    f = fake_features(buf)
                    row = (f[0], f[1], f[2], f[3], 0.0, 0.0)
                out["doc_id"].append(did)
                out["media_type"].append(mt)
                (out["n_bytes"].append(row[0]),
                 out["byte_mean"].append(row[1]),
                 out["byte_min"].append(row[2]),
                 out["byte_max"].append(row[3]),
                 out["width"].append(row[4]),
                 out["height"].append(row[5]))
            yield pd.DataFrame(out)

    return media.mapInPandas(
        extract,
        schema=("doc_id long, media_type string, n_bytes double, "
                "byte_mean double, byte_min double, byte_max double, "
                "width double, height double")
    ).orderBy("doc_id")


MEDIA_FEATURES_SQL = _MEDIA_CTE + f"""
, b AS (
  SELECT doc_id, media_type, is_img, h,
         unnest(string_split_regex(body, '')) AS ch
  FROM p WHERE L > 0
)
SELECT doc_id, media_type,
       CAST(count(*) AS DOUBLE) AS n_bytes,
       round(avg(ord(ch)), 4) AS byte_mean,
       CAST(min(ord(ch)) AS DOUBLE) AS byte_min,
       CAST(max(ord(ch)) AS DOUBLE) AS byte_max,
       CAST(CASE WHEN is_img THEN {IMG_W} ELSE 0 END AS DOUBLE) AS width,
       CAST(CASE WHEN is_img THEN h ELSE 0 END AS DOUBLE) AS height
FROM b GROUP BY doc_id, media_type, is_img, h ORDER BY doc_id
"""


def frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling: explode the raw payload into fixed-size
    'frames' (byte slices) — the video-frame-sampling plumbing
    (slice → explode → per-frame hash), all JVM-side."""
    doc = spread(spark.read.parquet(f"{sf_dir}/documents.parquet"),
                 "doc_id")
    media = doc.select(
        "doc_id", F.col("text").cast("binary").alias("payload"),
        F.length("text").cast("long").alias("n_bytes"))
    n_frames = F.ceil(F.col("n_bytes") / F.lit(FRAME_BYTES)).cast("int")
    frames = F.transform(
        F.sequence(F.lit(0), n_frames - 1),
        lambda i: F.struct(
            i.alias("frame_idx"),
            F.md5(F.substring(F.col("payload"),
                              i * FRAME_BYTES + 1, FRAME_BYTES))
            .alias("frame_md5")))
    return (media.filter(F.col("n_bytes") > 0)
            .select("doc_id", F.explode(frames).alias("f"))
            .select("doc_id", F.col("f.frame_idx").alias("frame_idx"),
                    F.col("f.frame_md5").alias("frame_md5"))
            .orderBy("doc_id", "frame_idx"))


FRAME_SAMPLE_SQL = f"""
WITH nums AS (
  SELECT i - 1 AS i
  FROM (SELECT row_number() OVER () AS i FROM lineitem)
  WHERE i <= (SELECT CAST(ceil(max(length(text)) * 1.0 / {FRAME_BYTES})
                     AS BIGINT) FROM documents)
)
SELECT doc_id, CAST(i AS INT) AS frame_idx,
       md5(substr(text, CAST(i * {FRAME_BYTES} + 1 AS INT),
                  {FRAME_BYTES})) AS frame_md5
FROM documents, nums
WHERE length(text) > 0
  AND i * {FRAME_BYTES} < length(text)
ORDER BY doc_id, frame_idx
"""


RESIZE_STRIDE = 4  # raw-byte downsample ratio (audio/video arm)


def media_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize over the binary column. Image rows: REAL resize — decode
    the PPM, keep every ``RESIZE_X_STRIDE``-th pixel column (nearest-
    neighbor x-downsample), re-encode as PPM, hash the actual output
    file bytes. Audio/video rows: byte-stride downsample (no codec).
    Binary in → numpy transform → binary out, Arrow-batched."""
    media = _media_with_payload(spark, sf_dir).filter(
        F.length("payload") > 0)

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        import numpy as np

        for pdf in batches:
            orig, resized, digests = [], [], []
            for mt, p in zip(pdf["media_type"], pdf["payload"]):
                buf = bytes(p)
                if mt == "image":
                    w, h, px = decode_image(buf)
                    small_px = px[:, ::RESIZE_X_STRIDE, :]
                    small = encode_ppm(small_px.shape[1], h, small_px)
                else:
                    small = np.frombuffer(buf, dtype=np.uint8)[
                        ::RESIZE_STRIDE].tobytes()
                orig.append(len(buf))
                resized.append(len(small))
                digests.append(hashlib.md5(small).hexdigest())
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "orig_bytes": pd.Series(orig, dtype="int64"),
                "resized_bytes": pd.Series(resized, dtype="int64"),
                "resized_md5": digests,
            })

    return (media.mapInPandas(
        resize, schema=("doc_id long, orig_bytes long, "
                        "resized_bytes long, resized_md5 string"))
        .orderBy("doc_id"))


# Image arm: the resized PPM is reconstructable as a string — header
# with the halved width, then every 2nd pixel (keep 3 bytes of each
# 6-byte block; rows are 48 bytes so blocks never straddle rows).
# Raw arm: stride-by-regex, keep the 1st char of every STRIDE-char
# block ((?s) so '.' crosses newlines and stays byte-aligned).
MEDIA_RESIZE_SQL = _MEDIA_CTE + f"""
, r AS (
  SELECT doc_id,
         length(payload) AS orig_bytes,
         CASE WHEN media_type = 'image'
              THEN 'P6' || chr(10) || '{IMG_W // RESIZE_X_STRIDE} '
                   || CAST(h AS VARCHAR) || chr(10) || '255' || chr(10)
                   || regexp_replace(body, '(?s)(.{{3}})(.{{0,3}})',
                                     '\\1', 'g')
              ELSE regexp_replace(body,
                                  '(?s)(.)(.{{0,{RESIZE_STRIDE - 1}}})',
                                  '\\1', 'g')
         END AS small
  FROM p WHERE L > 0
)
SELECT doc_id, CAST(orig_bytes AS BIGINT) AS orig_bytes,
       CAST(length(small) AS BIGINT) AS resized_bytes,
       md5(small) AS resized_md5
FROM r ORDER BY doc_id
"""


QUERIES = {
    "multimodal_ingest": multimodal_ingest,
    "media_features": media_features,
    "frame_sample": frame_sample,
    "media_resize": media_resize,
}
ORACLES = {
    "multimodal_ingest": MULTIMODAL_INGEST_SQL,
    "media_features": MEDIA_FEATURES_SQL,
    "frame_sample": FRAME_SAMPLE_SQL,
    "media_resize": MEDIA_RESIZE_SQL,
}
