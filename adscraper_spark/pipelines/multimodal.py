"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed by Arrow-batched pandas UDFs.

The runtime has no image/audio decode libraries, so the decode step is
STUBBED (``decode_image`` raises NotImplementedError unless PIL is
importable; a deterministic fake feature extractor stands in) — but the
Spark-side plumbing is real and tested: schema, binary payload flow
through Arrow, mapInPandas batch shapes, frame-sample explode,
partitioning.

Since the driver testdata has no binary media, payloads are derived
deterministically from ``documents.text`` (UTF-8 bytes) — the plumbing
is identical to real media bytes.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

FRAME_BYTES = 64  # fake "frame" = 64-byte slice of the payload


def decode_image(payload: bytes):
    """Real decode stub — wire PIL/libvips here in a full runtime."""
    try:
        from PIL import Image  # noqa: F401
    except ImportError as e:
        raise NotImplementedError(
            "image decode requires PIL; this runtime processes media as "
            "opaque bytes (deterministic fake features instead)") from e
    raise NotImplementedError("real decode not wired in this environment")


def fake_features(payload: bytes) -> list[float]:
    """Deterministic stand-in for a decoded-media feature vector:
    byte-level statistics (exercises the same Arrow binary path a real
    decoder would). numpy over the buffer — the interpreter never loops
    bytes (~50× over a Python sum on real payloads)."""
    import math

    import numpy as np

    if not payload:
        return [0.0, 0.0, 0.0, 0.0]
    arr = np.frombuffer(payload, dtype=np.uint8)
    n = arr.size
    # half-away-from-zero rounding (matches SQL ROUND; Python's round()
    # is banker's and would diverge on exact .5 boundaries)
    mean = math.floor(int(arr.sum(dtype=np.int64)) / n * 10000 + 0.5) / 10000
    return [float(n), mean, float(arr.min()), float(arr.max())]


def multimodal_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → media table (doc_id, media_type, payload binary,
    n_bytes, payload_md5). Pure column ops; binary column materialized
    for downstream UDFs."""
    doc = spark.read.parquet(f"{sf_dir}/documents.parquet")
    payload = F.col("text").cast("binary")
    media_type = F.when(F.col("doc_id") % 3 == 0, "image") \
        .when(F.col("doc_id") % 3 == 1, "audio").otherwise("video")
    return (doc.select(
        "doc_id",
        media_type.alias("media_type"),
        F.length(payload).cast("long").alias("n_bytes"),
        F.md5(payload).alias("payload_md5"))
        .orderBy("doc_id"))


def _media_with_payload(spark: SparkSession, sf_dir: str) -> DataFrame:
    doc = spark.read.parquet(f"{sf_dir}/documents.parquet")
    media_type = F.when(F.col("doc_id") % 3 == 0, "image") \
        .when(F.col("doc_id") % 3 == 1, "audio").otherwise("video")
    return doc.select(
        "doc_id", media_type.alias("media_type"),
        F.col("text").cast("binary").alias("payload"))


MULTIMODAL_INGEST_SQL = """
SELECT doc_id,
       CASE WHEN doc_id % 3 = 0 THEN 'image'
            WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS media_type,
       CAST(length(text) AS BIGINT) AS n_bytes,
       md5(text) AS payload_md5
FROM documents ORDER BY doc_id
"""


def media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched 'decode'/feature-extract over the binary column —
    the real-media codepath with the decoder faked (see module doc)."""
    media = _media_with_payload(spark, sf_dir)

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [fake_features(bytes(p)) for p in pdf["payload"]]
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "media_type": pdf["media_type"],
                "n_bytes": [f[0] for f in feats],
                "byte_mean": [f[1] for f in feats],
                "byte_min": [f[2] for f in feats],
                "byte_max": [f[3] for f in feats],
            })

    return media.mapInPandas(
        extract,
        schema=("doc_id long, media_type string, n_bytes double, "
                "byte_mean double, byte_min double, byte_max double")
    ).orderBy("doc_id")


MEDIA_FEATURES_SQL = """
WITH b AS (
  SELECT doc_id,
         CASE WHEN doc_id % 3 = 0 THEN 'image'
              WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END
           AS media_type,
         unnest(string_split_regex(text, '')) AS ch
  FROM documents WHERE length(text) > 0
)
SELECT doc_id, media_type,
       CAST(count(*) AS DOUBLE) AS n_bytes,
       round(avg(ord(ch)), 4) AS byte_mean,
       CAST(min(ord(ch)) AS DOUBLE) AS byte_min,
       CAST(max(ord(ch)) AS DOUBLE) AS byte_max
FROM b GROUP BY doc_id, media_type ORDER BY doc_id
"""


def frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling: explode the payload into fixed-size 'frames'
    (byte slices) — the video-frame-sampling plumbing (slice → explode →
    per-frame hash), all JVM-side."""
    media = _media_with_payload(spark, sf_dir).withColumn(
        "n_bytes", F.length("payload").cast("long"))
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


RESIZE_STRIDE = 4  # keep every 4th byte — the downsample ratio


def media_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize plumbing: downsample the binary payload by striding
    (every ``RESIZE_STRIDE``-th byte) in an Arrow-batched pandas UDF —
    the exact codepath a real image resize takes (binary in, numpy
    transform, binary out), with the pixel math faked as a byte stride.
    Output keeps the resized payload's md5 + sizes so the oracle can
    verify the transform content, not just shapes. (The oracle's
    char-stride equals the byte stride because the synthetic corpus
    text is ASCII — same precedent as media_features' ord-vs-uint8.)"""
    media = _media_with_payload(spark, sf_dir).filter(
        F.length("payload") > 0)  # mirror the oracle's length(text)>0

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        import numpy as np

        for pdf in batches:
            orig, resized, digests = [], [], []
            for p in pdf["payload"]:
                buf = bytes(p)
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


# stride-by-regex: keep the 1st char of every STRIDE-char block.
# (?s) makes '.' match newlines — without it a \n in the text would be
# skipped by the match, de-aligning the blocks vs the byte stride.
MEDIA_RESIZE_SQL = f"""
SELECT doc_id,
       CAST(length(text) AS BIGINT) AS orig_bytes,
       CAST(length(regexp_replace(text,
                                  '(?s)(.)(.{{0,{RESIZE_STRIDE - 1}}})',
                                  '\\1', 'g')) AS BIGINT)
         AS resized_bytes,
       md5(regexp_replace(text, '(?s)(.)(.{{0,{RESIZE_STRIDE - 1}}})',
                          '\\1', 'g')) AS resized_md5
FROM documents WHERE length(text) > 0
ORDER BY doc_id
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
