"""Bucketed pages-corpus layout — scan pruning for the per-wave fetch.

The wave fetch (S6/J7, engine.fetch_join) is the hot path of every
crawl: scheduled urls ⋈ pages corpus, where the corpus side carries the
html payload. An unbucketed corpus makes every wave scan the WHOLE
corpus — wave cost grows with corpus size, which is exactly wrong at a
10^10-URL frontier where a wave is ~10^-4 of the corpus.

Fix = the Iceberg ``bucket(N, url)`` partition-transform analog the
frontier logs already use (store.SnapshotTable bucket_col): lay the
corpus out as hive partitions ``url_bucket=K`` where
``K = pmod(xxhash64(url), N)``, compute each wave's bucket-id set from
the (tiny, cached) scheduled set, and prune the fetch scan to those
partitions. Catalyst turns the ``url_bucket IN (...)`` filter into
partition pruning at file-index time, so the scan's input files are
∝ the wave's bucket spread, never the corpus. With N sized ∝ corpus
(pages_per_bucket roughly constant), wave cost scales with wave size
at any corpus size. Under real Iceberg this module is replaced by the
table's own bucket transform + runtime partition filter.

Reference anchor: the per-URL fetch is the reference's cost center
(crawler/src/crawler.ts:549-551); this is its batch equivalent.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

BUCKET_COL = "url_bucket"
_MARKER = "_corpus_layout.json"


def bucket_id_col(num_buckets: int, url_col: str = "url"):
    """The bucket transform — MUST be identical on the write path
    (bucketize_corpus) and the read path (wave bucket-set computation):
    JVM-side xxhash64, no Python in the loop."""
    return F.pmod(F.xxhash64(F.col(url_col)),
                  F.lit(num_buckets)).cast("int")


def bucketize_corpus(spark: SparkSession, src_path: str, out_path: str,
                     num_buckets: int) -> str:
    """Rewrite a pages corpus into the bucketed layout: one hive
    partition dir per url bucket, ONE file per bucket (repartition by
    the bucket id first — otherwise every write task emits a sliver
    into every bucket dir and the layout degrades into tasks×buckets
    tiny files).

    Sizing: pick num_buckets so a bucket holds a few hundred MB at the
    target corpus size. Bucket count trades prune granularity (a wave
    of W urls scans ≤W buckets) against full-scan overhead (a
    frontier-sized wave that touches every bucket pays per-file open
    cost — measured ~25% slower at a toy 1.5 MB/bucket layout, ~zero
    at production bucket sizes where file count matches the unbucketed
    layout). The engine additionally skips the prune filter entirely
    when a wave touches >60% of buckets."""
    df = spark.read.parquet(src_path)
    (df.withColumn(BUCKET_COL, bucket_id_col(num_buckets))
       .repartition(num_buckets, F.col(BUCKET_COL))
       .write.partitionBy(BUCKET_COL).mode("overwrite").parquet(out_path))
    with open(os.path.join(out_path, _MARKER), "w") as f:
        json.dump({"bucket_col": "url", "num_buckets": num_buckets,
                   "transform": f"pmod(xxhash64(url), {num_buckets})"}, f)
    return out_path


def corpus_layout(path: str) -> dict | None:
    """The layout marker, or None for a plain (unbucketed) corpus."""
    try:
        with open(os.path.join(path, _MARKER)) as f:
            return json.load(f)
    except (OSError, ValueError):
        return None


def prune_buckets(pages: DataFrame, bucket_ids) -> DataFrame:
    """Restrict a bucketed-corpus DataFrame to the given bucket ids.
    The IN-filter on the partition column prunes at the file index —
    unselected bucket dirs are never opened (asserted by
    tests/test_plan_shape.py). Callers should reuse ONE DataFrame for
    the whole crawl (engine caches it): the file listing happens at
    relation creation, so re-reading the path per wave would re-list
    every bucket dir per wave."""
    ids = sorted(int(b) for b in bucket_ids)
    return pages.filter(F.col(BUCKET_COL).isin(ids))


def read_pruned(spark: SparkSession, path: str, layout: dict,
                bucket_ids) -> DataFrame:
    """One-shot convenience: read + prune (tests; the engine prunes its
    cached relation via prune_buckets instead)."""
    return prune_buckets(spark.read.parquet(path), bucket_ids)
