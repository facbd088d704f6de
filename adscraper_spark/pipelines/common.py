"""Shared dataflow helpers for the pipeline query modules."""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Input-size floor for `spread(min_bytes=CHEAP_SCAN_MIN_BYTES)`: below
#: this many scanned bytes the fan-out exchange's fixed latency
#: (~0.1-0.2 s locally) exceeds what a *cheap per-row* projection saves
#: by parallelizing (interleaved A/B at sf0.1: lang_id 0.54 s unspread
#: vs 0.70 s spread, quality_score 0.55 vs 0.73 — while at 10× the
#: same queries are 3× faster WITH the spread). Heavy per-row sites
#: (shingle explodes, hyperplane projections, Arrow decode) keep
#: min_bytes=0 — their compute dwarfs the exchange even on sub-MB
#: files (simhash at sf0.1: 2.24 s unspread vs 1.53 s spread).
CHEAP_SCAN_MIN_BYTES = int(os.environ.get(
    "ADSCRAPER_SPARK_SPREAD_MIN_BYTES", str(2 << 20)))


def _input_bytes(df: DataFrame) -> int | None:
    """Total size of a scan's backing files (local paths only — on any
    other scheme return None and let the caller's partition-count check
    decide; a production-scale corpus out-splits the cores anyway)."""
    total = 0
    try:
        for f in df.inputFiles():
            if f.startswith("file:"):
                f = f[len("file:"):]
            elif "://" in f:
                return None
            total += os.path.getsize(f)
    except Exception:
        return None
    return total


def spread(df: DataFrame, *key_cols: str,
           min_bytes: int = 0) -> DataFrame:
    """Fan a narrow scan out to the session's parallelism when the
    source supplies fewer input splits than cores.

    The driver testdata writes each table as a single parquet row
    group, so Spark plans 1-2 scan tasks regardless of core count and
    every expensive per-row projection (md5 shingles, hyperplane
    projections, regex passes) otherwise runs serially before the
    first exchange — the "one huge unsplittable input" skew case
    (optimization guide §2.5). One keyed exchange of the scanned
    columns unlocks N-way compute; measured 13.3s → 1.3s on simhash at
    sf1.0 for a ~75 MB shuffle.

    Scale-adaptive by construction: when the input already carries at
    least defaultParallelism splits (any real multi-file corpus — at
    100 TB the scan has thousands of tasks) this is the identity, so
    it never ADDS a shuffle at scale. Hash-partitions on the table key
    rather than round-robin: no sort-before-repartition cost, and
    retried tasks deterministically reproduce their row assignment
    (guide §2.5 round-robin retry hazard).

    ``min_bytes``: skip the fan-out when the scan is smaller than this
    (see CHEAP_SCAN_MIN_BYTES) — for cheap per-row projections the
    exchange's fixed cost beats the parallelism below a few MB."""
    n = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= n:
        return df
    if min_bytes:
        total = _input_bytes(df)
        if total is not None and total < min_bytes:
            return df
    if key_cols:
        return df.repartition(n, *[F.col(c) for c in key_cols])
    return df.repartition(n)


def with_global_agg(rows: DataFrame, *aggs) -> DataFrame:
    """Broadcast a 1-row global aggregate of ``rows`` back onto every
    row of ``rows`` WITHOUT re-scanning the source.

    The naive ``rows.crossJoin(broadcast(rows.agg(...)))`` plan
    contains the ``rows`` subtree twice, so the source scan (and any
    expensive projections feeding the aggregate — keyword predicates,
    group-bys) runs twice per action. Caching the intermediate makes
    both sides read one InMemoryTableScan: a single source scan, then
    a partial-aggregated 1-row reduce whose result is broadcast —
    width stays corpus-size independent at 100 TB, and the cached
    relation is the narrow projected columns, not the source table.
    Callers should pass the *smallest* relation that carries the
    aggregate's inputs (ideally post-groupBy)."""
    rows = rows.cache()
    return rows.crossJoin(F.broadcast(rows.agg(*aggs)))
