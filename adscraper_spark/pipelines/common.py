"""Shared dataflow helpers for the pipeline query modules."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


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
