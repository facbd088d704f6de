"""Driver contract for the spark-graft builder (PySpark target).

``queries()`` exposes every implemented operator family (SURVEY.md §2 +
the training-data pipeline ops); ``oracle_sql()`` gives the DuckDB
equivalent for each. The crawl-engine surface (wave loop, frontier,
politeness, extraction UDFs, analysis joins) is oracled against parquet
materialized by the PURE-PYTHON sequential paths (simulator trace +
oracle extractor — adscraper_spark/oracle_data.py), so every family has
a rows/schema/hash CORRECTNESS row; the deeper invariants (byte-identity
per adversarial doc, order/seen equivalence, fault injection) live in
tests/ (`python -m pytest -x -q`).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from adscraper_spark.pipelines import crawl_parity as _cp
from adscraper_spark.pipelines import curation as _cur
from adscraper_spark.pipelines import dedup as _dedup
from adscraper_spark.pipelines import multimodal as _mm
from adscraper_spark.pipelines import relational as _rel
from adscraper_spark.pipelines import sampling as _smp
from adscraper_spark.pipelines import similarity as _sim
from adscraper_spark.pipelines import stacks as _stk
from adscraper_spark.pipelines import text_quality as _tq

_MODULES = [_rel, _tq, _dedup, _sim, _mm, _cp, _stk, _smp, _cur]


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return _rel.q1_pricing_summary(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for mod in _MODULES:
        out.update(mod.QUERIES)
    return out


def oracle_sql() -> dict[str, str]:
    # The crawl-parity oracles read pure-Python-materialized parquet;
    # make sure it exists regardless of whether the driver runs the
    # Spark query or the oracle first.
    from adscraper_spark.oracle_data import ensure_oracle_artifacts

    ensure_oracle_artifacts()
    out: dict[str, str] = {}
    for mod in _MODULES:
        out.update(mod.ORACLES)
    return out
