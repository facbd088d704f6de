"""Driver contract for the spark-graft builder (PySpark target).

``queries()`` exposes every implemented operator family (SURVEY.md §2 +
the training-data pipeline ops); ``oracle_sql()`` gives the DuckDB
equivalent for each SQL-expressible one. The crawl engine itself (wave
loop, frontier, politeness, checkpoint) is exposed via
``crawl_engine_e2e`` (rows-only check — a stateful multi-commit loop is
not one SQL statement) and is fully verified against its sequential
simulator in tests/ (`python -m pytest -x -q`).
"""

from __future__ import annotations

import os
import tempfile
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from adscraper_spark.pipelines import dedup as _dedup
from adscraper_spark.pipelines import multimodal as _mm
from adscraper_spark.pipelines import relational as _rel
from adscraper_spark.pipelines import similarity as _sim
from adscraper_spark.pipelines import text_quality as _tq

_MODULES = [_rel, _tq, _dedup, _sim, _mm]


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return _rel.q1_pricing_summary(spark, "/root/testdata/sf0.001")


def _crawl_engine_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end crawl over a deterministic synthetic web corpus: seeds
    → politeness-scheduled waves → fetch-join → extraction UDFs →
    frontier admission → results table. Returns the fetched-pages
    results (url, wave, host, depth, text, n_ads, ...) — deterministic,
    so repeated runs produce identical rows."""
    from adscraper_spark.config import CrawlConfig
    from adscraper_spark.corpus import (
        CorpusSpec, gen_seeds, write_corpus_parquet,
    )
    from adscraper_spark.engine import CrawlEngine

    spec = CorpusSpec(n_pages=200, n_hosts=10, seed=42)
    cache = os.path.join(tempfile.gettempdir(),
                         f"adscraper_spark_corpus_{spec.n_pages}_{spec.seed}")
    if not os.path.exists(os.path.join(cache, "pages.parquet")):
        write_corpus_parquet(spec, cache)
    cfg = CrawlConfig(wave_seconds=10, default_budget=3, max_waves=4,
                      max_depth=2)
    work = tempfile.mkdtemp(prefix="adscraper_spark_run_")
    eng = CrawlEngine(spark, os.path.join(cache, "pages.parquet"),
                      os.path.join(cache, "robots.parquet"), work, cfg)
    eng.bootstrap([(i, u) for i, u in enumerate(gen_seeds(spec, 10))])
    eng.run()
    res = eng.results.read(spark)
    return res.select("url", "wave", "host", "depth", "text", "n_ads",
                      "readerable", "lang").orderBy("wave", "url")


def _extraction_udf_demo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The vectorized extraction UDF surface (U1-U10) over synthetic
    HTML — returns per-url text/links/ads counts (rows-only check; the
    byte-identity gate lives in tests/test_extraction.py)."""
    from pyspark.sql import functions as F

    from adscraper_spark.corpus import CorpusSpec, gen_html, gen_page_row
    from adscraper_spark.extraction.udfs import extract_pages

    spec = CorpusSpec(n_pages=120, n_hosts=8, seed=42)
    rows = [(spec.page_url(h, j), gen_html(spec, h, j))
            for h, j in spec.iter_pages()]
    df = spark.createDataFrame(rows, "url string, html binary")
    out = extract_pages(df)
    return (out.select("url", "text", F.size("links").alias("n_links"),
                       "n_ads", "readerable",
                       F.size("rss_urls").alias("n_rss"))
            .orderBy("url"))


def _find_articles_demo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SubpageExplorer analog (findArticle, find-page.ts): seeded-rank
    candidate exploration over the synthetic corpus; deterministic
    (rows-only check; oracle-equivalence lives in tests/test_analysis.py).
    """
    from adscraper_spark.analysis import find_articles
    from adscraper_spark.corpus import CorpusSpec, write_corpus_parquet

    spec = CorpusSpec(n_pages=200, n_hosts=10, seed=42)
    cache = os.path.join(tempfile.gettempdir(),
                         f"adscraper_spark_corpus_{spec.n_pages}_{spec.seed}")
    if not os.path.exists(os.path.join(cache, "pages.parquet")):
        write_corpus_parquet(spec, cache)
    sources = [(spec.page_url(0, j),) for j in range(15)]
    src_df = spark.createDataFrame(sources, "url string")
    return find_articles(spark, os.path.join(cache, "pages.parquet"),
                         src_df, seed=42).orderBy("src_url")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for mod in _MODULES:
        out.update(mod.QUERIES)
    out["crawl_engine_e2e"] = _crawl_engine_e2e
    out["extraction_udf_demo"] = _extraction_udf_demo
    out["find_articles_demo"] = _find_articles_demo
    return out


def oracle_sql() -> dict[str, str]:
    out: dict[str, str] = {}
    for mod in _MODULES:
        out.update(mod.ORACLES)
    # crawl_engine_e2e / extraction_udf_demo: stateful loop + HTML UDF —
    # not SQL-expressible; driver records rows-only checks, full
    # verification is the pytest simulator/byte-identity suite.
    return out
