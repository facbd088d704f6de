"""Crawl-engine parity queries — the SURVEY §2 engine surface
(S6/J7/U-suite/Z-suite, J2/J3 analysis joins) as oracle-checkable
CORRECTNESS entries.

Each Spark query recomputes its answer through the distributed plans
(wave loop, extraction UDF, explodes, joins); each oracle is plain SQL
over parquet materialized by the PURE-PYTHON sequential paths
(oracle_data.py: simulator trace, oracle extractor, link/ad graph), so
the driver's rows/schema/hash compare is engine-vs-oracle, not
self-comparison.

Reference anchors: crawl loop crawler/src/crawler.ts:295-442; extraction
invariant adscraper.sql:166 + find-page.ts:247-250; analysis joins
README.md:305-330; subpage exploration find-page.ts:69-163.
"""

from __future__ import annotations

import atexit
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..oracle_data import (
    FIND_SEED, N_SEEDS, artifact_paths, engine_config,
    ensure_oracle_artifacts, find_sources, oracle_spec,
)

_P = artifact_paths()


_E2E_CACHE: dict = {}


def _e2e_engine(spark: SparkSession):
    """The e2e engine run, shared by every engine-backed parity query
    in this process (crawl_engine_e2e, page_type_reload, J4 lineage,
    crawl_meta) — one crawl, four oracle views, instead of re-crawling
    per query."""
    from ..corpus import gen_seeds
    from ..engine import CrawlEngine

    # Key by applicationId AND hold the session: id(spark) alone can be
    # reused by a NEW session after the old one is garbage-collected,
    # handing back an engine bound to a stopped SparkContext. The cache
    # is SINGLE-entry (cleared on a new session) so stopped sessions
    # and their engines are not pinned for the process lifetime.
    key = spark.sparkContext.applicationId
    hit = _E2E_CACHE.get(key)
    if hit is not None and hit[0] is spark:
        return hit[1]
    for _s, old in _E2E_CACHE.values():
        # evicted engine's on-disk snapshot store would otherwise leak
        # in /tmp for the host lifetime (one per bench/pytest process)
        shutil.rmtree(old.workdir, ignore_errors=True)
    _E2E_CACHE.clear()
    p = ensure_oracle_artifacts()
    work = tempfile.mkdtemp(prefix="adscraper_spark_e2e_")
    atexit.register(shutil.rmtree, work, ignore_errors=True)
    eng = CrawlEngine(spark, p["pages"], p["robots"], work,
                      engine_config())
    eng.bootstrap([(i, u)
                   for i, u in enumerate(gen_seeds(oracle_spec(),
                                                   N_SEEDS))])
    eng.run()
    _E2E_CACHE[key] = (spark, eng)
    return eng


def crawl_engine_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end crawl over the deterministic synthetic corpus: seeds →
    politeness-scheduled waves → fetch-join → extraction UDFs → frontier
    admission (links + J4 ad landings) → results table with
    page_type/reload/referrer-ad lineage. Oracle = the sequential
    simulator's fetched-page trace (crawler.ts:295-442 loop semantics;
    page_type adscraper.sql:58, reload adscraper.sql:63). ad_id is
    compared as a string: 62-bit ids don't survive a float64 round-trip
    in the pandas compare."""
    res = _e2e_engine(spark).results.read(spark)
    return (res.select(
        "url", F.col("wave").cast("long").alias("wave"), "host",
        F.col("depth").cast("long").alias("depth"), "text",
        F.col("n_ads").cast("long").alias("n_ads"), "readerable", "lang",
        "page_type", F.col("reload").cast("long").alias("reload"),
        F.col("ad_id").cast("string").alias("ad_id"))
        .orderBy("wave", "url", "reload"))


CRAWL_ENGINE_E2E_SQL = f"""
SELECT url, CAST(wave AS BIGINT) AS wave, host,
       CAST(depth AS BIGINT) AS depth, text,
       CAST(n_ads AS BIGINT) AS n_ads, readerable, lang,
       page_type, CAST(reload AS BIGINT) AS reload,
       CAST(ad_id AS VARCHAR) AS ad_id
FROM read_parquet('{_P["trace"]}')
ORDER BY wave, url, reload
"""


def page_type_reload(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Page-type/reload lineage rollup over the e2e run — main pages
    appear twice (reload 0/1, the refresh-and-rescrape analog), landing
    pages carry referrer ads (J4)."""
    res = _e2e_engine(spark).results.read(spark)
    return (res.groupBy("page_type",
                        F.col("reload").cast("long").alias("reload"))
            .agg(F.count("*").alias("n_rows"),
                 F.countDistinct("url").alias("n_urls"),
                 F.min("url").alias("first_url"))
            .orderBy("page_type", "reload"))


PAGE_TYPE_RELOAD_SQL = f"""
SELECT page_type, CAST(reload AS BIGINT) AS reload,
       count(*) AS n_rows, count(DISTINCT url) AS n_urls,
       min(url) AS first_url
FROM read_parquet('{_P["trace"]}')
GROUP BY 1, 2 ORDER BY page_type, reload
"""


def j4_landing_lineage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J4: landing pages joined back to their referrer ad
    (adscraper.sql:152 page.referrer_ad → ad.id) through the engine's
    own ads table — the in-crawl click lineage."""
    eng = _e2e_engine(spark)
    res = eng.results.read(spark)
    ads = eng.ads.read(spark)
    landings = (res.filter(F.col("page_type") == "landing")
                .select(F.col("url").alias("landing_url"), "ad_id"))
    return (landings.join(
        ads.select("ad_id", F.col("url").alias("ad_page_url"),
                   F.col("ad_index").cast("long").alias("ad_index")),
        "ad_id")
        .select("landing_url",
                F.col("ad_id").cast("string").alias("ad_id"),
                "ad_page_url", "ad_index")
        .orderBy("landing_url"))


J4_LANDING_LINEAGE_SQL = f"""
SELECT t.url AS landing_url, CAST(t.ad_id AS VARCHAR) AS ad_id,
       a.url AS ad_page_url, a.ad_index
FROM read_parquet('{_P["trace"]}') t
JOIN read_parquet('{_P["ads"]}') a ON a.ad_id = t.ad_id
WHERE t.page_type = 'landing' AND t.reload = 0
ORDER BY landing_url
"""


def crawl_meta_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1-shaped metadata-dimension join (adscraper.sql:3-27 job/crawl
    tables, README.md:305-307): the engine's own crawl_meta completion
    event joined with its results row count."""
    eng = _e2e_engine(spark)
    meta = eng.crawl_meta.read(spark)
    final = (meta.filter(F.col("event").isin("completed", "horizon"))
             .select("crawl_name", F.col("event").alias("final_event")))
    counts = eng.results.read(spark).agg(
        F.count("*").alias("n_result_rows"))
    # 1-row aggregate side: broadcast hint for consistency with every
    # other 1-row crossJoin site (common.with_global_agg) — the plan
    # becomes a BroadcastNestedLoopJoin instead of a cartesian product.
    return final.crossJoin(F.broadcast(counts))


CRAWL_META_JOIN_SQL = f"""
SELECT crawl_name, final_event, n_result_rows
FROM read_parquet('{_P["crawl_meta"]}')
"""


def extraction_udf_demo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The vectorized extraction surface (U1-U10) over the corpus html —
    per-url text/link/ad/rss counts recomputed by the Arrow UDF; oracle =
    the pure-Python extractor's precomputed table (byte-identical text is
    part of the hash compare)."""
    from ..extraction.udfs import extract_pages

    p = ensure_oracle_artifacts()
    pages = spark.read.parquet(p["pages"]).select("url", "html")
    par = spark.sparkContext.defaultParallelism
    out = extract_pages(pages.repartition(par, "url"))
    return (out.select(
        "url", "text",
        F.size("links").cast("long").alias("n_links"),
        F.col("n_ads").cast("long").alias("n_ads"), "readerable",
        F.size("rss_urls").cast("long").alias("n_rss"))
        .orderBy("url"))


EXTRACTION_UDF_DEMO_SQL = f"""
SELECT url, text, n_links, n_ads, readerable, n_rss
FROM read_parquet('{_P["extract"]}')
ORDER BY url
"""


def find_articles_demo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SubpageExplorer findArticle analog (find-page.ts:69-163): per
    source page, the first same-host candidate in seeded-md5 order (≤20
    guesses) whose page is probably readerable."""
    from ..analysis import find_articles

    p = ensure_oracle_artifacts()
    src_df = spark.createDataFrame([(u,) for u in find_sources()],
                                   "url string")
    return (find_articles(spark, p["pages"], src_df, seed=FIND_SEED)
            .select("src_url", "found_url",
                    F.col("guess_rank").cast("long").alias("guess_rank"))
            .orderBy("src_url"))


def _find_articles_sql() -> str:
    srcs = ", ".join(f"'{u}'" for u in find_sources())
    return f"""
WITH cand AS (
  SELECT DISTINCT src_url, link
  FROM read_parquet('{_P["links"]}')
  WHERE src_url IN ({srcs}) AND link_host = src_host AND link <> src_url
),
ranked AS (
  SELECT src_url, link,
         row_number() OVER (PARTITION BY src_url
                            ORDER BY md5('{FIND_SEED}|' || link), link)
           AS guess_rank
  FROM cand
),
hits AS (
  SELECT r.src_url, r.link, r.guess_rank
  FROM ranked r JOIN read_parquet('{_P["extract"]}') e ON e.url = r.link
  WHERE r.guess_rank <= 20 AND e.readerable
)
SELECT src_url, link AS found_url, CAST(guess_rank AS BIGINT) AS guess_rank
FROM (SELECT *, row_number() OVER (PARTITION BY src_url
                                   ORDER BY guess_rank) AS rn FROM hits)
WHERE rn = 1 ORDER BY src_url
"""


def rss_first_article_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S7/W3: feed discovery → corpus-join fetch → XML parse →
    items[0] (get-rss-article.ts:40-53), first working feed per page."""
    from ..analysis import rss_first_article

    p = ensure_oracle_artifacts()
    src_df = spark.createDataFrame([(u,) for u in find_sources()],
                                   "url string")
    return (rss_first_article(spark, p["pages"], src_df)
            .orderBy("src_url"))


def _rss_first_article_sql() -> str:
    srcs = ", ".join(f"'{u}'" for u in find_sources())
    return f"""
WITH f AS (
  SELECT r.src_url, r.pos, r.rss_url AS feed_url,
         fe.first_article_url AS article_url
  FROM read_parquet('{_P["rss"]}') r
  JOIN read_parquet('{_P["feeds"]}') fe ON fe.feed_url = r.rss_url
  WHERE r.src_url IN ({srcs}) AND fe.first_article_url IS NOT NULL
)
SELECT src_url, feed_url, article_url
FROM (SELECT *, row_number() OVER (PARTITION BY src_url
                                   ORDER BY pos, feed_url) AS rn FROM f)
WHERE rn = 1 ORDER BY src_url
"""


def find_articles_rss_first_q(spark: SparkSession,
                              sf_dir: str) -> DataFrame:
    """The reference's full findArticle order: RSS short-circuit, guess
    path as fallback (find-page.ts:98-121 + getRssArticle)."""
    from ..analysis import find_articles_rss_first

    p = ensure_oracle_artifacts()
    src_df = spark.createDataFrame([(u,) for u in find_sources()],
                                   "url string")
    return find_articles_rss_first(spark, p["pages"], src_df,
                                   seed=FIND_SEED)


def _find_articles_rss_first_sql() -> str:
    srcs = ", ".join(f"'{u}'" for u in find_sources())
    return f"""
WITH cand AS (
  SELECT DISTINCT src_url, link
  FROM read_parquet('{_P["links"]}')
  WHERE src_url IN ({srcs}) AND link_host = src_host AND link <> src_url
),
ranked AS (
  SELECT src_url, link,
         row_number() OVER (PARTITION BY src_url
                            ORDER BY md5('{FIND_SEED}|' || link), link)
           AS guess_rank
  FROM cand
),
hits AS (
  SELECT r.src_url, r.link, r.guess_rank
  FROM ranked r JOIN read_parquet('{_P["extract"]}') e ON e.url = r.link
  WHERE r.guess_rank <= 20 AND e.readerable
),
guess AS (
  SELECT src_url, link AS found_url
  FROM (SELECT *, row_number() OVER (PARTITION BY src_url
                                     ORDER BY guess_rank) AS rn FROM hits)
  WHERE rn = 1
),
rssf AS (
  SELECT src_url, article_url AS found_url
  FROM (SELECT r.src_url, r.pos, r.rss_url,
               fe.first_article_url AS article_url,
               row_number() OVER (PARTITION BY r.src_url
                                  ORDER BY r.pos, r.rss_url) AS rn
        FROM read_parquet('{_P["rss"]}') r
        JOIN read_parquet('{_P["feeds"]}') fe ON fe.feed_url = r.rss_url
        WHERE r.src_url IN ({srcs})
          AND fe.first_article_url IS NOT NULL)
  WHERE rn = 1
)
SELECT src_url, found_url, 'rss' AS via FROM rssf
UNION ALL
SELECT g.src_url, g.found_url, 'guess' AS via FROM guess g
WHERE g.src_url NOT IN (SELECT src_url FROM rssf)
ORDER BY src_url
"""


def j3_ads_per_page(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3: ads merged to their parent page (README.md:320 pandas-merge
    analog) — UDF-extracted ads exploded to rows, equi-joined back to
    page metadata."""
    from ..extraction.udfs import extract_pages

    p = ensure_oracle_artifacts()
    pages = spark.read.parquet(p["pages"])
    par = spark.sparkContext.defaultParallelism
    ex = extract_pages(pages.select("url", "html").repartition(par, "url"))
    ads = (ex.select("url", F.posexplode("ads").alias("ad_index", "ad"))
           .select("url", F.col("ad_index").cast("long").alias("ad_index"),
                   F.col("ad.selector").alias("selector"),
                   F.col("ad.platform").alias("platform")))
    return (ads.join(pages.select("url", "lang"), "url")
            .select("url", "ad_index", "selector", "platform", "lang")
            .orderBy("url", "ad_index"))


J3_ADS_PER_PAGE_SQL = f"""
SELECT a.url, a.ad_index, a.selector, a.platform, p.lang
FROM read_parquet('{_P["ads"]}') a
JOIN read_parquet('{_P["pages"]}') p USING (url)
ORDER BY a.url, a.ad_index
"""


def j2_ad_domain_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2/A1: ad-domain popularity (README.md:323-329 value_counts) —
    every external URL harvested from every detected ad, grouped by
    target host."""
    from ..extraction.udfs import extract_pages

    p = ensure_oracle_artifacts()
    pages = spark.read.parquet(p["pages"]).select("url", "html")
    par = spark.sparkContext.defaultParallelism
    ex = extract_pages(pages.repartition(par, "url"))
    # ONE generator over the concatenated URL arrays: the previous
    # 4-way unionAll duplicated the extract_pages subtree per column,
    # running the Arrow extraction UDF four times per pass (only
    # exchanges are reused across union branches, and the UDF sits
    # above the exchange).
    urls = (ex.select(F.explode("ads").alias("ad"))
            .select(F.explode(F.concat(*[
                F.coalesce(F.col(f"ad.{c}"),
                           F.array().cast("array<string>"))
                for c in ("anchor_hrefs", "iframe_srcs",
                          "script_srcs", "img_srcs")]))
                .alias("target_url")))
    return (urls
            .select(F.lower(F.parse_url("target_url", F.lit("HOST")))
                    .alias("ad_domain"))
            .groupBy("ad_domain").agg(F.count("*").alias("n"))
            .orderBy(F.desc("n"), "ad_domain"))


J2_AD_DOMAIN_COUNTS_SQL = f"""
SELECT target_host AS ad_domain, CAST(count(*) AS BIGINT) AS n
FROM read_parquet('{_P["ad_urls"]}')
GROUP BY 1 ORDER BY n DESC, ad_domain
"""


QUERIES = {
    "crawl_engine_e2e": crawl_engine_e2e,
    "page_type_reload": page_type_reload,
    "j4_landing_lineage": j4_landing_lineage,
    "crawl_meta_join": crawl_meta_join,
    "extraction_udf_demo": extraction_udf_demo,
    "find_articles_demo": find_articles_demo,
    "rss_first_article": rss_first_article_q,
    # find_articles_rss_first is intentionally NOT exported: the driver's
    # correctness harness checks at most 50 queries, and this entry is the
    # composition of two already-oracled rows (rss_first_article = the RSS
    # short-circuit, find_articles_demo = the guess fallback).  It stays
    # parity-tested locally in tests/test_consolidated_queries.py.
    "j3_ads_per_page": j3_ads_per_page,
    "j2_ad_domain_counts": j2_ad_domain_counts,
}
ORACLES = {
    "crawl_engine_e2e": CRAWL_ENGINE_E2E_SQL,
    "page_type_reload": PAGE_TYPE_RELOAD_SQL,
    "j4_landing_lineage": J4_LANDING_LINEAGE_SQL,
    "crawl_meta_join": CRAWL_META_JOIN_SQL,
    "extraction_udf_demo": EXTRACTION_UDF_DEMO_SQL,
    "find_articles_demo": _find_articles_sql(),
    "rss_first_article": _rss_first_article_sql(),
    "j3_ads_per_page": J3_ADS_PER_PAGE_SQL,
    "j2_ad_domain_counts": J2_AD_DOMAIN_COUNTS_SQL,
}
