"""Subpage-exploration analogs of the reference's SubpageExplorer
(crawler/src/pages/find-page.ts) — re-expressed as declarative dataflow.

Reference behavior: from a page, collect same-hostname links, drop
previously-guessed ones, optionally prefer keyword-matching links
(falling back to all when none match), then navigate candidates in
random order, up to 20 guesses, returning the FIRST candidate whose
fetched page meets a criterion (isProbablyReaderable for findArticle;
ads>0 for findPageWithAds).

Deterministic re-expression (SURVEY §2.6 L1): the random order becomes
``md5(seed|link)`` hex ranking (identical in Spark, DuckDB and Python —
so the operator is fully oracle-checkable); "up to 20 guesses" becomes
rank ≤ 20;
"first match" becomes min-rank among criterion-satisfying candidates
(W3). Candidates are "fetched" via the corpus join + extraction UDF —
one batch plan instead of per-page navigation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .corpus import GUESS_FEED_PATHS, GUESS_POS_BASE
from .extraction.core import HEALTH_KEYWORDS
from .extraction.udfs import extract_pages
from .urlnorm import spark_host_col

MAX_GUESSES = 20  # find-page.ts:121 (maxGuesses)


def _source_extract(spark: SparkSession, pages_path: str,
                    source_urls: DataFrame) -> DataFrame:
    """One extraction pass over the source pages — shared by the RSS
    and guess paths (both need columns of the same extract output)."""
    pages = spark.read.parquet(pages_path).select("url", "html")
    src = source_urls.join(pages, "url")
    par = spark.sparkContext.defaultParallelism
    return extract_pages(src.repartition(par, "url"))


def _candidate_links(spark: SparkSession, pages_path: str,
                     source_urls: DataFrame, seed: int,
                     ex: DataFrame | None = None) -> DataFrame:
    """(src_url, link, guess_rank): same-host links of each source page,
    deduplicated, ranked by the seeded hash (the Math.random stand-in).
    """
    if ex is None:
        ex = _source_extract(spark, pages_path, source_urls)
    links = (ex.select(F.col("url").alias("src_url"),
                       F.explode("links").alias("link"))
             .withColumn("src_host", spark_host_col(F.col("src_url")))
             .withColumn("link_host", spark_host_col(F.col("link")))
             .filter(F.col("link_host") == F.col("src_host"))    # F4
             .filter(F.col("link") != F.col("src_url"))
             .select("src_url", "link").distinct())              # F5
    w = Window.partitionBy("src_url").orderBy(
        guess_hash_col(seed), F.col("link"))
    return links.withColumn("guess_rank", F.row_number().over(w))


def guess_hash_col(seed: int):
    """Seeded candidate-order hash (L1). md5 hex so Spark, DuckDB and
    the pure-Python oracle rank identically."""
    return F.md5(F.concat_ws("|", F.lit(str(seed)), F.col("link")))


def guess_hash_py(seed: int, link: str) -> str:
    import hashlib

    return hashlib.md5(f"{seed}|{link}".encode("utf-8")).hexdigest()


def _first_match(cands: DataFrame, fetched_ok: DataFrame) -> DataFrame:
    """min-rank candidate per source whose fetched page met the
    criterion — rank ≤ MAX_GUESSES (find-page.ts guess budget)."""
    hits = (cands.filter(F.col("guess_rank") <= MAX_GUESSES)
            .join(fetched_ok, cands.link == fetched_ok.url)
            .select("src_url", "link", "guess_rank"))
    w = Window.partitionBy("src_url").orderBy("guess_rank")
    return (hits.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("src_url", F.col("link").alias("found_url"),
                    "guess_rank"))


def find_articles(spark: SparkSession, pages_path: str,
                  source_urls: DataFrame, seed: int = 42,
                  ex: DataFrame | None = None) -> DataFrame:
    """findArticle analog: first same-host candidate (seeded order, ≤20
    guesses) whose page is probably readerable (U8). RSS short-circuit:
    pages advertising an RSS feed are handled by the caller via the
    extraction ``rss_urls`` column (get-rss-article.ts path)."""
    cands = _candidate_links(spark, pages_path, source_urls, seed, ex=ex)
    pages = spark.read.parquet(pages_path).select("url", "html")
    cand_pages = (cands.select(F.col("link").alias("url")).distinct()
                  .join(pages, "url"))
    par = spark.sparkContext.defaultParallelism
    ex = extract_pages(cand_pages.repartition(par, "url"))
    readerable = ex.filter(F.col("readerable")).select("url")
    return _first_match(cands, readerable)


def rss_first_article(spark: SparkSession, pages_path: str,
                      source_urls: DataFrame,
                      ex: DataFrame | None = None) -> DataFrame:
    """S7/W3 end-to-end: discover each source page's RSS feed URLs (U9,
    in header-link order), fetch the feed bodies via the corpus join,
    parse feed XML in an Arrow batch, take item[0]
    (get-rss-article.ts:40-53), and keep the first feed per source that
    yields an article. Output: (src_url, feed_url, article_url)."""
    import pandas as pd

    pages = spark.read.parquet(pages_path).select("url", "html")
    if ex is None:
        ex = _source_extract(spark, pages_path, source_urls)
    feeds = (ex.select(F.col("url").alias("src_url"),
                       F.posexplode("rss_urls").alias("pos", "feed_url")))
    # guessRssFeed (get-rss-article.ts:57-75): origin + /feed,/feeds,
    # /rss, tried after the header feeds (pos offset). Guesses that
    # don't exist in the corpus simply miss the join — the reference's
    # parseURL throw. (The reference keeps the page's query string on
    # the guess URL; the corpus has none, so scheme://host+path is the
    # faithful reduction.) Candidates derive from the FETCHED sources,
    # not the raw seed list: the reference only calls getRssArticle on
    # a loaded page, and the oracle builder emits guess rows only for
    # corpus pages — a 404'd source URL must not resolve an article via
    # a guessed /feed on a live host. A semi-join against the (column-
    # pruned) pages scan gives the fetched set without re-running the
    # extraction stage a second time just for its url column.
    guesses = source_urls.join(pages.select("url"), "url", "semi").select(
        F.col("url").alias("src_url"),
        F.posexplode(F.array(*[F.lit(p) for p in GUESS_FEED_PATHS]))
        .alias("gpos", "gpath")).select(
        "src_url",
        (F.col("gpos") + F.lit(GUESS_POS_BASE)).cast("int").alias("pos"),
        F.concat(F.lower(F.parse_url("src_url", F.lit("PROTOCOL"))),
                 F.lit("://"),
                 spark_host_col(F.col("src_url")),
                 F.col("gpath")).alias("feed_url"))
    feeds = feeds.unionByName(guesses)
    fetched = feeds.join(pages.withColumnRenamed("url", "feed_url"),
                         "feed_url")

    def parse_first(batches):
        from .corpus import parse_feed_first
        for pdf in batches:
            yield pd.DataFrame({
                "src_url": pdf["src_url"],
                "pos": pdf["pos"],
                "feed_url": pdf["feed_url"],
                "article_url": [
                    parse_feed_first(bytes(h)) if h is not None else None
                    for h in pdf["html"]],
            })

    parsed = fetched.mapInPandas(
        parse_first, schema=("src_url string, pos int, feed_url string, "
                             "article_url string"))
    hits = parsed.filter(F.col("article_url").isNotNull())
    w = Window.partitionBy("src_url").orderBy("pos", "feed_url")
    return (hits.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("src_url", "feed_url", "article_url"))


def find_articles_rss_first(spark: SparkSession, pages_path: str,
                            source_urls: DataFrame,
                            seed: int = 42) -> DataFrame:
    """The reference's full findArticle order: RSS short-circuit first
    (getRssArticle), then the seeded guess path for sources without a
    working feed (find-page.ts:98-121). Output adds ``via`` ∈
    {rss, guess}."""
    # ONE extraction pass over the sources: the RSS path needs rss_urls
    # and the guess path needs links — both are columns of the same
    # extract output, so extracting per-path would run the dominant
    # Arrow parse/selector stage twice.
    ex = _source_extract(spark, pages_path, source_urls).cache()
    try:
        rss = rss_first_article(spark, pages_path, source_urls, ex=ex)
        guess = find_articles(spark, pages_path, source_urls, seed=seed,
                              ex=ex)
        rss_part = rss.select("src_url",
                              F.col("article_url").alias("found_url"),
                              F.lit("rss").alias("via"))
        guess_part = (guess
                      .join(rss.select("src_url"), "src_url", "left_anti")
                      .select("src_url", "found_url",
                              F.lit("guess").alias("via")))
        # Materialize (tiny: one row per source) so the shared
        # extraction cache can be released here instead of pinning
        # executor storage for the life of the application — callers
        # (bench, parity suite) invoke this repeatedly across corpora.
        out = (rss_part.unionByName(guess_part).orderBy("src_url")
               .localCheckpoint(eager=True))
    finally:
        ex.unpersist()
    return out


def find_pages_with_ads(spark: SparkSession, pages_path: str,
                        source_urls: DataFrame, seed: int = 42,
                        health_priority: bool = False) -> DataFrame:
    """findPageWithAds / findHealthRelatedPagesWithAds analog: first
    candidate whose page contains ≥1 detected ad (U2). With
    ``health_priority``, keyword-matching links are preferred but the
    full set is used when none match (the optional-criterion fallback,
    find-page.ts:52-62) — per source page."""
    cands = _candidate_links(spark, pages_path, source_urls, seed)
    if health_priority:
        kw = None
        for k in HEALTH_KEYWORDS:
            c = F.lower(F.col("link")).contains(k)
            kw = c if kw is None else (kw | c)
        cands = cands.withColumn("kw", kw)
        any_kw = (cands.groupBy("src_url")
                  .agg(F.max("kw").alias("has_kw")))
        cands = (cands.join(any_kw, "src_url")
                 .filter(~F.col("has_kw") | F.col("kw"))
                 .drop("kw", "has_kw"))
        # re-rank within the filtered candidate set
        w = Window.partitionBy("src_url").orderBy("guess_rank")
        cands = (cands.withColumn("guess_rank2", F.row_number().over(w))
                 .drop("guess_rank")
                 .withColumnRenamed("guess_rank2", "guess_rank"))
    pages = spark.read.parquet(pages_path).select("url", "html")
    cand_pages = (cands.select(F.col("link").alias("url")).distinct()
                  .join(pages, "url"))
    par = spark.sparkContext.defaultParallelism
    ex = extract_pages(cand_pages.repartition(par, "url"))
    with_ads = ex.filter(F.col("n_ads") > 0).select("url")
    return _first_match(cands, with_ads)