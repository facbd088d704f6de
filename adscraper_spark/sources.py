"""Crawl-list sources (SURVEY.md §2.1 S1-S5).

Reference semantics:
- S1 text crawl list: one URL per line, blank lines dropped, order
  preserved (crawler/src/crawler.ts:146-156; F1 empty-line filter).
- S2 ad-URL CSV: header row must contain ``url`` and ``ad_id``
  (crawler/src/crawler.ts:157-185).
- S3 single URL: 1-row list (crawler/src/crawler.ts:138-145).

Readers return driver-side seed lists ``[(seq, url[, ad_id])]`` — the
crawl list is the one input that is legitimately driver-sized in the
reference design (it is the job spec, not the data); the 10^10-URL case
enters through frontier *admissions*, not the seed file. For a truly
huge seed list, ``seeds_df_*`` variants return DataFrames with the same
columns and the engine bootstraps from them distributively.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def read_crawl_list_text(spark: SparkSession, path: str) -> list[tuple[int, str]]:
    """S1: ordered text crawl list; blank lines dropped but order kept
    (crawler.ts:146-156)."""
    df = seeds_df_from_text(spark, path)
    return [(r["seq"], r["url"]) for r in df.orderBy("seq").collect()]


def seeds_df_from_text(spark: SparkSession, path: str) -> DataFrame:
    """DataFrame variant: seq = original line order (zero-based over
    non-blank lines, matching the reference's array index after filter).
    """
    raw = spark.read.text(path)
    w = Window.orderBy(F.monotonically_increasing_id())
    return (raw.withColumn("line_no", F.row_number().over(w))
            .withColumn("url", F.trim("value"))
            .filter(F.length("url") > 0)
            .withColumn("seq",
                        F.row_number().over(Window.orderBy("line_no")) - 1)
            .select("seq", "url"))


def read_ad_crawl_list_csv(spark: SparkSession, path: str
                           ) -> list[tuple[int, str, int]]:
    """S2: CSV with header; ``url`` and ``ad_id`` columns required
    (crawler.ts:166-180 aborts on missing columns)."""
    df = spark.read.option("header", True).csv(path)
    missing = {"url", "ad_id"} - set(df.columns)
    if missing:
        raise ValueError(
            f"ad crawl list missing columns {sorted(missing)} "
            "(reference: crawler.ts:166-180)")
    w = Window.orderBy(F.monotonically_increasing_id())
    rows = (df.withColumn("seq", F.row_number().over(w) - 1)
            .select("seq", "url", F.col("ad_id").cast("long").alias("ad_id"))
            .collect())
    return [(r["seq"], r["url"], r["ad_id"]) for r in rows]


def single_url_seed(url: str, ad_id: int | None = None
                    ) -> list[tuple[int, str, int | None]]:
    """S3: one CLI-provided URL (crawler.ts:138-145)."""
    return [(0, url, ad_id)]
