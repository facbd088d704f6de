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


# ---------------------------------------------------------------------------
# S5: per-worker task binding (k8s indexed-job analog)
# ---------------------------------------------------------------------------

class TaskSpecError(ValueError):
    """Reference `ExitCodes.INPUT_ERROR` analog: the per-worker task
    spec is missing or fails validation
    (k8s-indexed-job-worker.ts:78-98)."""


_REQUIRED_SPEC_KEYS = ("crawlName", "resumeIfAble", "outputDir",
                       "crawlOptions", "scrapeOptions")
_SEED_SOURCE_KEYS = ("url", "urlList", "adUrlList")


def read_indexed_job_task(job_dir: str, index: int) -> dict:
    """S5: each worker of an indexed job binds to exactly one task spec,
    ``crawl_inputs/crawl_input_${JOB_COMPLETION_INDEX}.json``, and
    validates it before starting (k8s-indexed-job-worker.ts:78-98 reads
    the file by index; validateCrawlSpec:55-67 schema-gates it). In the
    Spark deployment the "index" is whatever identifies the submitted
    job (one spark-submit per task spec); the binding and the
    fail-fast validation semantics are the same:

    - missing file  → TaskSpecError (reference: INPUT_ERROR exit)
    - missing required field → TaskSpecError listing every violation
      (validator collects all errors, worker logs them joined)
    - exactly one of url / urlList / adUrlList must be present (the
      crawler's seed-source choice, crawler.ts:138-185)
    """
    import json as _json
    import os as _os

    path = _os.path.join(job_dir, "crawl_inputs",
                         f"crawl_input_{index}.json")
    if not _os.path.exists(path):
        raise TaskSpecError(f"Could not find crawl file at {path}")
    with open(path) as f:
        spec = _json.load(f)
    errors = [f"missing required field: {k}"
              for k in _REQUIRED_SPEC_KEYS if k not in spec]
    sources = [k for k in _SEED_SOURCE_KEYS if spec.get(k)]
    if len(sources) != 1:
        errors.append(
            f"exactly one of {_SEED_SOURCE_KEYS} required, got {sources}")
    if errors:
        raise TaskSpecError("Crawl flags did not pass validation: "
                            + "; ".join(errors))
    spec["_task_index"] = index
    spec["_seed_source"] = sources[0]
    return spec
