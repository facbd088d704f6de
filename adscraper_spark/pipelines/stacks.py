"""X10 stack-trace URL mining + T4 per-element URL-set merge.

Reference semantics (`crawler/src/ads/dom-monitor.ts:100-140`, the
DOM-mutation monitor — dead code in the reference, re-expressed here
as first-class relational operators):

- X10 `trackDOMUpdate` URL extraction: drop the stack head, strip the
  7-char ``'    at '`` prefix, keep lines containing http(s), take the
  parenthesized URL when the line has ``(...)`` (only if it starts
  with http) else the line itself when it starts with http, cut the
  ``:line:col`` suffix by keeping the first two ``':'``-separated
  segments, and drop first-party script URLs (hostname equal to the
  page's hostname).
- T4 per-handle merge: each mutation event's URL set is unioned into
  the element's accumulated set
  (``new Set([...prevUrls, ...urlSet])``, dom-monitor.ts:134-140) —
  here a groupBy + collect_set.

Everything is JVM-side column algebra (split/explode/regexp), no UDF;
at scale this is one explode plus one groupBy shuffle on (element,
url) rows — never on the stack bodies.

The ``queries()`` entries synthesize deterministic mutation events
from the ``documents`` table (two events per element, mixed first- and
third-party frames plus native/no-URL frames) identically in Spark and
DuckDB, so the extraction itself is oracle-checked value-by-value.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .common import spread

_PARENS_RE = r"\(([^()]*)\)"
_HOST_RE = r"^https?://([^/:]+)"


def extract_stack_urls(df: DataFrame,
                       id_col: str = "element_id",
                       stack_col: str = "stack",
                       page_url_col: str = "page_url") -> DataFrame:
    """X10: (element, stack, page_url) rows → distinct third-party
    script URLs per element (dom-monitor.ts:100-126, exact per-line
    semantics)."""
    lines = F.split(F.col(stack_col), "\n")
    body = F.slice(lines, 2, F.greatest(F.size(lines) - 1, F.lit(0)))
    per_line = (df.select(F.col(id_col).alias("element_id"),
                          F.col(page_url_col).alias("page_url"),
                          F.explode(body).alias("line"))
                .withColumn("line", F.expr("substring(line, 8)"))
                .filter(F.col("line").contains("http://")
                        | F.col("line").contains("https://")))
    paren = F.regexp_extract("line", _PARENS_RE, 1)
    url_raw = (F.when(F.col("line").contains("(")
                      & F.col("line").contains(")"),
                      F.when(paren.startswith("http"), paren))
               .when(F.col("line").startswith("http"), F.col("line")))
    out = (per_line
           .withColumn("url_raw", url_raw)
           .filter(F.col("url_raw").isNotNull())
           # strip :line:col — keep scheme + first path segment up to
           # the next ':' (split(':').slice(0,2).join(':'))
           .withColumn("url", F.concat_ws(
               ":", F.slice(F.split("url_raw", ":"), 1, 2)))
           .withColumn("url_host",
                       F.lower(F.regexp_extract("url", _HOST_RE, 1)))
           .withColumn("page_host",
                       F.lower(F.regexp_extract("page_url", _HOST_RE, 1)))
           .filter(F.col("url_host") != F.col("page_host"))  # 1st-party
           .select("element_id", "url")
           .distinct())
    return out


def merge_element_urls(extracted: DataFrame) -> DataFrame:
    """T4: union each element's URL sets across mutation events
    (dom-monitor.ts:134-140). Output is deterministic: sorted set
    joined with '|' plus its size."""
    return (extracted.groupBy("element_id")
            .agg(F.array_sort(F.collect_set("url")).alias("urls"))
            .select("element_id",
                    F.size("urls").alias("n_urls"),
                    F.array_join("urls", "|").alias("urls_joined")))


# ---------------------------------------------------------------------------
# deterministic synthetic mutation events over `documents`
# (identical construction in Spark and DuckDB so the oracle checks the
#  extraction, not the generator)
# ---------------------------------------------------------------------------

def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    # spread: the per-line regex extraction over the synthesized stacks
    # otherwise runs in the testdata file's 1-2 scan tasks
    # (common.spread — identity on any real multi-split corpus)
    doc = spread(spark.read.parquet(f"{sf_dir}/documents.parquet"),
                 "doc_id")
    base = doc.select(
        "doc_id",
        F.concat(F.lit("el-"), (F.col("doc_id") % 50).cast("string"))
        .alias("element_id"),
        F.concat(F.lit("https://host-"),
                 (F.col("doc_id") % 5).cast("string"),
                 F.lit(".test/page/"), F.col("doc_id").cast("string"))
        .alias("page_url"),
        F.explode(F.array(F.lit(0), F.lit(1))).alias("event_id"))
    stack = F.concat(
        F.lit("Error\n"),
        F.lit("    at https://cdn-"),
        ((F.col("doc_id") + F.col("event_id")) % 7).cast("string"),
        F.lit(".test/lib.js:10:3\n"),
        # first-party frame — must be filtered out
        F.lit("    at fn (https://host-"),
        (F.col("doc_id") % 5).cast("string"),
        F.lit(".test/app.js:5:1)\n"),
        F.lit("    at track (https://tracker-"),
        (F.col("doc_id") % 3).cast("string"),
        F.lit(".test/t.js:77:12)\n"),
        F.lit("    at notaurl (native)\n"),
        F.lit("    at <anonymous>"))
    return base.select("element_id", "page_url",
                       stack.alias("stack"))


_EVENTS_SQL = """
  SELECT 'el-' || (doc_id % 50) AS element_id,
         'https://host-' || (doc_id % 5) || '.test/page/' || doc_id
           AS page_url,
         'Error' || chr(10) ||
         '    at https://cdn-' || ((doc_id + e.event_id) % 7)
           || '.test/lib.js:10:3' || chr(10) ||
         '    at fn (https://host-' || (doc_id % 5)
           || '.test/app.js:5:1)' || chr(10) ||
         '    at track (https://tracker-' || (doc_id % 3)
           || '.test/t.js:77:12)' || chr(10) ||
         '    at notaurl (native)' || chr(10) ||
         '    at <anonymous>' AS stack
  FROM documents, (VALUES (0), (1)) e(event_id)
"""

_EXTRACT_SQL = f"""
WITH ev AS ({_EVENTS_SQL}),
ln0 AS (
  SELECT element_id, page_url,
         unnest(string_split(stack, chr(10))[2:]) AS line
  FROM ev),
ln AS (
  SELECT element_id, page_url, substring(line, 8) AS line FROM ln0),
hit AS (
  SELECT element_id, page_url, line,
         CASE WHEN line LIKE '%(%' AND line LIKE '%)%' THEN
                CASE WHEN regexp_extract(line, '\\(([^()]*)\\)', 1)
                          LIKE 'http%'
                     THEN regexp_extract(line, '\\(([^()]*)\\)', 1) END
              WHEN line LIKE 'http%' THEN line END AS url_raw
  FROM ln
  WHERE line LIKE '%http://%' OR line LIKE '%https://%'),
u AS (
  SELECT element_id, page_url,
         array_to_string(string_split(url_raw, ':')[1:2], ':') AS url
  FROM hit WHERE url_raw IS NOT NULL),
x AS (
  SELECT DISTINCT element_id, url FROM u
  WHERE lower(regexp_extract(url, '^https?://([^/:]+)', 1))
        <> lower(regexp_extract(page_url, '^https?://([^/:]+)', 1)))
"""


def x10_stack_trace_urls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X10 query: mine third-party script URLs from synthetic
    mutation-event stacks."""
    return (extract_stack_urls(_events(spark, sf_dir))
            .orderBy("element_id", "url"))


X10_SQL = _EXTRACT_SQL + "SELECT * FROM x ORDER BY element_id, url"


def t4_url_set_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T4 query: per-element URL-set union across mutation events."""
    return (merge_element_urls(extract_stack_urls(_events(spark, sf_dir)))
            .orderBy("element_id"))


T4_SQL = _EXTRACT_SQL + """
SELECT element_id,
       len(list_sort(list(DISTINCT url))) AS n_urls,
       array_to_string(list_sort(list(DISTINCT url)), '|') AS urls_joined
FROM x GROUP BY element_id ORDER BY element_id
"""


QUERIES = {
    "x10_stack_trace_urls": x10_stack_trace_urls,
    "t4_url_set_merge": t4_url_set_merge,
}

ORACLES = {
    "x10_stack_trace_urls": X10_SQL,
    "t4_url_set_merge": T4_SQL,
}
