"""Vectorized Arrow UDF wrappers around the extraction core.

All heavy per-document work runs in ``mapInPandas`` (Arrow batches, no
per-row Python UDF calls crossing the JVM boundary row-at-a-time, per
BASELINE.json input_hint). The UDF body calls the SAME ``extract_page``
the pytest oracle calls — byte-identity tests then cover exactly the
Arrow/serialization delta (SURVEY.md §5.2.1).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

from ..hashing import ad_id_for
from .core import extract_page

AD_STRUCT = T.StructType([
    # deterministic ad id (hashing.ad_id_for) — the adscraper.sql ad
    # serial analog; landing admissions carry it as referrer_ad (J4)
    T.StructField("ad_id", T.LongType()),
    T.StructField("html", T.StringType()),
    T.StructField("selector", T.StringType()),
    T.StructField("platform", T.StringType()),
    T.StructField("chumbox_parts", T.ArrayType(T.StringType())),
    T.StructField("anchor_hrefs", T.ArrayType(T.StringType())),
    T.StructField("iframe_srcs", T.ArrayType(T.StringType())),
    T.StructField("script_srcs", T.ArrayType(T.StringType())),
    T.StructField("img_srcs", T.ArrayType(T.StringType())),
])

IFRAME_STRUCT = T.StructType([
    T.StructField("ad_index", T.IntegerType()),
    T.StructField("parent_index", T.IntegerType()),
    T.StructField("url", T.StringType()),
    T.StructField("html", T.StringType()),
    T.StructField("textcontent", T.StringType()),
])

EXTRACT_SCHEMA = T.StructType([
    T.StructField("url", T.StringType()),
    T.StructField("text", T.StringType()),
    T.StructField("links", T.ArrayType(T.StringType())),
    T.StructField("ads", T.ArrayType(AD_STRUCT)),
    T.StructField("iframes", T.ArrayType(IFRAME_STRUCT)),
    T.StructField("n_ads", T.IntegerType()),
    T.StructField("readerable", T.BooleanType()),
    T.StructField("readability_score", T.DoubleType()),
    T.StructField("rss_urls", T.ArrayType(T.StringType())),
    T.StructField("health_related", T.BooleanType()),
])


def _extract_row(url: str, html) -> dict:
    if html is None:
        html = b""
    if isinstance(html, str):
        html = html.encode("utf-8")
    res = extract_page(url, bytes(html))
    return {
        "url": url,
        "text": res.text,
        "links": res.links,
        "ads": [
            {
                "ad_id": ad_id_for(url, i),
                "html": a.html, "selector": a.selector, "platform": a.platform,
                "chumbox_parts": a.chumbox_parts,
                "anchor_hrefs": a.anchor_hrefs, "iframe_srcs": a.iframe_srcs,
                "script_srcs": a.script_srcs, "img_srcs": a.img_srcs,
            }
            for i, a in enumerate(res.ads)
        ],
        "iframes": [
            {
                "ad_index": f.ad_index, "parent_index": f.parent_index,
                "url": f.url, "html": f.html, "textcontent": f.textcontent,
            }
            for f in res.iframes
        ],
        "n_ads": len(res.ads),
        "readerable": res.readerable,
        "readability_score": res.readability_score,
        "rss_urls": res.rss_urls,
        "health_related": res.health_related,
    }


def _extract_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        rows = [
            _extract_row(u, h)
            for u, h in zip(pdf["url"].tolist(), pdf["html"].tolist())
        ]
        yield pd.DataFrame(
            rows, columns=[f.name for f in EXTRACT_SCHEMA.fields])


def extract_pages(df: DataFrame) -> DataFrame:
    """(url, html [, ...]) → full extraction frame. One Arrow round-trip;
    downstream consumers select/explode the struct columns (links for the
    frontier, ads/iframes for the results tables, text for the corpus).
    """
    return df.select("url", "html").mapInPandas(
        _extract_batches, schema=EXTRACT_SCHEMA)
