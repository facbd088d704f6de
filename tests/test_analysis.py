"""find_articles / find_pages_with_ads vs a pure-Python oracle applying
the same deterministic semantics (seeded rank, ≤20 guesses, first
match)."""

import pytest

from adscraper_spark.analysis import (
    MAX_GUESSES, find_articles, find_pages_with_ads,
)
from adscraper_spark.corpus import CorpusSpec, pages_rows, write_corpus_parquet
from adscraper_spark.extraction.core import extract_page
from adscraper_spark.urlnorm import url_host


@pytest.fixture(scope="module")
def corpus2(tmp_path_factory):
    spec = CorpusSpec(n_pages=250, n_hosts=8, seed=9)
    out = str(tmp_path_factory.mktemp("ac"))
    paths = write_corpus_parquet(spec, out)
    rows = {r["url"]: r["html"] for r in pages_rows(spec)}
    return spec, paths, rows


def _oracle(rows, sources, criterion, seed, spark):
    """Same semantics, sequential: per source, same-host distinct links
    ranked by md5(seed|link); first of ≤20 whose page satisfies the
    criterion. Hash computed with hashlib — fully independent of Spark."""
    from adscraper_spark.analysis import guess_hash_py

    out = {}
    for src in sources:
        ex = extract_page(src, rows[src])
        cands = sorted({
            ln for ln in ex.links
            if url_host(ln) == url_host(src) and ln != src})
        if not cands:
            continue
        ranked = sorted(cands, key=lambda u: (guess_hash_py(seed, u), u))
        for rank, ln in enumerate(ranked[:MAX_GUESSES], start=1):
            page = rows.get(ln)
            if page is None:
                continue
            if criterion(extract_page(ln, page)):
                out[src] = (ln, rank)
                break
    return out


def test_find_articles_matches_oracle(spark, corpus2):
    spec, paths, rows = corpus2
    sources = [spec.page_url(0, j) for j in range(12)]
    src_df = spark.createDataFrame([(u,) for u in sources], "url string")
    got = {r["src_url"]: (r["found_url"], r["guess_rank"])
           for r in find_articles(spark, paths["pages"], src_df,
                                  seed=7).collect()}
    want = _oracle(rows, sources, lambda e: e.readerable, 7, spark)
    assert got == want
    assert len(want) > 0  # the corpus actually produces article hits


def test_find_pages_with_ads_matches_oracle(spark, corpus2):
    spec, paths, rows = corpus2
    sources = [spec.page_url(0, j) for j in range(12)]
    src_df = spark.createDataFrame([(u,) for u in sources], "url string")
    got = {r["src_url"]: (r["found_url"], r["guess_rank"])
           for r in find_pages_with_ads(spark, paths["pages"], src_df,
                                        seed=7).collect()}
    want = _oracle(rows, sources, lambda e: len(e.ads) > 0, 7, spark)
    assert got == want
    assert len(want) > 0


def test_health_priority_fallback_runs(spark, corpus2):
    spec, paths, _rows = corpus2
    sources = [spec.page_url(0, j) for j in range(6)]
    src_df = spark.createDataFrame([(u,) for u in sources], "url string")
    # corpus paths include /health/ sections, so both the keyword branch
    # and the fallback branch execute across sources
    res = find_pages_with_ads(spark, paths["pages"], src_df, seed=7,
                              health_priority=True).collect()
    assert isinstance(res, list)