"""S1-S3 sources, Z5 retry budget, and J4 ad-lineage admission."""

import pytest

from adscraper_spark.config import CrawlConfig
from adscraper_spark.corpus import (
    CorpusSpec, gen_robots_txt, gen_seeds, pages_rows, write_corpus_parquet,
)
from adscraper_spark.engine import CrawlEngine
from adscraper_spark.simulator import simulate_crawl
from adscraper_spark.sources import (
    read_ad_crawl_list_csv, read_crawl_list_text, single_url_seed,
)


@pytest.fixture(scope="module")
def small(tmp_path_factory):
    spec = CorpusSpec(n_pages=100, n_hosts=6, seed=11)
    out = str(tmp_path_factory.mktemp("c"))
    paths = write_corpus_parquet(spec, out)
    return spec, paths


def test_read_crawl_list_text(spark, tmp_path):
    p = tmp_path / "list.txt"
    p.write_text("https://a.test/1\n\n  \nhttps://a.test/2\nhttps://a.test/3\n")
    seeds = read_crawl_list_text(spark, str(p))
    assert seeds == [(0, "https://a.test/1"), (1, "https://a.test/2"),
                     (2, "https://a.test/3")]


def test_read_ad_crawl_list_csv(spark, tmp_path):
    p = tmp_path / "ads.csv"
    p.write_text("url,ad_id\nhttps://a.test/l1,101\nhttps://a.test/l2,102\n")
    seeds = read_ad_crawl_list_csv(spark, str(p))
    assert seeds == [(0, "https://a.test/l1", 101),
                     (1, "https://a.test/l2", 102)]


def test_ad_csv_missing_column_rejected(spark, tmp_path):
    p = tmp_path / "bad.csv"
    p.write_text("link,id\nx,1\n")
    with pytest.raises(ValueError, match="ad_id"):
        read_ad_crawl_list_csv(spark, str(p))


def test_single_url_seed():
    assert single_url_seed("https://a.test/x", 7) == [(0, "https://a.test/x", 7)]


def test_retry_budget_matches_simulator(spark, small, tmp_path_factory):
    """An unfetchable URL is retried max_retries times, consuming budget
    each wave, then lands in 'error' — identically in engine and
    simulator."""
    spec, paths = small
    cfg = CrawlConfig(wave_seconds=10, default_budget=2, max_waves=6,
                      max_depth=1, max_retries=3)
    seeds = [(i, u) for i, u in enumerate(gen_seeds(spec, n_seeds=5))]
    robots = [(spec.host_name(h), gen_robots_txt(spec, h))
              for h in range(spec.n_hosts)
              if gen_robots_txt(spec, h) is not None]
    sim = simulate_crawl({r["url"]: r["html"] for r in pages_rows(spec)},
                         seeds, robots, cfg)
    work = str(tmp_path_factory.mktemp("wretry"))
    eng = CrawlEngine(spark, paths["pages"], paths["robots"], work, cfg)
    eng.bootstrap(seeds)
    eng.run()
    order = eng.crawl_order()
    assert order == sim.order
    # the known-404 seed appears exactly max_retries times
    bad = "https://host-0001.test/does-not-exist/404"
    assert sum(1 for u, _ in order if u == bad) == 3
    proc = eng.processed.read(spark)
    assert proc.filter(f"url = '{bad}' and state_final = 'error'").count() == 3


def test_ad_seed_lineage(spark, small, tmp_path_factory):
    """J4: ad-URL crawl list carries ad_id; fetched landing pages keep
    the referrer_ad lineage (crawler.ts:313,326-332)."""
    spec, paths = small
    cfg = CrawlConfig(wave_seconds=10, default_budget=3, max_waves=2,
                      max_depth=0)
    layout = spec.layout()
    ad_seeds = [(i, spec.page_url(h, 0), 100 + i)
                for i, h in enumerate(range(3))]
    work = str(tmp_path_factory.mktemp("wads"))
    eng = CrawlEngine(spark, paths["pages"], paths["robots"], work, cfg)
    eng.bootstrap(ad_seeds)
    eng.run()
    res = eng.results.read(spark)
    got = {r["url"]: r["ad_id"] for r in res.collect()}
    _ = layout
    for i, h in enumerate(range(3)):
        url = spec.page_url(h, 0)
        if url in got:  # robots may disallow some
            assert got[url] == 100 + i