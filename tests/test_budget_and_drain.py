"""Z2 per-site time budgets + Z6 graceful drain + S7 RSS feed→article.

Reference semantics: 15-min Promise.race per site
(crawler/src/crawler.ts:80-97,316-317), SIGTERM checkpoint-and-exit
(crawler/src/k8s-indexed-job-worker.ts:30-53), RSS first article
(crawler/src/pages/get-rss-article.ts:40-75)."""

import math

import pytest
from pyspark.sql import functions as F

from adscraper_spark.config import CrawlConfig
from adscraper_spark.corpus import (
    CorpusSpec, feed_rows, gen_feed_xml, gen_robots_txt, gen_seeds,
    pages_rows, parse_feed_first, write_corpus_parquet,
)
from adscraper_spark.engine import CrawlEngine
from adscraper_spark.robots import host_budgets
from adscraper_spark.simulator import simulate_crawl


@pytest.fixture(scope="module")
def budget_setup(tmp_path_factory):
    spec = CorpusSpec(n_pages=150, n_hosts=6, seed=11)
    out = str(tmp_path_factory.mktemp("bcorpus"))
    paths = write_corpus_parquet(spec, out)
    # budget 5/wave but only ~3 fetches fit the site time budget
    cfg = CrawlConfig(wave_seconds=10, default_budget=5, max_waves=4,
                      max_depth=2, site_budget_seconds=6.5)
    seeds = [(i, u) for i, u in enumerate(gen_seeds(spec, n_seeds=8))]
    robots = [(spec.host_name(h), gen_robots_txt(spec, h))
              for h in range(spec.n_hosts)
              if gen_robots_txt(spec, h) is not None]
    return spec, paths, cfg, seeds, robots


def test_site_budget_engine_matches_simulator(spark, budget_setup,
                                              tmp_path_factory):
    spec, paths, cfg, seeds, robots = budget_setup
    pages = {r["url"]: r["html"] for r in pages_rows(spec)}
    sim = simulate_crawl(pages, seeds, robots, cfg)
    work = str(tmp_path_factory.mktemp("bw"))
    eng = CrawlEngine(spark, paths["pages"], paths["robots"], work, cfg)
    eng.bootstrap(seeds)
    eng.run()
    assert eng.crawl_order() == sim.order
    assert eng.seen_set() == sim.seen
    # timeout rows recorded with their own state class
    eng_timeouts = {r["url"] for r in eng.processed.read(spark)
                    .filter("state_final = 'timeout'").collect()}
    sim_timeouts = {u for u, s in sim.states.items() if s == "timeout"}
    assert eng_timeouts == sim_timeouts
    assert eng_timeouts, "fixture never hit the budget — tighten it"


def test_site_budget_invariant(spark, budget_setup, tmp_path_factory):
    """For every host and wave: fetch attempts ≤ ⌊budget·b/wave⌋ — the
    W2 politeness bound sharpened by the Z2 time budget."""
    spec, paths, cfg, seeds, robots = budget_setup
    work = str(tmp_path_factory.mktemp("bw2"))
    eng = CrawlEngine(spark, paths["pages"], paths["robots"], work, cfg)
    eng.bootstrap(seeds)
    eng.run()
    budgets = host_budgets(robots, cfg.wave_seconds, cfg.default_budget)
    proc = eng.processed.read(spark)
    adm = eng.admitted.read(spark).select("url", "host")
    rows = (proc.filter("state_final <> 'timeout'")
            .join(adm, "url")
            .groupBy("host", "wave_fetched").count().collect())
    for r in rows:
        b = budgets.get(r["host"], cfg.default_budget)
        cap = min(b, math.floor(cfg.site_budget_seconds
                                / (cfg.wave_seconds / b)))
        assert r["count"] <= cap, (r["host"], r["wave_fetched"])


def test_graceful_drain_resumes_identically(spark, budget_setup,
                                            tmp_path_factory):
    """Z6: a stop request between waves exits after the current commit;
    resuming completes to the same final state as an uninterrupted run."""
    spec, paths, cfg, seeds, _ = budget_setup
    wa = str(tmp_path_factory.mktemp("za"))
    wb = str(tmp_path_factory.mktemp("zb"))
    a = CrawlEngine(spark, paths["pages"], paths["robots"], wa, cfg)
    a.bootstrap(seeds)
    a.run()

    b = CrawlEngine(spark, paths["pages"], paths["robots"], wb, cfg)
    b.bootstrap(seeds)
    waves_done = {"n": 0}

    def stop_after_first():
        waves_done["n"] += 1
        return waves_done["n"] > 1  # allow exactly one wave

    stats = b.run(stop_requested=stop_after_first)
    assert len(stats) == 1 and b.last_committed_wave() == 1
    b2 = CrawlEngine(spark, paths["pages"], paths["robots"], wb, cfg)
    b2.run()
    assert a.crawl_order() == b2.crawl_order()
    assert a.seen_set() == b2.seen_set()


def test_rss_feed_first_article(spark, budget_setup):
    """S7/W3: feed XML parses to item[0]; the operator returns it for
    sources whose advertised feed is actually SERVED, and misses (like
    getRssArticle's parse failure) for sources on feedless hosts —
    ~30% of corpus hosts dangle their header link (host_has_feed)."""
    from adscraper_spark.analysis import (
        find_articles_rss_first, rss_first_article,
    )
    from adscraper_spark.corpus import host_has_feed

    spec, paths, cfg, seeds, _ = budget_setup
    # pick sources that DO advertise an RSS feed (U9 discovery)
    from adscraper_spark.extraction.core import extract_page

    rows = {r["url"]: r["html"] for r in pages_rows(spec)}
    advertisers = [u for u, h in rows.items()
                   if extract_page(u, h).rss_urls]
    assert advertisers, "corpus generated no RSS-advertising pages"

    def src_host(u: str) -> int:
        return int(u.split("host-")[1][:4])

    # balanced sample: ≤4 sources per leg (the mega host hoards the
    # front of iteration order, and it happens to be feedless here)
    served = [u for u in advertisers
              if host_has_feed(spec, src_host(u))][:4]
    dangling = [u for u in advertisers
                if not host_has_feed(spec, src_host(u))][:4]
    rss_sources = served + dangling
    assert served, "fixture exercises no served-feed leg"
    assert dangling, "fixture exercises no dangling-feed leg"
    src_df = spark.createDataFrame([(u,) for u in rss_sources],
                                   "url string")
    got = {r["src_url"]: (r["feed_url"], r["article_url"]) for r in
           rss_first_article(spark, paths["pages"], src_df).collect()}
    for src in served:
        ex = extract_page(src, rows[src])
        feed = ex.rss_urls[0]
        want = parse_feed_first(gen_feed_xml(spec, src_host(feed)))
        assert got[src] == (feed, want), src
    for src in dangling:
        # header link dangles AND all three origin guesses miss: no row
        assert src not in got, src
    # the rss-first composite prefers the feed path for served sources
    # and falls back to the seeded guess path for dangling ones
    via = {r["src_url"]: r["via"] for r in
           find_articles_rss_first(spark, paths["pages"],
                                   src_df).collect()}
    assert all(via[u] == "rss" for u in served)
    assert all(via[u] == "guess" for u in dangling if u in via)


def test_rss_guess_requires_fetched_source(spark, budget_setup):
    """guessRssFeed runs on a LOADED page (get-rss-article.ts is only
    invoked after navigation): a source URL absent from the corpus — a
    404/fetch-error page — must not resolve an article via a guessed
    /feed on a host that happens to serve one. Regression: guesses used
    to derive from the raw seed list instead of the fetched sources."""
    from adscraper_spark.analysis import rss_first_article
    from adscraper_spark.corpus import host_has_feed

    spec, paths, cfg, seeds, _ = budget_setup
    h = next(h for h in range(spec.n_hosts) if host_has_feed(spec, h))
    ghost = f"https://{spec.host_name(h)}/no-such-page-404"
    real = spec.page_url(h, 0)
    src_df = spark.createDataFrame([(ghost,), (real,)], "url string")
    got = {r["src_url"] for r in
           rss_first_article(spark, paths["pages"], src_df).collect()}
    assert ghost not in got      # never fetched → no guess candidates
    assert real in got           # the host's /feed IS served


def test_feed_rows_never_enter_frontier(spark, budget_setup,
                                        tmp_path_factory):
    """Feed pseudo-pages are corpus rows but <link> elements, not
    anchors — the crawl must never admit or fetch them (keeps
    engine==simulator equivalence intact)."""
    spec, paths, cfg, seeds, _ = budget_setup
    work = str(tmp_path_factory.mktemp("fw"))
    eng = CrawlEngine(spark, paths["pages"], paths["robots"], work, cfg)
    eng.bootstrap(seeds)
    eng.run()
    feeds = {r["url"] for r in feed_rows(spec)}
    assert not (eng.seen_set() & feeds)
