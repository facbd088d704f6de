import pytest

from adscraper_spark.config import CrawlConfig
from adscraper_spark.corpus import (
    CorpusSpec, gen_robots_txt, gen_seeds, pages_rows, write_corpus_parquet,
)


@pytest.fixture(scope="session")
def spark():
    from adscraper_spark.session import build_session

    s = build_session(app="adscraper_spark_tests", cpus=8,
                      shuffle_partitions=8)
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()


@pytest.fixture(scope="session")
def corpus_spec():
    return CorpusSpec(n_pages=300, n_hosts=12, seed=42)


@pytest.fixture(scope="session")
def corpus(corpus_spec, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("corpus"))
    paths = write_corpus_parquet(corpus_spec, out)
    return paths


@pytest.fixture(scope="session")
def crawl_config():
    return CrawlConfig(wave_seconds=10, default_budget=3, max_waves=8,
                       max_depth=2)


@pytest.fixture(scope="session")
def seeds(corpus_spec):
    return [(i, u) for i, u in enumerate(gen_seeds(corpus_spec, n_seeds=12))]


@pytest.fixture(scope="session")
def robots_rows(corpus_spec):
    return [(corpus_spec.host_name(h), gen_robots_txt(corpus_spec, h))
            for h in range(corpus_spec.n_hosts)
            if gen_robots_txt(corpus_spec, h) is not None]


@pytest.fixture(scope="session")
def sim_result(corpus_spec, seeds, robots_rows, crawl_config):
    from adscraper_spark.simulator import simulate_crawl

    pages = {r["url"]: r["html"] for r in pages_rows(corpus_spec)}
    return simulate_crawl(pages, seeds, robots_rows, crawl_config)


@pytest.fixture(scope="session")
def finished_engine(spark, corpus, seeds, crawl_config, tmp_path_factory):
    """One shared engine run — order/seen/politeness/byte-identity tests
    all assert against this single crawl (keeps the suite fast)."""
    from adscraper_spark.engine import CrawlEngine

    work = str(tmp_path_factory.mktemp("work"))
    eng = CrawlEngine(spark, corpus["pages"], corpus["robots"], work,
                      crawl_config)
    eng.bootstrap(seeds)
    eng.run()
    return eng
