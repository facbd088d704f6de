"""Skew handling (SURVEY §5.2.6): a mega-host-dominated frontier must
crawl correctly (order == simulator) and the salted phase-1 must bound
per-shard input."""

from pyspark.sql import functions as F

from adscraper_spark.config import CrawlConfig
from adscraper_spark.corpus import (
    CorpusSpec, gen_robots_txt, gen_seeds, pages_rows, write_corpus_parquet,
)
from adscraper_spark.engine import CrawlEngine
from adscraper_spark.simulator import simulate_crawl


def test_mega_host_crawl_matches_simulator(spark, tmp_path_factory):
    """host-0000 holds ~94% of all pages (mega_host_weight=50); the
    engine must produce the identical crawl order and seen set as the
    sequential oracle while spreading the host over salt shards."""
    spec = CorpusSpec(n_pages=400, n_hosts=8, seed=5, mega_host_weight=50)
    counts = dict(spec.layout())
    assert counts[0] / spec.n_pages > 0.8  # the skew is real
    out = str(tmp_path_factory.mktemp("skewcorpus"))
    paths = write_corpus_parquet(spec, out)
    cfg = CrawlConfig(wave_seconds=10, default_budget=4, max_waves=6,
                      max_depth=2, salt_fanout=8)
    seeds = [(i, u) for i, u in enumerate(gen_seeds(spec, n_seeds=20))]
    robots = [(spec.host_name(h), gen_robots_txt(spec, h))
              for h in range(spec.n_hosts)
              if gen_robots_txt(spec, h) is not None]
    sim = simulate_crawl({r["url"]: r["html"] for r in pages_rows(spec)},
                         seeds, robots, cfg)
    work = str(tmp_path_factory.mktemp("skewwork"))
    eng = CrawlEngine(spark, paths["pages"], paths["robots"], work, cfg)
    eng.bootstrap(seeds)
    eng.run()
    assert eng.crawl_order() == sim.order
    assert eng.seen_set() == sim.seen


def test_salt_shard_balance_on_mega_host(spark):
    """Phase-1 input of a 10k-row single-host frontier spreads evenly
    over the salt shards (the stateful-group skew fix, SURVEY §4.1)."""
    rows = [(f"https://mega.test/p/{i}", "mega.test", 1.0, i)
            for i in range(10_000)]
    df = spark.createDataFrame(
        rows, "url string, host string, priority double, seq long")
    fanout = 16
    sizes = [r["count"] for r in
             df.withColumn("salt", F.pmod(F.xxhash64("url"),
                                          F.lit(fanout)).cast("int"))
             .groupBy("salt").count().collect()]
    assert len(sizes) == fanout
    assert max(sizes) / min(sizes) < 1.3

def test_salted_and_unsalted_plans_select_identical_wave(spark):
    """plan_wave at salt_fanout=1 (the unsalted Window.partitionBy(host)
    funnel) and at the default fanout must select the exact same wave —
    salting is a physical-plan change only. Same property the bench's
    skew A/B asserts (bench.bench_skew), pinned here at test size."""
    from pyspark.sql import functions as F

    from adscraper_spark.scheduler import plan_wave

    host = (F.when(F.pmod(F.col("id"), F.lit(10)) < 9,
                   F.lit("hot.example.com"))
            .otherwise(F.concat(F.lit("h"),
                                F.pmod(F.col("id"), F.lit(97)).cast("string"),
                                F.lit(".example.com"))))
    pending = (spark.range(20_000)
               .select(F.col("id"), host.alias("host"))
               .select(F.concat(F.lit("https://"), F.col("host"),
                                F.lit("/p/"),
                                F.col("id").cast("string")).alias("url"),
                       "host",
                       # two priority tiers so the top-k ordering is
                       # actually exercised, not just a row cap
                       (F.pmod(F.col("id"), F.lit(3)) == 0)
                       .cast("double").alias("priority"),
                       F.col("id").alias("seq")))
    budget = 25

    def wave(fanout: int) -> list[tuple]:
        return sorted(
            (r["url"], r["host_rank"])
            for r in plan_wave(pending, {}, budget,
                               salt_fanout=fanout).collect())

    assert wave(1) == wave(16)
