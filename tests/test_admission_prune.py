"""Bucket-pruned admission anti-join (r6 optimization, VERDICT r05 #1):
the exact seen-set confirmation's right side opens only the admitted
log's bucket files matching the candidates' url-hash bucket set, and
the pruned engine remains byte-equivalent to the sequential simulator.
"""

import tempfile

from pyspark.sql import functions as F

from adscraper_spark.config import CrawlConfig
from adscraper_spark.corpus import pages_rows
from adscraper_spark.engine import CrawlEngine
from adscraper_spark.store import SnapshotTable


def test_read_bucket_subset_equals_filtered_full_read(spark, tmp_path):
    n_buckets = 8
    t = SnapshotTable(str(tmp_path / "t"), bucket_col="url",
                      num_buckets=n_buckets)
    mk = lambda lo, hi: spark.range(lo, hi).select(  # noqa: E731
        F.concat(F.lit("https://h"), (F.col("id") % 13).cast("string"),
                 F.lit(".test/p/"), F.col("id").cast("string"))
        .alias("url"),
        F.col("id").alias("seq"))
    t.append(mk(0, 500))
    t.append(mk(500, 900))  # second data dir — prune spans appends
    want = {1, 4, 6}
    sub = t.read_bucket_subset(spark, want)
    got = sorted(r["url"] for r in sub.collect())
    full = t.read(spark)
    exp = sorted(r["url"] for r in full.filter(
        F.pmod(F.hash("url"), F.lit(n_buckets)).isin(list(want)))
        .collect())
    assert got == exp and got  # identical rows, non-empty
    # the subset scan opens only the selected bucket files: ≤ |want|
    # per data dir, and strictly fewer files than the full read
    sub_files = sub.inputFiles()
    assert len(sub_files) <= len(want) * 2
    assert len(sub_files) < len(full.inputFiles())


def test_read_bucket_subset_refuses_foreign_layout(spark, tmp_path):
    """A dir written under a DIFFERENT bucket count must be read whole
    (marker mismatch) — never mis-pruned."""
    t8 = SnapshotTable(str(tmp_path / "t"), bucket_col="url", num_buckets=8)
    df = spark.range(300).select(
        F.concat(F.lit("u"), F.col("id").cast("string")).alias("url"))
    t8.append(df)
    # same path, different bucket count (a config change mid-history)
    t4 = SnapshotTable(str(tmp_path / "t"), bucket_col="url", num_buckets=4)
    t4.append(df.select(F.concat(F.lit("v"), F.col("url")).alias("url")))
    sub = t4.read_bucket_subset(spark, {0})
    rows = [r["url"] for r in sub.collect()]
    # every row of the foreign (8-bucket) dir is present regardless of
    # its bucket id; the native dir is pruned to bucket 0
    assert {u for u in rows if u.startswith("u")} == {
        f"u{i}" for i in range(300)}
    v_expected = {r["url"] for r in t4.read(spark).filter(
        F.col("url").startswith("v")
        & (F.pmod(F.hash("url"), F.lit(4)) == 0)).collect()}
    assert {u for u in rows if u.startswith("v")} == v_expected


def test_pruned_engine_matches_simulator(spark, corpus, corpus_spec,
                                         seeds, robots_rows):
    """Force pruning from the first wave (min_rows=1): crawl order and
    seen set must stay identical to the sequential oracle."""
    from adscraper_spark.simulator import simulate_crawl

    cfg = CrawlConfig(wave_seconds=10, default_budget=3, max_waves=8,
                      max_depth=2, antijoin_prune_min_rows=1)
    pages = {r["url"]: r["html"] for r in pages_rows(corpus_spec)}
    sim = simulate_crawl(pages, seeds, robots_rows, cfg)
    work = tempfile.mkdtemp(prefix="prune_engine_")
    eng = CrawlEngine(spark, corpus["pages"], corpus["robots"], work, cfg)
    eng.bootstrap(seeds)
    eng.run()
    assert eng.crawl_order() == sim.order
    assert eng.seen_set() == sim.seen
