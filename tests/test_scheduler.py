"""Scheduler: windowed top-k correctness + skew balance (SURVEY §5.2.6)."""

from pyspark.sql import functions as F

from adscraper_spark.scheduler import plan_wave


def _pending(spark, rows):
    return spark.createDataFrame(
        rows, "url string, host string, priority double, seq long")


def test_top_k_per_host_exact(spark):
    rows = [(f"https://h{h}.test/p/{i}", f"h{h}.test", float(i % 3), i)
            for h in range(3) for i in range(20)]
    planned = plan_wave(_pending(spark, rows), {"h0.test": 2, "h1.test": 5},
                        default_budget=3, salt_fanout=4)
    got = planned.groupBy("host").count().collect()
    counts = {r["host"]: r["count"] for r in got}
    assert counts == {"h0.test": 2, "h1.test": 5, "h2.test": 3}
    # chosen rows are exactly the (priority, seq)-smallest per host
    h0 = sorted((r["priority"], r["seq"]) for r in
                planned.filter(F.col("host") == "h0.test").collect())
    expect = sorted((float(i % 3), i) for i in range(20))[:2]
    assert h0 == expect


def test_salting_spreads_hot_host(spark):
    """Phase-1 shards of a mega-host must balance within a bounded ratio
    (the 10^10-frontier skew case, SURVEY §4.1)."""
    rows = [(f"https://mega.test/p/{i}", "mega.test", 1.0, i)
            for i in range(4000)]
    df = _pending(spark, rows).withColumn(
        "salt", F.pmod(F.xxhash64("url"), F.lit(16)).cast("int"))
    sizes = [r["count"] for r in df.groupBy("salt").count().collect()]
    assert len(sizes) == 16
    assert max(sizes) / min(sizes) < 1.5


def test_budget_one_serializes_host(spark):
    rows = [(f"https://h.test/p/{i}", "h.test", 0.0, i) for i in range(10)]
    planned = plan_wave(_pending(spark, rows), {"h.test": 1},
                        default_budget=4)
    got = planned.collect()
    assert len(got) == 1 and got[0]["seq"] == 0


def test_seq_collision_tiebreak_is_deterministic(spark):
    """Discovered-URL seq is a 31-bit hash — same-host collisions are
    expected at frontier scale. Two same-(priority, seq) rows straddling
    the budget cutoff must resolve by url (the shared final tiebreaker),
    not by whatever order the unstable sort happened to produce."""
    rows = [("https://h.test/zzz", "h.test", 1.0, 7),
            ("https://h.test/aaa", "h.test", 1.0, 7),
            ("https://h.test/mmm", "h.test", 1.0, 7)]
    for fanout in (1, 16):
        for _ in range(3):  # repeated runs must agree
            got = plan_wave(_pending(spark, rows), {"h.test": 2},
                            default_budget=2, salt_fanout=fanout).collect()
            assert sorted(r["url"] for r in got) == [
                "https://h.test/aaa", "https://h.test/mmm"]
            ranks = {r["url"]: r["host_rank"] for r in got}
            assert ranks["https://h.test/aaa"] == 1
