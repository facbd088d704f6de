"""Physical-plan assertions — the 100 TB posture checks (SURVEY.md §4).

Correctness tests prove the answers; these prove the PLANS: filters
reach the parquet scan, small dims broadcast, scans prune columns,
JVM-only queries never drop into Python, the scheduler's two-phase
top-k actually shards hot hosts.
"""

from pyspark.sql import functions as F

from adscraper_spark.pipelines import relational, text_quality
from adscraper_spark.scheduler import plan_wave

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_filter_pushdown_to_scan(spark):
    df = (spark.read.parquet(f"{SF}/lineitem.parquet")
          .filter(F.col("l_shipdate") <= "1995-01-01")
          .select("l_orderkey", "l_quantity"))
    plan = _plan(df)
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" \
        in plan, plan


def test_column_pruning(spark):
    df = (spark.read.parquet(f"{SF}/lineitem.parquet")
          .select("l_orderkey", "l_quantity"))
    plan = _plan(df)
    assert "ReadSchema: struct<l_orderkey" in plan
    assert "l_comment" not in plan  # untouched columns never scanned


def test_dimension_join_broadcasts(spark):
    plan = _plan(relational.j1_region_revenue(spark, SF))
    assert "BroadcastHashJoin" in plan


def test_seen_anti_join_physical(spark):
    plan = _plan(relational.j5_unseen_anti_join(spark, SF))
    assert "LeftAnti" in plan


def test_jvm_queries_never_touch_python(spark):
    """Everything except the extraction/normalization UDFs must stay in
    the JVM (no BatchEvalPython / ArrowEval in the plan)."""
    for name, fn in {**relational.QUERIES, **text_quality.QUERIES}.items():
        plan = _plan(fn(spark, SF))
        assert "EvalPython" not in plan, f"{name} dropped into Python"


def test_whole_stage_codegen_present(spark):
    df = relational.q1_pricing_summary(spark, SF)
    df.collect()  # AQE finalizes the plan (incl. codegen spans) on run
    plan = _plan(df)
    # '*(n)' prefixes mark whole-stage-codegen spans in the final plan
    assert "*(" in plan and "isFinalPlan=true" in plan


def test_scheduler_budget_dimension_broadcasts(spark):
    pending = spark.createDataFrame(
        [(f"https://h{i % 5}.test/{i}", f"h{i % 5}.test", 0.0, i)
         for i in range(100)],
        "url string, host string, priority double, seq long")
    plan = _plan(plan_wave(pending, {"h0.test": 2}, 3, salt_fanout=4))
    assert "BroadcastHashJoin" in plan  # budgets ride a broadcast
    # two-phase top-k: first window partitions by (host, salt)
    assert "host" in plan and "salt" in plan


def test_robots_gate_broadcasts_no_driver_collect(spark, tmp_path):
    """The robots dimension must ride a broadcast join into the seed /
    admission gates — never a driver-collected policy dict captured in
    task closures (VERDICT r1 scale-killer #1)."""
    from adscraper_spark.config import CrawlConfig
    from adscraper_spark.engine import CrawlEngine

    import pyarrow as pa
    import pyarrow.parquet as pq
    pq.write_table(pa.Table.from_pylist(
        [{"host": "h.test",
          "robots_txt": "User-agent: *\nDisallow: /private/\n"}],
        schema=pa.schema([("host", pa.string()),
                          ("robots_txt", pa.string())])),
        str(tmp_path / "robots.parquet"))
    eng = CrawlEngine(spark, str(tmp_path / "nopages.parquet"),
                      str(tmp_path / "robots.parquet"),
                      str(tmp_path / "w"), CrawlConfig())
    gated = eng._gated_seed_df(
        eng._seed_rows([(0, "https://h.test/a"),
                        (1, "https://h.test/private/x")], 0))
    plan = _plan(gated)
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    states = {r["url"]: r["state_initial"] for r in gated.collect()}
    assert states["https://h.test/a"] == "pending"
    assert states["https://h.test/private/x"] == "disallowed"
    # budgets dimension is a (host, host_budget) DataFrame, not a dict
    assert eng.budgets_df is not None
    assert eng.budgets_df.collect()[0]["host_budget"] >= 1


def test_extraction_stage_partition_count(spark):
    """The UDF stage must run at full parallelism, not at AQE's
    byte-coalesced partition count (engine.py repartition rationale)."""
    from adscraper_spark.extraction.udfs import extract_pages

    df = spark.createDataFrame(
        [(f"https://h.test/{i}", b"<p>x</p>") for i in range(500)],
        "url string, html binary")
    par = spark.sparkContext.defaultParallelism
    out = extract_pages(df.repartition(par, "url"))
    assert out.rdd.getNumPartitions() == par

def test_fetch_join_broadcasts_wave_side(spark):
    """The wave fetch must broadcast the scheduled-url side so the
    corpus html column is never exchanged (engine.fetch_join)."""
    from adscraper_spark.engine import fetch_join

    pages = spark.range(1000).select(
        F.concat(F.lit("u"), "id").alias("url"),
        F.lit("<html></html>").alias("html"))
    sched = spark.range(10).select(
        F.concat(F.lit("u"), "id").alias("url"),
        F.lit(0).alias("depth"))
    plan = _plan(fetch_join(pages, sched, 10, 5_000_000))
    assert "BroadcastHashJoin" in plan
    assert "Exchange hashpartitioning" not in plan  # html never shuffles


def test_fetch_join_fallback_is_shuffle_join(spark):
    """Waves past broadcast_wave_max take the shuffle join over the
    url-bucketed layout (and keep S6 semantics via the html filter)."""
    from adscraper_spark.engine import fetch_join

    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        pages = spark.range(1000).select(
            F.concat(F.lit("u"), "id").alias("url"),
            F.lit("<html></html>").alias("html"))
        sched = spark.range(10).select(
            F.concat(F.lit("u"), "id").alias("url"),
            F.lit(0).alias("depth"))
        plan = _plan(fetch_join(pages, sched, 10, 0))
        assert ("SortMergeJoin" in plan) or ("ShuffledHashJoin" in plan)
        # (S6 miss semantics of this path are covered by the engine
        #  equivalence tests; with literal columns Catalyst folds the
        #  html-notnull filter into the join itself)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
