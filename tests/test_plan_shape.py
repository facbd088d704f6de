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