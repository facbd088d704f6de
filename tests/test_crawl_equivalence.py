"""Crawl-order / seen-set equivalence vs the sequential simulator, plus
politeness + admission invariants (SURVEY.md §5.2.2/4/5) — all against
the one shared engine run."""

from collections import Counter

from pyspark.sql import functions as F

from adscraper_spark.robots import host_budgets, parse_robots
from adscraper_spark.urlnorm import url_path


def test_crawl_order_matches_simulator(finished_engine, sim_result):
    assert finished_engine.crawl_order() == sim_result.order


def test_seen_set_matches_simulator(finished_engine, sim_result):
    assert finished_engine.seen_set() == sim_result.seen


def test_no_url_fetched_twice(finished_engine, spark):
    proc = finished_engine.processed.read(spark)
    dups = (proc.groupBy("url").count().filter(F.col("count") > 1).count())
    assert dups == 0


def test_politeness_budget_respected(finished_engine, spark, robots_rows,
                                     crawl_config):
    """For every host and wave: fetches ≤ budget(host) (W2)."""
    budgets = host_budgets(robots_rows, crawl_config.wave_seconds,
                           crawl_config.default_budget)
    proc = finished_engine.processed.read(spark)
    adm = finished_engine.admitted.read(spark).select("url", "host")
    counts = Counter(
        (r["host"], r["wave_fetched"])
        for r in proc.join(adm, "url").collect())
    for (host, _wave), n in counts.items():
        budget = budgets.get(host, crawl_config.default_budget)
        assert n <= budget, f"{host} over budget: {n} > {budget}"


def test_robots_disallowed_never_fetched(finished_engine, spark,
                                         robots_rows):
    policies = {h: parse_robots(b) for h, b in robots_rows}
    proc = finished_engine.processed.read(spark)
    adm = finished_engine.admitted.read(spark).select("url", "host")
    for r in proc.join(adm, "url").collect():
        pol = policies.get(r["host"])
        if pol is not None:
            assert pol.is_allowed(url_path(r["url"])), \
                f"fetched disallowed URL {r['url']}"
    # and disallowed rows exist in the frontier with the right state
    states = finished_engine.admitted.read(spark) \
        .groupBy("state_initial").count().collect()
    state_map = {r["state_initial"]: r["count"] for r in states}
    assert state_map.get("invalid", 0) >= 1  # malformed seeds recorded


def test_states_match_simulator(finished_engine, spark, sim_result):
    adm = finished_engine.admitted.read(spark)
    proc = finished_engine.processed.read(spark)
    final = {r["url"]: r["state_final"] for r in proc.collect()}
    for r in adm.collect():
        engine_state = final.get(r["url"], r["state_initial"])
        assert engine_state == sim_result.states[r["url"]], r["url"]


def test_within_wave_duplicate_admitted_once(finished_engine, spark):
    adm = finished_engine.admitted.read(spark)
    dups = adm.groupBy("url").count().filter(F.col("count") > 1).count()
    assert dups == 0


def test_error_seed_recorded(finished_engine, spark, sim_result):
    proc = finished_engine.processed.read(spark)
    errors = {r["url"] for r in
              proc.filter(F.col("state_final") == "error").collect()}
    sim_errors = {u for u, s in sim_result.states.items() if s == "error"}
    assert errors == sim_errors and len(errors) >= 1
