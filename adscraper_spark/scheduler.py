"""Per-host politeness scheduler — grouped-by-host window priority queues.

Core primitive (SURVEY.md §2.5 W1/W2): within a wave, each host may fetch
at most ``budget(host)`` URLs, chosen by ``(priority, seq)`` order. The
reference achieves this implicitly — one browser, strict list order, 5s
sleeps (crawler/src/crawler.ts:80-97,295-311); we make it an explicit
windowed top-k per host.

Skew (north rule): ``Window.partitionBy(host)`` alone funnels a mega-host
(10^10-frontier case) into ONE task. AQE fixes join skew but not stateful
window skew, so we do the classic two-phase distributed top-k with a
salted key:

  phase 1: rank within (host, salt) — salt = xxhash64(url) % S spreads a
           hot host over S tasks; each group keeps ≤ budget rows;
  phase 2: re-rank the ≤ budget×S survivors per host — tiny input, the
           heavy shuffle already happened on the salted key.

For budget ≪ frontier-per-host this cuts phase-2 input by ~frontier/budget.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

DEFAULT_SALT_FANOUT = 16


def budgets_df(spark, budgets: dict[str, int], default_budget: int):
    rows = [(h, int(b)) for h, b in sorted(budgets.items())]
    df = spark.createDataFrame(rows or [("", default_budget)],
                               "host string, host_budget int")
    return df


def plan_wave(pending: DataFrame, budgets: dict[str, int] | DataFrame,
              default_budget: int,
              salt_fanout: int = DEFAULT_SALT_FANOUT) -> DataFrame:
    """Select this wave's fetch set from pending frontier rows.

    ``pending`` needs columns (url, host, priority, seq). Budgets ride a
    broadcast join (robots dimension is one row per host — always small
    relative to the frontier); pass them as a ``(host, host_budget)``
    DataFrame (the no-driver-collect path) or a plain dict (tests).
    Returns the planned rows with a stable ``host_rank``.
    """
    spark = pending.sparkSession
    if isinstance(budgets, DataFrame):
        bdf = budgets
    else:
        bdf = budgets_df(spark, budgets, default_budget)
    planned = (
        pending
        .join(F.broadcast(bdf), "host", "left")
        .withColumn("host_budget",
                    F.coalesce(F.col("host_budget"), F.lit(default_budget)))
        .withColumn("salt",
                    F.pmod(F.xxhash64("url"), F.lit(salt_fanout)).cast("int"))
    )
    # phase 1: local top-k inside each (host, salt) shard. url is the
    # FINAL tiebreaker (also in w2, the simulator, crawl_order):
    # discovered-URL seq is a 31-bit hash, so same-host collisions are
    # expected at frontier scale, and a tie straddling the budget
    # cutoff would otherwise be kept/dropped arbitrarily per run
    # (row_number over an unstable sort) — breaking both run-to-run
    # determinism and engine-vs-simulator parity.
    w1 = Window.partitionBy("host", "salt").orderBy("priority", "seq",
                                                    "url")
    survivors = (
        planned.withColumn("shard_rank", F.row_number().over(w1))
        .filter(F.col("shard_rank") <= F.col("host_budget"))
        .drop("shard_rank")
    )
    # phase 2: exact top-k per host over ≤ budget×salt_fanout survivors.
    # host_budget stays on the rows — the Z2 site-time-budget gate
    # derives each fetch's virtual cost from it (engine.run_wave).
    w2 = Window.partitionBy("host").orderBy("priority", "seq", "url")
    return (
        survivors.withColumn("host_rank", F.row_number().over(w2))
        .filter(F.col("host_rank") <= F.col("host_budget"))
        .drop("salt")
    )
