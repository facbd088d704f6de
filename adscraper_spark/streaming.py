"""Structured Streaming surfaces (SURVEY.md §2.9 streaming analogs).

The wave loop itself is deliberately a driver-side micro-batch iteration
(SURVEY §1.4: exactly-once admission is cleaner with snapshot-per-wave
commits than with a streaming sink). Two places where Structured
Streaming IS the right tool:

- **continuous seed intake** (the reference's job-submission path,
  runIndexedJob.ts, generalized to a feed): new crawl-list files landing
  in a directory stream into the frontier via ``foreachBatch`` — the
  admission anti-join makes re-delivered batches idempotent, so Spark's
  streaming checkpoint + our snapshot commit compose to exactly-once;
- **live politeness monitoring**: watermarked tumbling-window fetch
  counts per host over the fetch log — the W2 budget invariant as a
  continuously-maintained aggregate (late fetch records tolerated up to
  the watermark).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .engine import CrawlEngine

SEED_STREAM_SCHEMA = "seq long, url string, ad_id long"


def admit_seed_stream(engine: CrawlEngine, seeds_dir: str,
                      checkpoint_dir: str, available_now: bool = True):
    """Stream seed files (parquet, schema ``seq,url,ad_id``) from a
    directory into the engine's frontier. Returns the StreamingQuery.

    Idempotence: ``admit_seeds`` anti-joins the admitted log, so a batch
    replayed after a crash admits nothing twice (exactly-once end to
    end: file-source checkpoint × snapshot-commit admission).
    """
    spark = engine.spark

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        # fully distributed: the batch flows normalize→dedup→anti-join→
        # append without a driver collect (a real seed feed can be
        # arbitrarily large; engine.admit_seeds_df scales with executors)
        engine.admit_seeds_df(batch_df)

    stream = (spark.readStream.schema(SEED_STREAM_SCHEMA)
              .parquet(seeds_dir))
    writer = (stream.writeStream.foreachBatch(process_batch)
              .option("checkpointLocation", checkpoint_dir))
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def host_fetch_rates(fetch_log: DataFrame, window: str = "1 minute",
                     watermark: str = "2 minutes") -> DataFrame:
    """Watermarked per-host fetch counts over a streaming fetch log
    (columns: host string, fetch_ts timestamp). Output rows compare
    directly against the W2 budget: count ≤ ⌈window / crawl_delay⌉."""
    return (fetch_log
            .withWatermark("fetch_ts", watermark)
            .groupBy(F.window("fetch_ts", window).alias("w"), "host")
            .agg(F.count("*").alias("fetches"))
            .select(F.col("w.start").alias("window_start"),
                    F.col("w.end").alias("window_end"),
                    "host", "fetches"))


GATE_OUTPUT_SCHEMA = ("host string, event_id long, win long, "
                      "allowed boolean")
GATE_STATE_SCHEMA = "win long, used long"


def politeness_gate_stream(requests: DataFrame, budget: int,
                           wave_seconds: int) -> DataFrame:
    """W2 politeness as a CUSTOM STATEFUL streaming operator
    (``applyInPandasWithState``): per host, allow only the first
    ``budget`` requests of each ``wave_seconds`` tumbling window; the
    (window, used-count) state carries across micro-batches, so a host
    that exhausted its window in batch N stays blocked in batch N+1 —
    the reference's per-host crawl-delay pacing (SURVEY §2.5 W2,
    crawler.ts sequential per-site loop) running continuously instead
    of per wave.

    ``requests`` is a STREAMING DataFrame (host string, event_id long,
    ts timestamp). Decisions are deterministic given time-ordered
    arrival (events sorted by (ts, event_id) within each batch; the
    file source preserves file order across batches) and equal the
    batch w2_politeness_gate / DuckDB row_number oracle — asserted in
    tests/test_streaming.py."""
    import pandas as pd

    def gate(key, pdfs, state) -> "pd.DataFrame":
        (host,) = key
        win, used = state.get if state.exists else (-1, 0)
        out = []
        for pdf in pdfs:
            pdf = pdf.sort_values(["ts", "event_id"])
            for ev, ts in zip(pdf["event_id"], pdf["ts"]):
                w = int(ts.value // (wave_seconds * 1_000_000_000))
                if w > win:
                    win, used = w, 0
                allowed = used < budget
                if allowed:
                    used += 1
                out.append((host, int(ev), w, allowed))
        state.update((win, used))
        yield pd.DataFrame(out, columns=["host", "event_id", "win",
                                         "allowed"])

    return requests.groupBy("host").applyInPandasWithState(
        gate, GATE_OUTPUT_SCHEMA, GATE_STATE_SCHEMA, "append",
        "NoTimeout")


def run_available_now(query_df: DataFrame, checkpoint_dir: str,
                      sink_table: str, output_mode: str = "complete"
                      ) -> None:
    """Drain a streaming DataFrame into a memory sink and wait (test /
    batch-catchup helper). Aggregations use 'complete' here: in a
    one-shot availableNow drain the watermark never advances past the
    last event, so 'append' would emit no finalized windows."""
    q = (query_df.writeStream.format("memory")
         .queryName(sink_table)
         .outputMode(output_mode)
         .option("checkpointLocation", checkpoint_dir)
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()
