"""Structured Streaming surfaces: seed intake (exactly-once) and
watermarked politeness monitoring."""

import datetime as dt
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from adscraper_spark.config import CrawlConfig
from adscraper_spark.corpus import CorpusSpec, write_corpus_parquet
from adscraper_spark.engine import CrawlEngine
from adscraper_spark.streaming import (
    admit_seed_stream, host_fetch_rates, run_available_now,
)


@pytest.fixture(scope="module")
def small(tmp_path_factory):
    spec = CorpusSpec(n_pages=80, n_hosts=5, seed=3)
    out = str(tmp_path_factory.mktemp("c"))
    return spec, write_corpus_parquet(spec, out)


def _write_seed_file(path: str, rows: list[tuple[int, str, int | None]]):
    t = pa.Table.from_pylist(
        [{"seq": s, "url": u, "ad_id": a} for s, u, a in rows],
        schema=pa.schema([("seq", pa.int64()), ("url", pa.string()),
                          ("ad_id", pa.int64())]))
    pq.write_table(t, path)


def test_streaming_seed_intake_idempotent(spark, small, tmp_path_factory):
    spec, paths = small
    cfg = CrawlConfig(wave_seconds=10, default_budget=2, max_waves=3,
                      max_depth=1)
    work = str(tmp_path_factory.mktemp("w"))
    seeds_dir = str(tmp_path_factory.mktemp("seeds"))
    ckpt = str(tmp_path_factory.mktemp("ckpt"))
    eng = CrawlEngine(spark, paths["pages"], paths["robots"], work, cfg)
    eng.bootstrap([(0, spec.page_url(0, 0))])

    _write_seed_file(os.path.join(seeds_dir, "batch1.parquet"),
                     [(1, spec.page_url(1, 0), None),
                      (2, spec.page_url(2, 0), None)])
    q = admit_seed_stream(eng, seeds_dir, ckpt)
    q.awaitTermination()
    n1 = eng.admitted.read(spark).count()
    assert n1 == 3

    # second file includes a DUPLICATE of an admitted URL + one new
    _write_seed_file(os.path.join(seeds_dir, "batch2.parquet"),
                     [(3, spec.page_url(1, 0), None),
                      (4, spec.page_url(3, 0), None)])
    q = admit_seed_stream(eng, seeds_dir, ckpt)
    q.awaitTermination()
    adm = eng.admitted.read(spark)
    assert adm.count() == 4  # duplicate dropped, new one admitted
    assert adm.groupBy("url").count().filter("count > 1").count() == 0

    # the crawl drains everything that streamed in
    stats = eng.run()
    assert sum(s["planned"] for s in stats) >= 4


def test_admit_seeds_preserves_other_table_snapshots(
        spark, small, tmp_path_factory):
    """Regression: admit_seeds must advance ONLY the admitted snapshot in
    the manifest — re-pinning all tables would make rollback keep a
    concurrent wave's half-committed appends."""
    import json

    spec, paths = small
    cfg = CrawlConfig(wave_seconds=10, default_budget=2, max_waves=2,
                      max_depth=1)
    work = str(tmp_path_factory.mktemp("w2"))
    eng = CrawlEngine(spark, paths["pages"], paths["robots"], work, cfg)
    eng.bootstrap([(0, spec.page_url(0, 0)), (1, spec.page_url(1, 0))])
    eng.run_wave(1)
    last = eng.last_committed_wave()
    with open(eng._manifest_path(last)) as f:
        before = json.load(f)["snapshots"]
    # simulate a mid-commit wave: results gets an orphan append AFTER the
    # manifest was written, then a seed batch lands
    eng.results.append(eng.results.read(spark).limit(1))
    eng.admit_seeds([(9, spec.page_url(2, 0))])
    with open(eng._manifest_path(eng.last_committed_wave())) as f:
        after = json.load(f)["snapshots"]
    assert after["admitted"] > before["admitted"]
    for tbl in ("processed", "results", "ads", "requests", "iframes"):
        assert after[tbl] == before[tbl], tbl
    # rollback discards the orphan results append
    eng._rollback_to_last_commit()
    assert eng.results.current_snapshot_id() == before["results"]


def test_host_fetch_rates_watermarked(spark, tmp_path):
    src_dir = tmp_path / "fetchlog"
    src_dir.mkdir()
    base = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = []
    for i in range(6):
        rows.append({"host": "a.test",
                     "fetch_ts": base + dt.timedelta(seconds=i * 20)})
    rows.append({"host": "b.test", "fetch_ts": base})
    t = pa.Table.from_pylist(rows, schema=pa.schema(
        [("host", pa.string()), ("fetch_ts", pa.timestamp("us"))]))
    pq.write_table(t, str(src_dir / "log.parquet"))

    stream = (spark.readStream
              .schema("host string, fetch_ts timestamp")
              .parquet(str(src_dir)))
    rates = host_fetch_rates(stream, window="1 minute",
                             watermark="2 minutes")
    run_available_now(rates, str(tmp_path / "ck"), "rates_sink")
    got = {(r["host"], r["window_start"].minute): r["fetches"]
           for r in spark.sql("SELECT * FROM rates_sink").collect()}
    # minute 0: a.test fetched at 0,20,40s → 3; minute 1: 60,80,100s → 3
    assert got[("a.test", 0)] == 3
    assert got[("a.test", 1)] == 3
    assert got[("b.test", 0)] == 1