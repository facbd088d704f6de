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


def test_admit_seeds_mid_window_stages_then_drains(
        spark, small, tmp_path_factory):
    """checkpoint_every>1: a seed batch landing inside an open
    checkpoint window must not error and must not fold into the last
    manifest (that would pin the window's uncommitted appends). It is
    staged durably and drained into the frontier at the next wave
    boundary — exactly once, even across a crash replay."""
    spec, paths = small
    cfg = CrawlConfig(wave_seconds=10, default_budget=3, max_waves=6,
                      max_depth=0, checkpoint_every=3)
    work = str(tmp_path_factory.mktemp("wstage"))
    eng = CrawlEngine(spark, paths["pages"], paths["robots"], work, cfg)
    eng.bootstrap([(0, spec.page_url(0, 0))])
    eng.run_wave(1, commit=False)  # window opens (durable marker)
    late_url = spec.page_url(3, 0)
    assert eng.admit_seeds([(5, late_url)]) == 1
    # staged, NOT in the admitted log yet
    adm = eng.admitted.read(spark)
    assert adm.filter(adm.url == late_url).count() == 0
    assert eng.late_seeds.current_snapshot_id() == 1
    # next wave boundary drains it into the frontier
    stats = eng.run_wave(2, commit=False)
    assert stats.get("late_seeds") == 1
    adm = eng.admitted.read(spark)
    assert adm.filter(adm.url == late_url).count() == 1

    # hard crash inside the window: a fresh engine rolls the admitted
    # log back past the drain, then the replay re-drains exactly once
    eng2 = CrawlEngine(spark, paths["pages"], paths["robots"], work, cfg)
    eng2.run()
    adm2 = eng2.admitted.read(spark)
    assert adm2.filter(adm2.url == late_url).count() == 1
    assert (adm2.groupBy("url").count().filter("count > 1").count()
            == 0)
    assert late_url in eng2.seen_set()  # it actually got crawled
    # the drain pin is durable, so a completed run re-drains nothing
    assert eng2._late_drained_pin() == \
        eng2.late_seeds.current_snapshot_id()


def test_late_drain_on_terminal_wave_is_pinned(
        spark, small, tmp_path_factory):
    """A staged batch drained by a wave that then plans NOTHING (e.g.
    invalid-only URLs on an exhausted frontier) must still get a
    durable manifest: without it the admitted append is unpinned, rolls
    back on every later run(), and re-drains forever while its stats
    never land anywhere."""
    import json
    import os

    spec, paths = small
    cfg = CrawlConfig(wave_seconds=10, default_budget=3, max_waves=6,
                      max_depth=0, checkpoint_every=3)
    work = str(tmp_path_factory.mktemp("wterm"))
    eng = CrawlEngine(spark, paths["pages"], paths["robots"], work, cfg)
    eng.bootstrap([(0, spec.page_url(0, 0))])
    eng.run_wave(1, commit=False)           # window opens; seed fetched
    assert eng.admit_seeds([(9, "::not-a-url::")]) == 1  # staged
    stats = eng.run_wave(2, commit=False)   # drain + nothing to plan
    assert stats == {"planned": 0, "late_seeds": 1}
    # the drain got a durable manifest despite commit=False
    assert eng.last_committed_wave() == 2
    with open(eng._manifest_path(2)) as f:
        m = json.load(f)
    assert m["late_seeds_drained"] == eng.late_seeds.current_snapshot_id()
    assert m["stats"]["late_seeds"] == 1
    assert not os.path.exists(eng._window_marker)
    n_admitted = eng.admitted.read(spark).count()
    # a fresh engine neither loses the row nor re-drains a duplicate
    eng2 = CrawlEngine(spark, paths["pages"], paths["robots"], work, cfg)
    eng2.run()
    assert eng2.admitted.read(spark).count() == n_admitted
    adm = eng2.admitted.read(spark)
    assert adm.filter(adm.url == "::not-a-url::").count() == 1


def test_cross_process_intake_sees_window_marker(
        spark, small, tmp_path_factory):
    """A SEPARATE intake process (second engine instance on the same
    workdir) must take the staging path while another process's window
    is open — the durable marker is what crosses the process
    boundary."""
    import json

    spec, paths = small
    cfg = CrawlConfig(wave_seconds=10, default_budget=3, max_waves=6,
                      max_depth=0, checkpoint_every=4)
    work = str(tmp_path_factory.mktemp("wmark"))
    eng = CrawlEngine(spark, paths["pages"], paths["robots"], work, cfg)
    eng.bootstrap([(0, spec.page_url(0, 0))])
    eng.run_wave(1, commit=False)
    import os

    assert os.path.exists(eng._window_marker)
    with open(eng._manifest_path(eng.last_committed_wave())) as f:
        pin_before = json.load(f)["snapshots"]["admitted"]

    intake = CrawlEngine(spark, paths["pages"], paths["robots"], work,
                         cfg)
    assert intake._window_stats == []  # fresh process analog
    assert intake.admit_seeds([(7, spec.page_url(2, 0))]) == 1
    assert intake.late_seeds.current_snapshot_id() >= 1
    with open(eng._manifest_path(eng.last_committed_wave())) as f:
        m = json.load(f)
    assert m["snapshots"]["admitted"] == pin_before  # no fold happened
    # completing the run closes the window durably and folds the staged
    # batch into the crawl exactly once
    import os as _os

    eng.run()
    assert not _os.path.exists(eng._window_marker)
    adm = eng.admitted.read(spark)
    assert adm.filter(adm.url == spec.page_url(2, 0)).count() == 1


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

def test_politeness_gate_stream_matches_batch_and_carries_state(
        spark, tmp_path):
    """The applyInPandasWithState politeness gate must produce exactly
    the batch w2 window decisions, INCLUDING state carried across
    micro-batches (two time-ordered files, maxFilesPerTrigger=1)."""
    import os

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from adscraper_spark.streaming import (
        politeness_gate_stream, run_available_now,
    )

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    req = ev.select(
        F.concat(F.lit("host-"), (F.col("user_id") % 10).cast("string"))
        .alias("host"), "event_id", "ts")
    reqw = req.withColumn(
        "win", F.floor(F.unix_micros(F.col("ts").cast("timestamp"))
                       / (604_800 * 1_000_000)).cast("long"))
    w = Window.partitionBy("host", "win").orderBy("ts", "event_id")
    expected = {(r["host"], r["event_id"]): (r["win"], r["rn"] <= 8)
                for r in reqw.withColumn(
                    "rn", F.row_number().over(w)).collect()}

    # two time-ordered source files -> two micro-batches
    ts_sorted = [r["ts"] for r in req.select("ts").orderBy("ts").collect()]
    cut = ts_sorted[len(ts_sorted) // 2]
    src = str(tmp_path / "reqs")
    for i, part in enumerate((req.filter(F.col("ts") < cut),
                              req.filter(F.col("ts") >= cut))):
        d = str(tmp_path / f"stage{i}")
        part.coalesce(1).write.parquet(d)
        f = [n for n in os.listdir(d) if n.endswith(".parquet")][0]
        os.makedirs(src, exist_ok=True)
        dst = os.path.join(src, f"part-{i}.parquet")
        os.rename(os.path.join(d, f), dst)
        os.utime(dst, (1_700_000_000 + i * 10, 1_700_000_000 + i * 10))

    stream = (spark.readStream
              .schema("host string, event_id long, ts timestamp_ntz")
              .option("maxFilesPerTrigger", 1).parquet(src))
    gated = politeness_gate_stream(stream, budget=8, wave_seconds=604_800)
    run_available_now(gated, str(tmp_path / "ck"), "gate_out",
                      output_mode="append")
    got = {(r["host"], r["event_id"]): (r["win"], r["allowed"])
           for r in spark.table("gate_out").collect()}
    assert got == expected
    n_deferred = sum(1 for _, a in got.values() if not a)
    assert n_deferred > 0  # non-vacuous: some windows overflow
    # a (host, win) straddling the file cut proves cross-batch state
    cut_win = int(cut.timestamp() // 604_800)
    straddle = [k for k, v in expected.items() if v[0] == cut_win]
    assert straddle, "no window straddles the micro-batch boundary"
