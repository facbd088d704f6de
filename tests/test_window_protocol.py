"""Cross-process window-protocol races (the marker + flock mutex).

Three hazards, each reproduced deterministically by injecting the racing
step at the exact point the protocol must tolerate it:

1. TOCTOU on the direct-fold intake path: the window opens WHILE the
   intake's multi-second gating jobs run — the locked re-check must
   divert the batch to staging instead of folding it (a fold there
   would pin the wave's uncommitted admitted append; crash rollback
   would replay it as duplicates).
2. Rollback must hold the window-open marker for its whole duration —
   a concurrent intake seeing no marker mid-rollback would direct-fold
   an admission that reset_to then wipes (silent seed loss).
3. expire_snapshots must not delete a manifest a concurrent reader may
   hold between pinning its id and opening it (age grace, mirroring
   the data-dir grace).
"""

import json
import os

import pytest

from adscraper_spark.config import CrawlConfig
from adscraper_spark.corpus import (CorpusSpec, gen_seeds,
                                    write_corpus_parquet)
from adscraper_spark.engine import CrawlEngine
from adscraper_spark.store import SnapshotTable


@pytest.fixture()
def committed_engine(spark, tmp_path_factory):
    """Engine with one committed wave, window closed — the state from
    which the direct-fold path is legal."""
    spec = CorpusSpec(n_pages=120, n_hosts=6, seed=7)
    out = str(tmp_path_factory.mktemp("wproto"))
    paths = write_corpus_parquet(spec, out)
    cfg = CrawlConfig(wave_seconds=10, default_budget=3, max_waves=4,
                      max_depth=1)
    work = str(tmp_path_factory.mktemp("wprotowork"))
    eng = CrawlEngine(spark, paths["pages"], paths["robots"], work, cfg)
    eng.bootstrap([(i, u) for i, u in
                   enumerate(gen_seeds(spec, n_seeds=4))])
    eng.run_wave(1, commit=True)
    assert not os.path.exists(eng._window_marker)
    return spec, eng


def test_window_opening_during_gating_diverts_to_staging(
        spark, committed_engine, monkeypatch):
    spec, eng = committed_engine
    with open(eng._manifest_path(eng.last_committed_wave())) as f:
        pin_before = json.load(f)["snapshots"]["admitted"]
    staged_before = eng.late_seeds.current_snapshot_id()

    orig_gate = eng._gated_admissions

    def gate_then_window_opens(df):
        res = orig_gate(df)
        # another process opens its wave window while our gating jobs
        # are still running (the multi-second TOCTOU gap)
        with open(eng._window_marker, "w") as f:
            f.write("2")
        return res

    monkeypatch.setattr(eng, "_gated_admissions", gate_then_window_opens)
    n = eng.admit_seeds([(50, "https://never-crawled.test/fresh")])
    assert n == 1  # reported admitted — durably, via staging
    assert eng.late_seeds.current_snapshot_id() > staged_before
    with open(eng._manifest_path(eng.last_committed_wave())) as f:
        m = json.load(f)
    # the fold did NOT happen: the previous manifest's admitted pin is
    # untouched (folding under an open window is the replay hazard)
    assert m["snapshots"]["admitted"] == pin_before
    os.remove(eng._window_marker)


def test_default_commit_wave_keeps_marker_up_until_commit(
        committed_engine, monkeypatch):
    """A commit=True wave (the checkpoint_every=1 DEFAULT) also spends
    multi-second phases appending tables before its manifest lands —
    the window marker must be up for that whole span, or a concurrent
    intake direct-fold pins the wave's uncommitted admitted append into
    the previous manifest (replayed as duplicates after a crash
    rollback). Regression test: the marker used to be published only
    for commit=False waves."""
    _spec, eng = committed_engine

    seen_at_append = []
    orig_append = eng.results.append

    def observing_append(df):
        seen_at_append.append(os.path.exists(eng._window_marker))
        return orig_append(df)

    monkeypatch.setattr(eng.results, "append", observing_append)

    seen_at_commit = []
    orig_commit = eng._commit_wave

    def observing_commit(wave, stats):
        seen_at_commit.append(os.path.exists(eng._window_marker))
        return orig_commit(wave, stats)

    monkeypatch.setattr(eng, "_commit_wave", observing_commit)
    stats = eng.run_wave(2, commit=True)
    assert stats["planned"] > 0
    # marker was up during the mid-wave table append AND still up at
    # commit time; _commit_wave retracted it with the durable manifest
    assert seen_at_append and all(seen_at_append)
    assert seen_at_commit == [True]
    assert not os.path.exists(eng._window_marker)


def test_bootstrap_keeps_marker_up_until_commit(spark, tmp_path,
                                                monkeypatch):
    """bootstrap() has the same uncommitted-append window before its
    wave-0 manifest."""
    spec = CorpusSpec(n_pages=60, n_hosts=4, seed=11)
    paths = write_corpus_parquet(spec, str(tmp_path / "c"))
    eng = CrawlEngine(spark, paths["pages"], paths["robots"],
                      str(tmp_path / "w"),
                      CrawlConfig(wave_seconds=10, max_waves=1))

    seen_at_append = []
    orig_append = eng.admitted.append

    def observing_append(df):
        seen_at_append.append(os.path.exists(eng._window_marker))
        return orig_append(df)

    monkeypatch.setattr(eng.admitted, "append", observing_append)
    eng.bootstrap([(i, u) for i, u in
                   enumerate(gen_seeds(spec, n_seeds=3))])
    assert seen_at_append == [True]
    assert not os.path.exists(eng._window_marker)


def test_rollback_holds_marker_through_resets(committed_engine,
                                              monkeypatch):
    _spec, eng = committed_engine
    seen_during_reset = []
    orig_reset = eng.admitted.reset_to

    def observing_reset(snapshot_id):
        seen_during_reset.append(os.path.exists(eng._window_marker))
        return orig_reset(snapshot_id)

    monkeypatch.setattr(eng.admitted, "reset_to", observing_reset)
    assert not os.path.exists(eng._window_marker)
    eng._rollback_to_last_commit()
    # the marker was up while tables were being reset (concurrent
    # intake would stage, not direct-fold) and is gone afterwards
    assert seen_during_reset == [True]
    assert not os.path.exists(eng._window_marker)


def test_expire_spares_fresh_manifests_and_their_dirs(spark, tmp_path):
    t = SnapshotTable(str(tmp_path / "fresh"))
    t.append(spark.createDataFrame([(1,)], "a int"))
    t.overwrite(spark.createDataFrame([(2,)], "a int"))
    # age the DATA dirs so only the manifest grace can protect snap 1
    data_root = os.path.join(t.path, "data")
    for name in os.listdir(data_root):
        os.utime(os.path.join(data_root, name), (0, 0))
    res = t.expire_snapshots(retain_last=1, min_age_seconds=3600)
    # snap-1.json is younger than the grace: spared, and the data dir
    # only it references must be spared with it (a reader holding id 1
    # must still be able to read it end-to-end)
    assert res["removed_snapshots"] == []
    assert [r["a"] for r in t.read(spark, 1).collect()] == [1]
    # with the grace waived both go
    res = t.expire_snapshots(retain_last=1, min_age_seconds=0.0)
    assert res["removed_snapshots"] == [1]
    assert not os.path.exists(
        os.path.join(t.path, "meta", "snap-1.json"))


def test_vacuum_defaults_come_from_table_config(spark, tmp_path,
                                                monkeypatch):
    monkeypatch.setenv("ADSCRAPER_SPARK_VACUUM_MIN_AGE", "0.0")
    monkeypatch.setenv("ADSCRAPER_SPARK_VACUUM_RETAIN_LAST", "3")
    import importlib

    import adscraper_spark.store as store_mod
    importlib.reload(store_mod)
    try:
        t = store_mod.SnapshotTable(str(tmp_path / "cfg"))
        assert t.vacuum_min_age_seconds == 0.0
        assert t.vacuum_retain_last == 3
        for i in range(5):
            t.append(spark.createDataFrame([(i,)], "a int"))
        res = t.expire_snapshots()  # table-level defaults apply
        assert res["removed_snapshots"] == [1, 2]  # retain_last=3 + HEAD
        t2 = store_mod.SnapshotTable(str(tmp_path / "cfg2"),
                                     vacuum_min_age_seconds=9.0,
                                     vacuum_retain_last=1)
        assert t2.vacuum_min_age_seconds == 9.0
        assert t2.vacuum_retain_last == 1
    finally:
        monkeypatch.undo()
        importlib.reload(store_mod)


def test_seen_filter_update_precedes_durable_fold(
        spark, committed_engine, monkeypatch):
    """Ordering invariant of the direct-fold intake: the seen-filter
    update must land BEFORE the append+manifest-fold makes the rows
    durable. A crash between a durable fold and a not-yet-run filter
    update leaves a durably-admitted URL absent from the filter — it
    probes 'fresh', skips the exact anti-join (engine wave path), and
    is admitted+crawled twice. The filter-first order's crash window
    errs as a false POSITIVE instead (extra anti-join work only)."""
    from pyspark.sql import functions as F

    _spec, eng = committed_engine
    with open(eng._manifest_path(eng.last_committed_wave())) as f:
        pin_before = json.load(f)["snapshots"]["admitted"]
    url = "https://never-crawled.test/ordering"

    def crashing_update(df, wave):
        raise RuntimeError("injected crash at filter update")

    monkeypatch.setattr(eng, "_update_bloom_distributed", crashing_update)
    with pytest.raises(RuntimeError, match="injected crash"):
        eng.admit_seeds([(60, url)])
    # nothing became durable before the crash point: no manifest fold,
    # no admitted rows — so the post-recovery retry admits exactly once
    with open(eng._manifest_path(eng.last_committed_wave())) as f:
        assert json.load(f)["snapshots"]["admitted"] == pin_before
    assert eng.admitted.read(spark).filter(F.col("url") == url).count() == 0
    monkeypatch.undo()
    assert eng.admit_seeds([(60, url)]) == 1
    assert eng.admitted.read(spark).filter(F.col("url") == url).count() == 1
