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
    # Patch the module-level defaults in place instead of reloading the
    # module: importlib.reload re-executes store.py in the SAME module
    # namespace, swapping the CommitError/SnapshotTable classes under
    # every other test module that bound them at collection time — an
    # `except CommitError` then misses the new class (observed as an
    # order-dependent failure in test_snapshot_table_rejects_unknown_
    # reset). The env-var parsing itself is a one-line float()/int().
    import adscraper_spark.store as store_mod

    monkeypatch.setattr(store_mod, "VACUUM_MIN_AGE_SECONDS", 0.0)
    monkeypatch.setattr(store_mod, "VACUUM_RETAIN_LAST", 3)
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


def test_concurrent_intake_append_diverts_to_staging(
        spark, committed_engine, monkeypatch):
    """Intake-vs-intake race: P1 gates (anti-join against admitted
    HEAD), then P2 appends the same URL before P1's fold. P1's cached
    gate is stale — appending it would admit the URL twice. The locked
    admitted-id re-check must divert P1 to staging, whose drain
    re-gates against the then-current log."""
    from pyspark.sql import functions as F

    from adscraper_spark.config import CrawlConfig
    from adscraper_spark.engine import CrawlEngine

    _spec, eng = committed_engine
    url = "https://never-crawled.test/intake-race"
    # P2: a second engine on the SAME workdir (the cross-process setup)
    eng2 = CrawlEngine(eng.spark, eng.pages_path, None, eng.workdir,
                       CrawlConfig(wave_seconds=10, default_budget=3,
                                   max_waves=4, max_depth=1))
    orig_gate = eng._gated_admissions

    def gate_then_other_intake_lands(df):
        res = orig_gate(df).cache()
        res.count()  # materialize P1's gate against the CURRENT log
        assert eng2.admit_seeds([(71, url)]) == 1  # P2 wins the race
        return res

    monkeypatch.setattr(eng, "_gated_admissions",
                        gate_then_other_intake_lands)
    n = eng.admit_seeds([(70, url)])
    # P1 diverted: its stale gate was never appended; the staging
    # anti-join already saw P2's row, so 0 newly admitted
    assert n == 0
    monkeypatch.undo()
    eng._drain_late_seeds(eng.last_committed_wave() + 1)
    assert eng.admitted.read(spark).filter(
        F.col("url") == url).count() == 1


def test_bootstrap_crash_replay_does_not_double_admit(
        spark, tmp_path, monkeypatch):
    """A bootstrap that dies between its admitted append and
    _commit_wave(0) leaves orphan table snapshots with no manifest.
    Re-running bootstrap (the natural crash-recovery sequence) must
    reset them first — appending on top would give every seed two
    pending rows durably (double fetch in wave 1)."""
    from pyspark.sql import functions as F

    from adscraper_spark.config import CrawlConfig
    from adscraper_spark.corpus import CorpusSpec, gen_seeds, \
        write_corpus_parquet
    from adscraper_spark.engine import CrawlEngine

    spec = CorpusSpec(n_pages=60, n_hosts=4, seed=13)
    paths = write_corpus_parquet(spec, str(tmp_path / "c"))
    cfg = CrawlConfig(wave_seconds=10, max_waves=1)
    eng = CrawlEngine(spark, paths["pages"], paths["robots"],
                      str(tmp_path / "w"), cfg)
    seeds = [(i, u) for i, u in enumerate(gen_seeds(spec, n_seeds=3))]

    def crash(wave, stats):
        raise RuntimeError("injected crash before wave-0 manifest")

    monkeypatch.setattr(eng, "_commit_wave", crash)
    with pytest.raises(RuntimeError, match="injected crash"):
        eng.bootstrap(seeds)
    monkeypatch.undo()
    # crash recovery: a fresh engine re-runs the same bootstrap
    eng2 = CrawlEngine(spark, paths["pages"], paths["robots"],
                       str(tmp_path / "w"), cfg)
    n = eng2.bootstrap(seeds)
    assert n == len(seeds)
    dupes = (eng2.admitted.read(spark).groupBy("url").count()
             .filter(F.col("count") > 1).count())
    assert dupes == 0
    assert eng2.admitted.read(spark).count() == len(seeds)


def test_expire_age_clock_counts_from_supersession(spark, tmp_path):
    """A snapshot's reader-grace must run from the moment it was
    SUPERSEDED, not from its creation: a reader that pinned HEAD
    moments before a new commit holds a snapshot whose own mtime can be
    arbitrarily old."""
    import os as _os

    t = SnapshotTable(str(tmp_path / "ages"))
    t.append(spark.createDataFrame([(1,)], "a int"))  # snap 1
    t.append(spark.createDataFrame([(2,)], "a int"))  # snap 2
    # both manifests were CREATED long ago...
    for sid in (1, 2):
        _os.utime(_os.path.join(t.path, "meta", f"snap-{sid}.json"),
                  (0, 0))
    t.append(spark.createDataFrame([(3,)], "a int"))  # snap 3 = HEAD, fresh
    res = t.expire_snapshots(retain_last=1, min_age_seconds=3600)
    # snap 2 was superseded JUST NOW (snap 3 is fresh) → spared for a
    # reader that pinned it moments ago; snap 1's successor is ancient
    # → genuinely expired
    assert res["removed_snapshots"] == [1]
    assert [r["a"] for r in t.read(spark, 2).collect()] == [1, 2]
