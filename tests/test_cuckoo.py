"""Cuckoo-filter seen-set (cuckoo.py): soundness properties, delete,
persistence, saturation fallback, and engine parity with
seen_filter='cuckoo' (SURVEY.md §2 T3/Z3 — the deletable alternative to
the bloom segments)."""

import numpy as np
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from adscraper_spark.cuckoo import (
    STASH_MAX, CuckooSegment, CuckooStore, make_seen_store,
)

URLS = st.lists(
    st.text(alphabet="abcdefghij/.-:0123456789", min_size=1, max_size=40)
    .map(lambda s: "https://h.test/" + s),
    min_size=0, max_size=300, unique=True)


@given(URLS)
@settings(max_examples=30, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
def test_no_false_negatives(urls):
    """THE soundness contract: a filter miss means 'definitely new' to
    the engine (skips the exact anti-join), so every inserted key must
    read as present — under any insert order, eviction chain, stash."""
    seg = CuckooSegment.sized_for(max(64, len(urls)))
    seg.add_many(urls)
    assert all(seg.might_contain_many(urls))


@given(URLS, st.data())
@settings(max_examples=30, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
def test_delete_preserves_survivors(urls, data):
    """Deleting previously-inserted keys never produces a false negative
    for a key that was NOT deleted (the sound-deletion contract)."""
    seg = CuckooSegment.sized_for(max(64, len(urls)))
    seg.add_many(urls)
    k = data.draw(st.integers(0, len(urls)))
    deleted, kept = urls[:k], urls[k:]
    for u in deleted:
        seg.delete(u)
    assert all(seg.might_contain_many(kept))


def test_delete_actually_removes():
    urls = [f"https://h{i % 7}.test/p/{i}" for i in range(2000)]
    seg = CuckooSegment.sized_for(2000)
    seg.add_many(urls)
    gone = urls[::2]
    assert seg.delete_many(gone) == len(gone)
    # survivors all present; deleted mostly absent (a 16-bit fingerprint
    # collision with a survivor can keep a few 'present' — bound it)
    assert all(seg.might_contain_many(urls[1::2]))
    resurrected = sum(seg.might_contain_many(gone))
    assert resurrected < len(gone) * 0.01


def test_overflow_saturates_but_stays_sound():
    """Inserting far past capacity must exhaust eviction chains into the
    stash and finally saturate — never a false negative."""
    seg = CuckooSegment(nbuckets=64)  # capacity 256 slots
    urls = [f"https://h.test/p/{i}" for i in range(2000)]
    seg.add_many(urls)
    assert seg.saturated  # 2000 keys cannot fit 256+stash slots
    assert all(seg.might_contain_many(urls))
    # saturated delete is a refused no-op (membership is all-maybe)
    assert seg.delete(urls[0]) is False


def test_stash_catches_chain_exhaustion_before_saturation():
    """Fill to just past table capacity: orphans land in the stash (and
    remain findable) without tripping saturation."""
    seg = CuckooSegment(nbuckets=64)
    urls = [f"https://h.test/p/{i}" for i in range(260)]
    seg.add_many(urls)
    assert not seg.saturated
    assert 0 < len(seg.stash) <= STASH_MAX
    assert all(seg.might_contain_many(urls))


def test_fpr_sane():
    seg = CuckooSegment.sized_for(5000)
    seg.add_many(f"https://h{i % 11}.test/a/{i}" for i in range(5000))
    probes = [f"https://other{i}.test/b/{i}" for i in range(20000)]
    fpr = sum(seg.might_contain_many(probes)) / len(probes)
    assert fpr < 0.01  # 16-bit fp, 4-slot buckets → ~1e-4 expected


def test_persistence_roundtrip(tmp_path):
    seg = CuckooSegment(nbuckets=64)
    urls = [f"https://h.test/p/{i}" for i in range(300)]
    seg.add_many(urls)  # forces stash entries at this size
    path = str(tmp_path / "wave-3.npz")
    seg.save(path)
    back = CuckooSegment.load(path)
    assert back.nbuckets == seg.nbuckets
    assert back.stash == seg.stash
    assert back.saturated == seg.saturated
    assert np.array_equal(back.table, seg.table)
    assert all(back.might_contain_many(urls))


def test_store_versioned_merge(tmp_path):
    """Same cumulative wave-versioning contract as BloomStore: a later
    wave's update seeds from the latest at-or-before segment."""
    store = CuckooStore(str(tmp_path / "c"), num_partitions=4,
                       expected_keys_per_partition=1000)
    store.update_segment(1, wave=2, urls=["https://a.test/1"])
    store.update_segment(1, wave=5, urls=["https://a.test/2"])
    seg = store.load_segment(1, wave=9)
    assert seg.might_contain("https://a.test/1")
    assert seg.might_contain("https://a.test/2")
    # reading back at the earlier wave excludes the later write
    early = store.load_segment(1, wave=2)
    assert early.might_contain("https://a.test/1")
    assert not early.might_contain("https://a.test/2")
    # delete round-trips through the store files too
    store.delete_segment_urls(1, wave=9, urls=["https://a.test/1"])
    seg2 = store.load_segment(1, wave=9)
    assert not seg2.might_contain("https://a.test/1")
    assert seg2.might_contain("https://a.test/2")


def test_factory():
    from adscraper_spark.bloom import BloomStore

    assert isinstance(make_seen_store("bloom", "/tmp/x", 2), BloomStore)
    assert isinstance(make_seen_store("cuckoo", "/tmp/x", 2), CuckooStore)
    with pytest.raises(ValueError):
        make_seen_store("roaring", "/tmp/x", 2)


def test_config_validates_seen_filter():
    from adscraper_spark.config import CrawlConfig

    with pytest.raises(ValueError):
        CrawlConfig(seen_filter="xor")
    assert CrawlConfig(seen_filter="cuckoo").seen_filter == "cuckoo"


# ---------------------------------------------------------------------------
# engine parity: the whole crawl is filter-structure-invariant
# ---------------------------------------------------------------------------

def test_engine_with_cuckoo_matches_simulator(spark, corpus, corpus_spec,
                                              robots_rows, seeds,
                                              crawl_config, sim_result,
                                              tmp_path):
    """seen_filter='cuckoo' must reproduce the exact crawl order and
    seen-set of the simulator (and therefore of the default bloom run —
    the prefilter structure can never change admission semantics)."""
    from dataclasses import replace

    from adscraper_spark.engine import CrawlEngine

    cfg = replace(crawl_config, seen_filter="cuckoo")
    eng = CrawlEngine(spark, corpus["pages"], corpus["robots"],
                      str(tmp_path / "w"), cfg)
    eng.bootstrap(seeds)
    eng.run()
    assert eng.crawl_order() == sim_result.order
    assert eng.seen_set() == sim_result.seen
    # the filter actually ran as cuckoo: npz segments on disk
    import glob
    import os
    segs = glob.glob(os.path.join(str(tmp_path / "w"), "bloom",
                                  "p*", "wave-*.npz"))
    assert segs


def test_engine_retract_seen_requires_cuckoo(spark, corpus, tmp_path):
    from adscraper_spark.config import CrawlConfig
    from adscraper_spark.engine import CrawlEngine

    eng = CrawlEngine(spark, corpus["pages"], corpus["robots"],
                      str(tmp_path / "w"), CrawlConfig())
    with pytest.raises(ValueError):
        eng.retract_seen(spark.range(0).selectExpr(
            "cast(null as string) url", "cast(null as string) host"), 1)


def test_engine_retract_seen_clears_prefilter(spark, corpus, corpus_spec,
                                              robots_rows, seeds,
                                              tmp_path):
    """Recrawl-expiry primitive: after retract_seen, the retracted URLs
    probe as definitely-new again in the per-partition segments."""
    from adscraper_spark.config import CrawlConfig
    from adscraper_spark.engine import CrawlEngine

    cfg = CrawlConfig(wave_seconds=10, default_budget=3, max_waves=2,
                      max_depth=1, seen_filter="cuckoo")
    eng = CrawlEngine(spark, corpus["pages"], corpus["robots"],
                      str(tmp_path / "w"), cfg)
    eng.bootstrap(seeds)
    eng.run()
    adm = eng.admitted.read(spark).filter("state_initial = 'pending'") \
        .select("url", "host").limit(5)
    target = [(r["url"], r["host"]) for r in adm.collect()]
    assert target
    wave = eng.last_committed_wave() + 1
    eng.retract_seen(spark.createDataFrame(target, "url string, host string"),
                     wave)
    from adscraper_spark.bloom import partition_for_host

    for url, host in target:
        p = partition_for_host(host or "", cfg.bloom_partitions)
        seg = eng.bloom.load_segment(p, wave)
        assert not seg.might_contain(url)


def test_segment_saves_are_durable(tmp_path, monkeypatch):
    """Both filter stores must route their segment rename through
    bloom.durable_replace (fsync data + dir): the engine folds the wave
    manifest only AFTER the filter update, so a power loss that keeps
    the manifest but tears the filter file would turn a durably-admitted
    URL into a filter MISS — the false-negative direction the seen
    filter must never err in."""
    import adscraper_spark.bloom as bloom_mod
    import adscraper_spark.cuckoo as cuckoo_mod
    from adscraper_spark.bloom import BloomSegment

    calls = []
    real = bloom_mod.durable_replace

    def spy(tmp, path):
        calls.append(path)
        real(tmp, path)

    monkeypatch.setattr(bloom_mod, "durable_replace", spy)
    monkeypatch.setattr(cuckoo_mod, "durable_replace", spy)

    bpath = str(tmp_path / "wave-0.npy")
    bseg = BloomSegment.sized_for(100)
    bseg.add("https://h.test/a")
    bseg.save(bpath)
    assert calls == [bpath]
    assert BloomSegment.load(bpath).might_contain("https://h.test/a")

    cpath = str(tmp_path / "wave-0.npz")
    cseg = CuckooSegment.sized_for(100)
    cseg.add("https://h.test/a")
    cseg.save(cpath)
    assert calls == [bpath, cpath]
    assert CuckooSegment.load(cpath).might_contain("https://h.test/a")
