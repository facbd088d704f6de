"""TWO-PROCESS intake stress: a real crawl subprocess (the CLI, its own
JVM) races a real intake process (this one) calling ``admit_seeds``
against the same workdir — the deployment shape the cross-process
window protocol (flock marker mutex + late-seed staging + CAS appends,
engine.py) exists for. The in-process tests simulate the interleavings
deterministically; this one buys actual OS-level concurrency.

Assertions are interleaving-invariant (whichever wave each batch lands
in): exactly-once admission (no URL admitted twice), exactly-once fetch
(no (url, reload) fetched twice), no late seed lost, invalid seeds
quarantined not crawled, and a post-crawl resume drains every pending
row. Timing shifts only WHERE a batch lands (direct fold vs staged vs
post-completion), never whether these hold — so the test cannot flake
on scheduling.
"""

import os
import subprocess
import sys
import time

from adscraper_spark.config import CrawlConfig
from adscraper_spark.corpus import (CorpusSpec, gen_seeds,
                                    write_corpus_parquet)
from adscraper_spark.engine import CrawlEngine

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_live_crawl_subprocess_races_intake(spark, tmp_path_factory):
    spec = CorpusSpec(n_pages=500, n_hosts=12, seed=778)
    tmp = str(tmp_path_factory.mktemp("xproc"))
    paths = write_corpus_parquet(spec, tmp + "/corpus")
    work = tmp + "/work"
    with open(tmp + "/seeds.txt", "w") as f:
        f.write("\n".join(gen_seeds(spec, n_seeds=6)) + "\n")
    # late seeds on hosts the initial crawl never reaches
    # (same_host_only), batched with one invalid URL and replayed
    # prefixes (idempotency under re-delivery)
    late = [f"https://{spec.host_name(h)}/p/{i}"
            for h in range(4, 12) for i in (0, 1, 2)]
    batches = [late[k:k + 5] for k in range(0, len(late), 5)]
    batches[1] = batches[1] + ["%%not a url%%"]
    for i in range(2, len(batches)):
        batches[i] = batches[i] + batches[0][:2]

    crawler = subprocess.Popen(
        [sys.executable, "-m", "adscraper_spark", "crawl",
         "--pages", paths["pages"], "--robots", paths["robots"],
         "--workdir", work, "--crawl-list", tmp + "/seeds.txt",
         "--max-waves", "10", "--max-depth", "2",
         "--default-budget", "2", "--checkpoint-every", "2",
         "--cpus", "8", "--pinned-subset"],
        cwd=REPO, stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
    try:
        cfg = CrawlConfig(wave_seconds=10, default_budget=2,
                          max_waves=10, max_depth=2, checkpoint_every=2)
        eng = CrawlEngine(spark, paths["pages"], paths["robots"],
                          work, cfg)
        # wait for the crawler's own bootstrap so this process never
        # bootstraps (admit_seeds would, on an empty workdir)
        deadline = time.time() + 180
        while not os.path.exists(os.path.join(work, "wave-0.json")):
            assert crawler.poll() is None, "crawler died pre-bootstrap"
            assert time.time() < deadline, "bootstrap timeout"
            time.sleep(0.3)
        sent = 0
        for b in batches:
            eng.admit_seeds([(10_000 + sent + j, u)
                             for j, u in enumerate(b)])
            sent += len(b)
            time.sleep(1.0)
        assert crawler.wait(timeout=300) == 0
    finally:
        if crawler.poll() is None:
            crawler.kill()

    # resume with wave headroom: drains anything staged/pending
    cfg2 = CrawlConfig(wave_seconds=10, default_budget=2, max_waves=40,
                       max_depth=2, checkpoint_every=2)
    eng2 = CrawlEngine(spark, paths["pages"], paths["robots"],
                       work, cfg2)
    eng2.run()

    adm = eng2.admitted.read(spark)
    proc = eng2.processed.read(spark)
    res = eng2.results.read(spark)
    assert adm.groupBy("url").count().filter("count > 1").count() == 0
    assert (res.groupBy("url", "reload").count()
            .filter("count > 1").count() == 0)
    # every admissible row fetched exactly once after the drain
    assert (adm.filter("state_initial = 'pending'")
            .join(proc, "url", "left_anti").count() == 0)
    admitted_urls = {r["url"] for r in adm.select("url").collect()}
    assert not (set(late) - admitted_urls), "late seed lost"
    quarantined = (adm.filter("url = '%%not a url%%'")
                   .select("state_initial").collect())
    assert [r["state_initial"] for r in quarantined] == ["invalid"]
    assert proc.filter("url = '%%not a url%%'").count() == 0


_CHILD_INTAKE = """
import sys, time
from adscraper_spark.config import CrawlConfig
from adscraper_spark.engine import CrawlEngine
from adscraper_spark.session import build_session

pages, robots, work = sys.argv[1:4]
urls = sys.argv[4].split(",")
base_seq = int(sys.argv[5])
spark = build_session(app="intake_child", cpus=4, shuffle_partitions=8)
spark.sparkContext.setLogLevel("ERROR")
cfg = CrawlConfig(wave_seconds=10, default_budget=2, max_waves=10,
                  max_depth=2, checkpoint_every=2)
eng = CrawlEngine(spark, pages, robots, work, cfg)
for k in range(0, len(urls), 4):
    eng.admit_seeds([(base_seq + k + j, u)
                     for j, u in enumerate(urls[k:k + 4])])
    time.sleep(0.7)
spark.stop()
"""


def test_two_intake_processes_race_each_other_and_crawler(
        spark, tmp_path_factory):
    """THREE processes on one workdir: the crawl CLI, this process's
    admit_seeds loop, and a child intake process — with the two intakes
    deliberately overlapping half their URLs. The intake-vs-intake CAS
    race (gate base re-checked under the marker mutex, stale anti-joins
    diverted to staging) must admit each URL exactly once whichever
    process wins each fold."""
    spec = CorpusSpec(n_pages=500, n_hosts=12, seed=779)
    tmp = str(tmp_path_factory.mktemp("xproc3"))
    paths = write_corpus_parquet(spec, tmp + "/corpus")
    work = tmp + "/work"
    with open(tmp + "/seeds.txt", "w") as f:
        f.write("\n".join(gen_seeds(spec, n_seeds=6)) + "\n")
    late = [f"https://{spec.host_name(h)}/p/{i}"
            for h in range(4, 12) for i in (0, 1)]
    mine, childs = late[:12], late[6:]  # 6-URL overlap
    child_script = tmp + "/intake_child.py"
    with open(child_script, "w") as f:
        f.write(_CHILD_INTAKE)

    crawler = subprocess.Popen(
        [sys.executable, "-m", "adscraper_spark", "crawl",
         "--pages", paths["pages"], "--robots", paths["robots"],
         "--workdir", work, "--crawl-list", tmp + "/seeds.txt",
         "--max-waves", "10", "--max-depth", "2",
         "--default-budget", "2", "--checkpoint-every", "2",
         "--cpus", "8", "--pinned-subset"],
        cwd=REPO, stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
    child = None
    try:
        cfg = CrawlConfig(wave_seconds=10, default_budget=2,
                          max_waves=10, max_depth=2, checkpoint_every=2)
        eng = CrawlEngine(spark, paths["pages"], paths["robots"],
                          work, cfg)
        deadline = time.time() + 180
        while not os.path.exists(os.path.join(work, "wave-0.json")):
            assert crawler.poll() is None, "crawler died pre-bootstrap"
            assert time.time() < deadline, "bootstrap timeout"
            time.sleep(0.3)
        child = subprocess.Popen(
            [sys.executable, child_script, paths["pages"],
             paths["robots"], work, ",".join(childs), "20000"],
            cwd=REPO,
            env={**os.environ, "PYTHONPATH": REPO},
            stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
        sent = 0
        for k in range(0, len(mine), 4):
            eng.admit_seeds([(10_000 + sent + j, u)
                             for j, u in enumerate(mine[k:k + 4])])
            sent += 4
            time.sleep(0.7)
        assert child.wait(timeout=300) == 0
        assert crawler.wait(timeout=300) == 0
    finally:
        for p in (crawler, child):
            if p is not None and p.poll() is None:
                p.kill()

    cfg2 = CrawlConfig(wave_seconds=10, default_budget=2, max_waves=40,
                       max_depth=2, checkpoint_every=2)
    eng2 = CrawlEngine(spark, paths["pages"], paths["robots"],
                       work, cfg2)
    eng2.run()
    adm = eng2.admitted.read(spark)
    res = eng2.results.read(spark)
    proc = eng2.processed.read(spark)
    assert adm.groupBy("url").count().filter("count > 1").count() == 0
    assert (res.groupBy("url", "reload").count()
            .filter("count > 1").count() == 0)
    assert (adm.filter("state_initial = 'pending'")
            .join(proc, "url", "left_anti").count() == 0)
    admitted_urls = {r["url"] for r in adm.select("url").collect()}
    assert not (set(late) - admitted_urls), "late seed lost"
