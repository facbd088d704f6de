"""SIGKILL crash-consistency: a crawl CLI subprocess is kill -9'd
after a delay, and a fresh engine resuming the torn workdir must
produce a crawl IDENTICAL to the uninterrupted sequential simulator.

Unlike the deterministic fault-injection tests (which cut the engine
at chosen seams), the kill lands wherever the wall clock puts it —
mid-bootstrap, mid-wave, mid-commit, inside an uncommitted checkpoint
window, or during JVM teardown — and varies with machine speed. That
variability is the point: the recovery contract (rollback to the last
committed manifest, replay deterministically) promises simulator
equality from ANY torn state, so the assertion is total and a
divergence is always a real bug, never scheduling flake. A 6-trial
randomized sweep of this shape ran fully green (session log, round 5);
the two pinned trials cover checkpoint_every 1 vs 2 and bloom vs
cuckoo with an early and a late kill point.
"""

import os
import random
import signal
import subprocess
import sys
import time

import pytest

from adscraper_spark.config import CrawlConfig
from adscraper_spark.corpus import (CorpusSpec, feed_rows, gen_robots_txt,
                                    gen_seeds, pages_rows,
                                    write_corpus_parquet)
from adscraper_spark.engine import CrawlEngine
from adscraper_spark.simulator import simulate_crawl

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.parametrize("trial_seed", [9201, 9205])
def test_sigkill_resume_equals_simulator(spark, tmp_path_factory,
                                         trial_seed):
    rng = random.Random(trial_seed)
    spec = CorpusSpec(n_pages=300, n_hosts=10, seed=rng.randint(0, 10**6))
    cfg = CrawlConfig(wave_seconds=10, default_budget=3,
                      max_waves=6, max_depth=2,
                      checkpoint_every=rng.choice([1, 2, 3]),
                      seen_filter=rng.choice(["bloom", "cuckoo"]))
    n_seeds = rng.randint(6, 14)
    seeds = [(i, u) for i, u in enumerate(gen_seeds(spec, n_seeds=n_seeds))]
    robots = [(spec.host_name(h), gen_robots_txt(spec, h))
              for h in range(spec.n_hosts)
              if gen_robots_txt(spec, h) is not None]
    pages_map = {r["url"]: r["html"] for r in pages_rows(spec)}
    pages_map.update({r["url"]: r["html"] for r in feed_rows(spec)})
    sim = simulate_crawl(pages_map, seeds, robots, cfg)
    assert sim.order

    tmp = str(tmp_path_factory.mktemp(f"kill{trial_seed}"))
    paths = write_corpus_parquet(spec, tmp + "/corpus")
    with open(tmp + "/seeds.txt", "w") as f:
        f.write("\n".join(u for _, u in seeds) + "\n")
    kill_after = rng.uniform(4.0, 22.0)
    p = subprocess.Popen(
        [sys.executable, "-m", "adscraper_spark", "crawl",
         "--pages", paths["pages"], "--robots", paths["robots"],
         "--workdir", tmp + "/work", "--crawl-list", tmp + "/seeds.txt",
         "--max-waves", "6", "--max-depth", "2", "--default-budget", "3",
         "--checkpoint-every", str(cfg.checkpoint_every),
         "--seen-filter", cfg.seen_filter,
         "--cpus", "8", "--pinned-subset"],
        cwd=REPO, stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
    try:
        t0 = time.time()
        while time.time() - t0 < kill_after and p.poll() is None:
            time.sleep(0.1)
        if p.poll() is None:
            p.send_signal(signal.SIGKILL)
        p.wait()
    finally:
        if p.poll() is None:
            p.kill()

    eng = CrawlEngine(spark, paths["pages"], paths["robots"],
                      tmp + "/work", cfg)
    try:
        eng.run()
    except RuntimeError as e:
        # killed before bootstrap's first durable commit: nothing on
        # disk — the operator's retry path bootstraps fresh
        assert "bootstrap" in str(e), e
        eng.bootstrap(seeds)
        eng.run()
    assert eng.crawl_order() == sim.order
    assert eng.seen_set() == sim.seen
