"""Per-crawl log-file sink (util/log.ts analog — crawl_log.py)."""

import re

import pytest

from adscraper_spark.crawl_log import LEVELS, CrawlLog, NullCrawlLog

LINE = re.compile(r"^\[(ERROR|WARNING|INFO|DEBUG|VERBOSE) "
                  r"\d{4}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2}[+-]\d{2}:\d{2}\] ")


def test_format_and_dir_scheme(tmp_path):
    """log.ts:40-46 directory scheme + log.ts:138-140 line format."""
    with CrawlLog(str(tmp_path), crawl_name="mycrawl", job_id=7) as log:
        log.info("hello world")
        assert log.path.endswith("logs/job_7/mycrawl.txt")
    lines = open(log.path).read().splitlines()
    assert len(lines) == 1
    assert LINE.match(lines[0])
    assert lines[0].endswith("] hello world")
    # no job id → no job_ segment (log.ts:41-43 conditional)
    with CrawlLog(str(tmp_path), crawl_name="nojob") as log2:
        log2.warning("w")
        assert log2.path.endswith("logs/nojob.txt")


def test_level_gating_matches_reference(tmp_path):
    """ERROR/WARNING/INFO always reach the file; DEBUG/VERBOSE only at
    their level (log.ts:53-129: the LOG_LEVEL gate wraps writeLog only
    for debug/verbose)."""
    with CrawlLog(str(tmp_path), crawl_name="gate", level="INFO") as log:
        log.error("e")
        log.warning("w")
        log.info("i")
        log.debug("d")
        log.verbose("v")
    got = [ln.split(" ", 1)[0].lstrip("[")
           for ln in open(log.path).read().splitlines()]
    assert got == ["ERROR", "WARNING", "INFO"]
    with CrawlLog(str(tmp_path), crawl_name="gate2",
                  level="VERBOSE") as log:
        log.debug("d")
        log.verbose("v")
    got = [ln.split(" ", 1)[0].lstrip("[")
           for ln in open(log.path).read().splitlines()]
    assert got == ["DEBUG", "VERBOSE"]


def test_error_appends_traceback(tmp_path):
    """log.ts error(e): message line, then e.stack on following lines."""
    with CrawlLog(str(tmp_path), crawl_name="tb") as log:
        try:
            raise ValueError("boom")
        except ValueError as ex:
            log.error("https://x.test/p: boom", exc=ex)
    txt = open(log.path).read()
    first = txt.splitlines()[0]
    assert LINE.match(first) and first.endswith("boom")
    assert "Traceback" in txt and "ValueError: boom" in txt


def test_append_mode_and_bad_level(tmp_path):
    with CrawlLog(str(tmp_path), crawl_name="app") as log:
        log.info("one")
    with CrawlLog(str(tmp_path), crawl_name="app") as log:
        log.info("two")  # flags:'a' — append, never truncate (log.ts:49)
    assert len(open(log.path).read().splitlines()) == 2
    with pytest.raises(ValueError):
        CrawlLog(str(tmp_path), crawl_name="x", level="TRACE")
    assert set(LEVELS) == {"ERROR", "WARNING", "INFO", "DEBUG", "VERBOSE"}


def test_null_log_writes_nothing(tmp_path):
    """No setLogDirFromFlags call → no file (log.ts:132-136 guard)."""
    n = NullCrawlLog()
    n.error("e", exc=None)
    n.warning("w")
    n.info("i")
    n.debug("d")
    n.verbose("v")
    n.close()
    assert n.path is None
    assert not (tmp_path / "logs").exists()


def test_engine_lifecycle_lines(spark, corpus, seeds, crawl_config,
                                tmp_path_factory):
    """The engine's driver-side lifecycle lands in the per-crawl log:
    bootstrap, per-wave summaries, completion; a resume run logs the
    resume message (crawler.ts:265-269 analog)."""
    from adscraper_spark.engine import CrawlEngine

    work = str(tmp_path_factory.mktemp("logwork"))
    log = CrawlLog(work, crawl_name="e2e")
    eng = CrawlEngine(spark, corpus["pages"], corpus["robots"], work,
                      crawl_config, log=log)
    eng.bootstrap(seeds)
    eng.run()
    txt = open(log.path).read()
    assert "Bootstrapped crawl" in txt and "seeds admitted" in txt
    assert "Wave 1: planned=" in txt
    assert "completed: frontier drained" in txt
    # resume on the same workdir appends the resume line
    eng2 = CrawlEngine(spark, corpus["pages"], corpus["robots"], work,
                       crawl_config, log=log)
    eng2.run()
    log.close()
    assert "Resuming crawl" in open(log.path).read()
