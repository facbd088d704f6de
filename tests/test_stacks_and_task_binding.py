"""X10/T4 stack-trace URL mining and S5 indexed-job task binding.

X10/T4 semantics pinned line-by-line against the reference's
trackDOMUpdate (dom-monitor.ts:100-140) with a hand-computed oracle;
S5 against k8s-indexed-job-worker.ts:78-98 (file-by-index binding,
fail-fast validation).
"""

import json

import pytest

from adscraper_spark.pipelines.stacks import (extract_stack_urls,
                                              merge_element_urls)
from adscraper_spark.sources import TaskSpecError, read_indexed_job_task

_STACK_A = (
    "Error\n"
    "    at https://cdn-x.test/lib.js:10:3\n"              # bare URL line
    "    at fn (https://page.test/first.js:5:1)\n"         # first-party
    "    at track (https://tracker.test/t.js:77:12)\n"     # parens URL
    "    at weird (native)\n"                              # no-http paren
    "    at <anonymous>"                                   # dropped
)
_STACK_B = (
    "Error\n"
    "    at other (https://other.test/o.js:1:1)\n"
    "    at track (https://tracker.test/t.js:9:9)\n"       # same as A
)


def _events_df(spark):
    rows = [("el-1", "https://page.test/p/1", _STACK_A),
            ("el-1", "https://page.test/p/1", _STACK_B),
            ("el-2", "https://other.test/p/2", _STACK_B)]
    return spark.createDataFrame(rows, "element_id string, "
                                 "page_url string, stack string")


def test_x10_extraction_exact(spark):
    got = {(r["element_id"], r["url"])
           for r in extract_stack_urls(_events_df(spark)).collect()}
    # el-1: cdn (bare line, :10:3 stripped), tracker (parens, stripped),
    #       other — first.js filtered (first-party vs page.test)
    # el-2: tracker only — other.test is first-party for that page
    assert got == {
        ("el-1", "https://cdn-x.test/lib.js"),
        ("el-1", "https://tracker.test/t.js"),
        ("el-1", "https://other.test/o.js"),
        ("el-2", "https://tracker.test/t.js"),
    }


def test_t4_merge_unions_across_events(spark):
    merged = {r["element_id"]: (r["n_urls"], r["urls_joined"])
              for r in merge_element_urls(
                  extract_stack_urls(_events_df(spark))).collect()}
    assert merged["el-1"] == (3, "https://cdn-x.test/lib.js|"
                                 "https://other.test/o.js|"
                                 "https://tracker.test/t.js")
    assert merged["el-2"] == (1, "https://tracker.test/t.js")


def _write_spec(tmp_path, index, spec):
    d = tmp_path / "crawl_inputs"
    d.mkdir(exist_ok=True)
    (d / f"crawl_input_{index}.json").write_text(json.dumps(spec))


_VALID = {"crawlName": "c1", "resumeIfAble": True, "outputDir": "/o",
          "crawlOptions": {}, "scrapeOptions": {}, "urlList": "/l.txt"}


def test_s5_binds_spec_by_index(tmp_path):
    _write_spec(tmp_path, 0, _VALID)
    _write_spec(tmp_path, 1, {**_VALID, "crawlName": "c2"})
    spec = read_indexed_job_task(str(tmp_path), 1)
    assert spec["crawlName"] == "c2"
    assert spec["_task_index"] == 1
    assert spec["_seed_source"] == "urlList"


def test_s5_missing_file_and_validation(tmp_path):
    with pytest.raises(TaskSpecError, match="Could not find"):
        read_indexed_job_task(str(tmp_path), 7)
    bad = {k: v for k, v in _VALID.items() if k != "outputDir"}
    _write_spec(tmp_path, 0, bad)
    with pytest.raises(TaskSpecError, match="outputDir"):
        read_indexed_job_task(str(tmp_path), 0)
    # zero seed sources, and two seed sources, both rejected
    _write_spec(tmp_path, 1, {k: v for k, v in _VALID.items()
                              if k != "urlList"})
    with pytest.raises(TaskSpecError, match="exactly one"):
        read_indexed_job_task(str(tmp_path), 1)
    _write_spec(tmp_path, 2, {**_VALID, "url": "https://x.test"})
    with pytest.raises(TaskSpecError, match="exactly one"):
        read_indexed_job_task(str(tmp_path), 2)
