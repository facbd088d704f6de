"""The north-rule deploy path: `spark-submit --py-files
adscraper_spark.zip` must run a crawl with NO repo checkout on the
driver's import path — the zip built by `python -m adscraper_spark
package` is the only code artifact (reference analog: the
containerized k8s indexed-job worker image).
"""

import json
import os
import shutil
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_DRIVER = """\
import sys
sys.path.insert(0, sys.argv[1])          # the --py-files zip
from adscraper_spark.__main__ import main
raise SystemExit(main(sys.argv[2:]))
"""


def _spark_submit_bin():
    cand = shutil.which("spark-submit")
    if cand:
        return cand
    import pyspark

    cand = os.path.join(os.path.dirname(pyspark.__file__), "bin",
                        "spark-submit")
    return cand if os.path.exists(cand) else None


@pytest.mark.skipif(_spark_submit_bin() is None,
                    reason="spark-submit not on this machine")
def test_spark_submit_py_files_crawl(tmp_path):
    # 1. build the artifact with the packaged CLI
    zip_path = str(tmp_path / "adscraper_spark.zip")
    out = subprocess.run(
        [sys.executable, "-m", "adscraper_spark", "package",
         "--out", zip_path],
        cwd=REPO, capture_output=True, text=True, timeout=120)
    assert out.returncode == 0, out.stderr
    assert json.loads(out.stdout.strip().splitlines()[-1])["zip"] == zip_path

    # 2. corpus from the repo checkout (test fixture only)
    from adscraper_spark.corpus import CorpusSpec, write_corpus_parquet

    spec = CorpusSpec(n_pages=120, n_hosts=6)
    paths = write_corpus_parquet(spec, str(tmp_path / "corpus"))
    seeds = tmp_path / "seeds.txt"
    seeds.write_text("https://host-0000.test/p/0\n"
                     "https://host-0001.test/p/0\n")
    driver = tmp_path / "driver.py"
    driver.write_text(_DRIVER)

    # 3. spark-submit from a scratch cwd with a scrubbed PYTHONPATH:
    #    the ONLY way `import adscraper_spark` can resolve is the zip
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    env["PYSPARK_PYTHON"] = sys.executable
    r = subprocess.run(
        [_spark_submit_bin(), "--master", "local[4]",
         "--conf", "spark.ui.enabled=false",
         "--py-files", zip_path, str(driver), zip_path,
         "crawl", "--pages", paths["pages"], "--robots", paths["robots"],
         "--workdir", str(tmp_path / "w"), "--crawl-list", str(seeds),
         "--max-waves", "2", "--max-depth", "1", "--cpus", "4"],
        cwd=str(tmp_path), env=env, capture_output=True, text=True,
        timeout=420)
    assert r.returncode == 0, r.stderr[-3000:]
    stats = json.loads(r.stdout.strip().splitlines()[-1])
    assert stats["resumed"] is False
    assert stats["waves"] and stats["waves"][0]["planned"] == 2
    assert sum(w["fetched"] for w in stats["waves"]) > 0
