"""The full-EasyList DEFAULT must reach the EXTRACTION WORKERS, not
just the driver: the selector index is rebuilt per worker process from
module defaults (no env propagation needed — that is why full-on is
the default rather than an opt-in env var). The --pinned-subset
opt-OUT rides env the JVM is launched with, so the CLI sets it before
the SparkSession. This test drives the real CLI in subprocesses over a
page whose ad markup matches ONLY the real EasyList snapshot —
detection through the engine proves both directions end-to-end."""

import glob
import os
import subprocess
import sys

import pyarrow as pa
import pyarrow.parquet as pq

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

PAGE_URL = "https://adhost.test/p/0"
# '#AC_ad' exists in the real EasyList snapshot, not the pinned subset
HTML = ('<html><body><div id="AC_ad">'
        '<a href="https://adhost.test/buy">promo</a></div>'
        "<p>Some article text for the page body.</p></body></html>")


def _write_corpus(tmp_path) -> str:
    pages = str(tmp_path / "pages.parquet")
    t = pa.Table.from_pylist(
        [{"url": PAGE_URL, "html": HTML.encode(),
          "warc_ts": "2024-01-01T00:00:00Z", "lang": "en"}],
        schema=pa.schema([("url", pa.string()), ("html", pa.binary()),
                          ("warc_ts", pa.string()),
                          ("lang", pa.string())]))
    pq.write_table(t, pages)
    return pages


def _crawl(tmp_path, pages: str, workdir: str, *extra: str) -> None:
    seeds = tmp_path / f"seeds_{os.path.basename(workdir)}.txt"
    seeds.write_text(PAGE_URL + "\n")
    out = subprocess.run(
        [sys.executable, "-m", "adscraper_spark", "crawl",
         "--pages", pages, "--workdir", workdir,
         "--crawl-list", str(seeds), "--max-waves", "1",
         "--max-depth", "0", "--cpus", "4", *extra],
        cwd=REPO, capture_output=True, text=True, timeout=420)
    assert out.returncode == 0, out.stderr[-2000:]


def _ad_selectors(workdir: str) -> set[str]:
    files = glob.glob(os.path.join(workdir, "ads", "data", "*", "*.parquet"))
    sels: set[str] = set()
    for f in files:
        tbl = pq.read_table(f)
        if "selector" in tbl.column_names:
            sels.update(s for s in tbl.column("selector").to_pylist() if s)
    return sels


def test_full_easylists_default_reaches_extraction_workers(tmp_path):
    pages = _write_corpus(tmp_path)
    default = str(tmp_path / "w_full")
    subset = str(tmp_path / "w_subset")
    _crawl(tmp_path, pages, default)  # NO flag: full lists by default
    _crawl(tmp_path, pages, subset, "--pinned-subset")
    assert "#AC_ad" in _ad_selectors(default)
    assert "#AC_ad" not in _ad_selectors(subset)  # opt-out control
