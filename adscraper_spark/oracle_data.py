"""Pure-Python oracle artifacts backing the crawl-engine CORRECTNESS rows.

Round 1 exposed ``crawl_engine_e2e`` / ``extraction_udf_demo`` /
``find_articles_demo`` as rows-only driver checks (``err: no_oracle``).
The engine is deterministic, so the DuckDB side CAN be materialized: the
sequential-simulator trace, the oracle extraction of the synthetic
corpus, and the resolved link/ad graph are computed here with NO Spark
involved and written as parquet the driver's DuckDB oracle reads via
``read_parquet()``. The Spark side recomputes the same quantities
through the distributed engine/UDF plans, so the rows/schema/hash
compares are genuine engine-vs-sequential-oracle checks (reference
anchor: the byte-identity invariant, adscraper.sql:166 +
crawler/src/pages/find-page.ts:247-250).

Everything derives from (seed, n_pages, n_hosts) — any process
regenerates identical bytes, so the artifacts live under a versioned
/tmp directory and are built at most once per machine (atomic dir-rename
publish; concurrent builders race harmlessly).
"""

from __future__ import annotations

import os
import shutil
import tempfile

from urllib.parse import urlsplit

from .config import CrawlConfig
from .corpus import (
    GUESS_FEED_PATHS, GUESS_POS_BASE,
    CorpusSpec, feed_rows, gen_html, gen_lang, gen_robots_txt, gen_seeds,
    parse_feed_first, write_corpus_parquet,
)
from .extraction.core import extract_page
from .hashing import ad_id_for
from .simulator import simulate_crawl
from .urlnorm import url_host

ORACLE_N_PAGES = 200
ORACLE_N_HOSTS = 16  # enough hosts that some are reached ONLY via ad
                     # landings (J4 coverage: cross-host ad targets
                     # must not all collide with link-admitted URLs)
ORACLE_SEED = 42
N_SEEDS = 10
N_FIND_SOURCES = 15
FIND_SEED = 42

# The oracle artifacts are a function of (corpus params, seed, AND the
# active EasyList tier): the full-list default detects markup the
# pinned subset does not (corpus.gen_html embeds full-list-only divs),
# so each tier gets its own versioned directory. The tier is captured
# at import — queries()/oracle_sql() and the SQL strings baked from
# these paths must agree within one process.
from .html import easylist as _easylist

_LIST_MODE = "full" if _easylist.full_lists_enabled() else "subset"
ROOT = os.path.join(
    tempfile.gettempdir(),
    # v6: url tiebreaker added to the scheduler/simulator total order +
    # per-attempt timeout skip in the trace builder — cached v5
    # artifacts must not be compared against post-change engine runs.
    f"adscraper_spark_oracle_v6_{_LIST_MODE}_{ORACLE_N_PAGES}"
    f"_{ORACLE_N_HOSTS}_{ORACLE_SEED}")


def oracle_spec() -> CorpusSpec:
    return CorpusSpec(n_pages=ORACLE_N_PAGES, n_hosts=ORACLE_N_HOSTS,
                      seed=ORACLE_SEED)


def engine_config() -> CrawlConfig:
    """The e2e crawl parameters shared by the Spark engine run and the
    sequential simulator trace. Ad-landing admission (J4) and the
    main-page refresh analog are ON so the e2e oracle covers the
    page_type/reload/referrer-ad lineage surface."""
    return CrawlConfig(name="oracle-e2e", wave_seconds=10,
                       default_budget=3, max_waves=5, max_depth=2,
                       admit_ad_landings=True, max_ad_landings_per_page=2,
                       refresh_mains=True)


def find_sources() -> list[str]:
    """Source pages for the find-article demos, spread over hosts 0-2
    so every RSS-discovery leg is exercised at this spec: host 0 serves
    NO feed (dangling header links + all three guesses miss → the
    find-page guess fallback), hosts 1-2 serve /feed (header-link hit
    for ~25% of pages, guess-path hit for the rest)."""
    spec = oracle_spec()
    per, rem = divmod(N_FIND_SOURCES, 3)
    assert rem == 0, "N_FIND_SOURCES must stay divisible by 3 hosts"
    return [spec.page_url(h, j) for h in range(3) for j in range(per)]


def artifact_paths() -> dict[str, str]:
    return {
        "pages": os.path.join(ROOT, "pages.parquet"),
        "seeds": os.path.join(ROOT, "seeds.parquet"),
        "robots": os.path.join(ROOT, "robots.parquet"),
        "extract": os.path.join(ROOT, "oracle_extract.parquet"),
        "links": os.path.join(ROOT, "oracle_links.parquet"),
        "ads": os.path.join(ROOT, "oracle_ads.parquet"),
        "ad_urls": os.path.join(ROOT, "oracle_ad_urls.parquet"),
        "trace": os.path.join(ROOT, "oracle_trace.parquet"),
        "rss": os.path.join(ROOT, "oracle_rss.parquet"),
        "feeds": os.path.join(ROOT, "oracle_feeds.parquet"),
        "crawl_meta": os.path.join(ROOT, "oracle_crawl_meta.parquet"),
    }


def ensure_oracle_artifacts() -> dict[str, str]:
    """Build-once materialization (atomic publish via dir rename)."""
    paths = artifact_paths()
    if os.path.isdir(ROOT):
        return paths
    build = ROOT + f".build-{os.getpid()}"
    try:
        _build(build)
        try:
            os.rename(build, ROOT)
        except OSError:
            if not os.path.isdir(ROOT):  # lost a race is fine; else raise
                raise
    finally:
        shutil.rmtree(build, ignore_errors=True)
    return paths


def _build(out_dir: str) -> None:
    import pyarrow as pa
    import pyarrow.parquet as pq

    from .html import easylist

    # Build with the tier ROOT was keyed to at import — a test that
    # flipped the tier afterwards must not poison the shared cache dir.
    want_full = _LIST_MODE == "full"
    had_full = easylist.full_lists_enabled()
    if had_full != want_full:
        (easylist.enable_full_lists if want_full
         else easylist.disable_full_lists)()
    try:
        _build_inner(out_dir, pa, pq)
    finally:
        if had_full != want_full:
            (easylist.enable_full_lists if had_full
             else easylist.disable_full_lists)()


def _build_inner(out_dir: str, pa, pq) -> None:
    spec = oracle_spec()
    write_corpus_parquet(spec, out_dir)

    pages_map: dict[str, bytes] = {}
    url_lang: dict[str, str] = {}
    ex_rows, link_rows, ad_rows, ad_url_rows = [], [], [], []
    rss_rows, feed_first_rows = [], []
    url_ex = {}
    docs = [(spec.page_url(h, j), gen_html(spec, h, j), gen_lang(spec, h))
            for h, j in spec.iter_pages()]
    # feed pseudo-pages are part of the corpus 'web' (corpus.feed_rows)
    docs += [(r["url"], r["html"], r["lang"]) for r in feed_rows(spec)]
    for url, html, lang in docs:
        e = extract_page(url, html)
        pages_map[url] = html
        url_ex[url] = e
        url_lang[url] = lang
        ex_rows.append({
            "url": url, "text": e.text, "n_links": len(e.links),
            "n_ads": len(e.ads), "readerable": e.readerable,
            "n_rss": len(e.rss_urls),
        })
        src_host = url_host(url)
        for ln in e.links:
            link_rows.append({"src_url": url, "src_host": src_host,
                              "link": ln, "link_host": url_host(ln)})
        for pos, ru in enumerate(e.rss_urls):
            rss_rows.append({"src_url": url, "pos": pos, "rss_url": ru})
        # guessRssFeed candidates (get-rss-article.ts:57-75): tried
        # after every header/anchor feed — mirrors analysis.py's
        # GUESS_POS_BASE offset exactly; guesses that aren't corpus
        # feeds drop out of the feeds join like the reference's
        # parseURL throw.
        scheme = urlsplit(url).scheme.lower()
        for gpos, gpath in enumerate(GUESS_FEED_PATHS):
            rss_rows.append({
                "src_url": url, "pos": GUESS_POS_BASE + gpos,
                "rss_url": f"{scheme}://{src_host}{gpath}"})
        for idx, ad in enumerate(e.ads):
            ad_rows.append({"url": url, "ad_index": idx,
                            "ad_id": ad_id_for(url, idx),
                            "selector": ad.selector,
                            "platform": ad.platform})
            for attr, rtype in (("anchor_hrefs", "anchor"),
                                ("iframe_srcs", "iframe"),
                                ("script_srcs", "script"),
                                ("img_srcs", "img")):
                for t in getattr(ad, attr):
                    ad_url_rows.append({
                        "url": url, "ad_index": idx, "target_url": t,
                        "resource_type": rtype,
                        "target_host": url_host(t)})

    pq.write_table(pa.Table.from_pylist(ex_rows, schema=pa.schema([
        ("url", pa.string()), ("text", pa.string()),
        ("n_links", pa.int64()), ("n_ads", pa.int64()),
        ("readerable", pa.bool_()), ("n_rss", pa.int64()),
    ])), os.path.join(out_dir, "oracle_extract.parquet"))
    pq.write_table(pa.Table.from_pylist(link_rows, schema=pa.schema([
        ("src_url", pa.string()), ("src_host", pa.string()),
        ("link", pa.string()), ("link_host", pa.string()),
    ])), os.path.join(out_dir, "oracle_links.parquet"))
    pq.write_table(pa.Table.from_pylist(ad_rows, schema=pa.schema([
        ("url", pa.string()), ("ad_index", pa.int64()),
        ("ad_id", pa.int64()),
        ("selector", pa.string()), ("platform", pa.string()),
    ])), os.path.join(out_dir, "oracle_ads.parquet"))
    pq.write_table(pa.Table.from_pylist(ad_url_rows, schema=pa.schema([
        ("url", pa.string()), ("ad_index", pa.int64()),
        ("target_url", pa.string()), ("resource_type", pa.string()),
        ("target_host", pa.string()),
    ])), os.path.join(out_dir, "oracle_ad_urls.parquet"))
    pq.write_table(pa.Table.from_pylist(rss_rows, schema=pa.schema([
        ("src_url", pa.string()), ("pos", pa.int64()),
        ("rss_url", pa.string()),
    ])), os.path.join(out_dir, "oracle_rss.parquet"))
    # feed-XML → first-article oracle (S7/W3: feed.items[0])
    for r in feed_rows(spec):
        feed_first_rows.append({
            "feed_url": r["url"],
            "first_article_url": parse_feed_first(r["html"]),
        })
    pq.write_table(pa.Table.from_pylist(feed_first_rows, schema=pa.schema([
        ("feed_url", pa.string()), ("first_article_url", pa.string()),
    ])), os.path.join(out_dir, "oracle_feeds.parquet"))

    # sequential-simulator trace of the e2e crawl (the engine oracle)
    seeds = [(i, u) for i, u in enumerate(gen_seeds(spec, N_SEEDS))]
    robots = [(spec.host_name(h), gen_robots_txt(spec, h))
              for h in range(spec.n_hosts)
              if gen_robots_txt(spec, h) is not None]
    cfg = engine_config()
    sim = simulate_crawl(pages_map, seeds, robots, cfg)
    trace_rows = []
    for url, wave in sim.order:
        if (url, wave) in sim.unfetched_attempts:
            # per-ATTEMPT skip: Z2 timeouts and corpus misses are
            # scheduled (they appear in `order`) but the engine writes
            # no results row for them — a retry that later succeeds
            # contributes its own fetched (url, wave') entry. The old
            # url-level pages_map check could not distinguish a
            # timed-out attempt on a page that EXISTS in the corpus.
            continue
        # corpus misses are covered by unfetched_attempts above (the
        # simulator records them per attempt); a url that slipped both
        # would KeyError here — loud, not a silent trace divergence
        e = url_ex[url]
        ad_id = sim.ad_ids.get(url)
        page_type = ("landing" if ad_id is not None
                     else "main" if sim.depths[url] == 0 else "subpage")
        row = {
            "url": url, "wave": wave, "host": sim.hosts[url],
            "depth": sim.depths[url], "text": e.text,
            "n_ads": len(e.ads), "readerable": e.readerable,
            "lang": url_lang[url],
            "page_type": page_type, "reload": 0, "ad_id": ad_id,
        }
        trace_rows.append(row)
        if cfg.refresh_mains and page_type == "main":
            trace_rows.append({**row, "reload": 1})
    pq.write_table(pa.Table.from_pylist(trace_rows, schema=pa.schema([
        ("url", pa.string()), ("wave", pa.int64()), ("host", pa.string()),
        ("depth", pa.int64()), ("text", pa.string()),
        ("n_ads", pa.int64()), ("readerable", pa.bool_()),
        ("lang", pa.string()),
        ("page_type", pa.string()), ("reload", pa.int64()),
        ("ad_id", pa.int64()),
    ])), os.path.join(out_dir, "oracle_trace.parquet"))
    # crawl_meta oracle: the completion event the engine's drain loop
    # must record for the same seeds/config (J1-shaped dim join)
    pq.write_table(pa.Table.from_pylist([{
        "crawl_name": cfg.name,
        "final_event": "completed" if sim.drained else "horizon",
        "n_result_rows": len(trace_rows),
    }], schema=pa.schema([
        ("crawl_name", pa.string()), ("final_event", pa.string()),
        ("n_result_rows", pa.int64()),
    ])), os.path.join(out_dir, "oracle_crawl_meta.parquet"))
