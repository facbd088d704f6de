"""Deterministic synthetic Common-Crawl-style corpus (FIXTURES.md §1-3).

Everything derives from (seed, n_pages, n_hosts) — no wall clock, no
randomness, no network — so any process (pytest oracle, Spark executors,
the sequential simulator) regenerates identical bytes.

Shape (FIXTURES.md §1): hosts get a Zipf-ish share of pages plus one
deliberate mega-host (host-0000) for skew tests; each page's HTML embeds
same-host links (the crawl graph), ad elements matching the vendored
EasyList-style selectors, optional cookie banners, optional inline
iframes, paragraphs sized around the 140-char readability threshold, and
occasional RSS header links. The ``text`` column is produced by the SAME
oracle extractor the UDF wraps (byte-identity anchor).
"""

from __future__ import annotations

import datetime as dt
from dataclasses import dataclass, field

from .extraction.core import extract_page
from .hashing import stable_hash64, stable_unit

EPOCH = dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc)

_WORDS = (
    "the quick brown fox jumps over lazy dog crawl frontier spark shuffle "
    "partition window queue host budget page article news report story "
    "section update market science culture travel sport weather local "
    "world economy policy review analysis feature opinion archive health "
    "wellness medicine research data study city people event festival"
).split()

_LANGS = ["en", "es", "de", "fr", "zh", "pt", "it", "nl"]


@dataclass
class CorpusSpec:
    n_pages: int = 1000
    n_hosts: int = 20
    seed: int = 42
    mega_host_weight: float = 8.0   # host-0000 skew multiplier
    private_frac: float = 0.15      # pages under /private/ (robots-disallowed)
    content_scale: int = 1          # multiplies page body size (bench uses
                                    # >1 for realistic ~30 KB pages)
    layout_cache: list = field(default_factory=list, repr=False)

    def layout(self) -> list[tuple[int, int]]:
        """[(host_index, page_count)] — Zipf-ish + mega-host, sums to
        n_pages. Deterministic in spec params only."""
        if self.layout_cache:
            return self.layout_cache
        weights = [self.mega_host_weight] + [
            1.0 / (r + 1) for r in range(1, self.n_hosts)]
        total = sum(weights)
        counts = [max(1, int(self.n_pages * w / total)) for w in weights]
        # fix rounding drift onto the mega-host
        counts[0] += self.n_pages - sum(counts)
        # Degenerate specs (n_hosts large vs n_pages): the per-host
        # floor of 1 can overshoot n_pages and leave the mega-host at
        # <=0, which downstream `% count` arithmetic (gen_seeds,
        # _ad_anchor) turns into URLs for pages that don't exist or a
        # ZeroDivisionError. Reclaim the deficit from the tail hosts
        # (each keeps >=1 page) — a no-op for every non-degenerate
        # spec, so existing corpora/oracles are byte-identical.
        h = self.n_hosts - 1
        while counts[0] < 1 and h > 0:
            take = min(counts[h] - 1, 1 - counts[0])
            counts[h] -= take
            counts[0] += take
            h -= 1
        if counts[0] < 1:
            raise ValueError(
                f"n_pages={self.n_pages} < n_hosts={self.n_hosts}: "
                "every host needs at least one page")
        self.layout_cache = list(enumerate(counts))
        return self.layout_cache

    def host_name(self, h: int) -> str:
        return f"host-{h:04d}.test"

    def page_url(self, h: int, j: int) -> str:
        count = self.layout()[h][1]
        private = stable_unit(f"priv|{h}|{j}", self.seed) < self.private_frac
        base = "private/p" if private else "p"
        # a few section dirs for path variety
        sec = stable_hash64(f"sec|{h}|{j}", self.seed) % 4
        section = ["", "news/", "sport/", "health/"][sec]
        _ = count
        return f"https://{self.host_name(h)}/{section}{base}/{j}"

    def iter_pages(self):
        for h, count in self.layout():
            for j in range(count):
                yield h, j


def _words(key: str, seed: int, n: int) -> str:
    return " ".join(
        _WORDS[stable_hash64(f"{key}|{i}", seed) % len(_WORDS)]
        for i in range(n))


def _paragraphs(spec: CorpusSpec, h: int, j: int) -> str:
    """1-4 <p> blocks; lengths straddle the 140-char readability gate
    (find-page.ts:247-250) so both branches are exercised."""
    k = f"para|{h}|{j}"
    n_paras = (1 + stable_hash64(k, spec.seed) % 4) * spec.content_scale
    out = []
    for p in range(n_paras):
        u = stable_unit(f"{k}|{p}|len", spec.seed)
        n_words = 8 + int(u * 60)      # ~40-400 chars
        cls = ""
        if stable_unit(f"{k}|{p}|cls", spec.seed) < 0.15:
            cls = ' class="sidebar-note"'  # hits unlikelyCandidates 'sidebar'
        out.append(f"<p{cls}>{_words(f'{k}|{p}', spec.seed, n_words)}</p>")
    if stable_unit(f"{k}|brdiv", spec.seed) < 0.2:
        out.append(f"<div>{_words(k + '|br1', spec.seed, 30)}<br><br>"
                   f"{_words(k + '|br2', spec.seed, 30)}</div>")
    return "\n".join(out)


def _ad_anchor(spec: CorpusSpec, k: str, fallback: str) -> str:
    """Ad anchor target: ~40% point at an off-site ad-network URL (the
    fetch-miss landing path), ~60% at a REAL page on another host (the
    landing-fetch path J4 exercises — ad targets are cross-host, which
    is why landing admission is exempt from same_host_only)."""
    if spec.n_hosts > 1 and stable_unit(k + "|land", spec.seed) < 0.6:
        other = 1 + stable_hash64(k + "|lh", spec.seed) % (spec.n_hosts - 1)
        count = spec.layout()[other][1]
        for i in range(4):  # prefer a robots-crawlable landing target
            oj = stable_hash64(f"{k}|lj|{i}", spec.seed) % count
            u = spec.page_url(other, oj)
            if "/private/" not in u:
                return u
    return fallback


def _ad_block(spec: CorpusSpec, h: int, j: int, a: int) -> str:
    k = f"ad|{h}|{j}|{a}"
    kind = stable_hash64(k, spec.seed) % 6
    inner = _words(k + "|txt", spec.seed, 6)
    adhost = f"https://ads.partner-{stable_hash64(k, spec.seed) % 9}.test"
    if kind == 0:
        return (f'<div id="AdBanner">'
                f'<a href="{_ad_anchor(spec, k, f"{adhost}/c/{a}")}">'
                f"{inner}</a>"
                f'<img src="{adhost}/i/{a}.png"></div>')
    if kind == 1:
        return (f'<div class="adsbygoogle"><script src="{adhost}/s.js">'
                f'</script>{inner}</div>')
    if kind == 2:  # nested ads: top-most dedup case (ad-detection.ts:25-43)
        return (f'<div class="ad-container"><div class="ad-unit">'
                f'<a href="{_ad_anchor(spec, k, f"{adhost}/c/{a}")}">'
                f"{inner}</a>"
                f"</div></div>")
    if kind == 3:  # iframe ad (U5 tree)
        return (f'<div class="advert"><iframe src="{adhost}/f/{a}">'
                f'<html><body><p>{inner}</p>'
                f'<iframe src="{adhost}/f/{a}/inner"><p>deep {inner}</p>'
                f"</iframe></body></html></iframe></div>")
    if kind == 4:  # taboola-style chumbox (chumbox-handler.ts platforms)
        items = "".join(
            f'<div class="trc_spotlight_item syndicatedItem">'
            f'<a href="{_ad_anchor(spec, k, f"{adhost}/t/{a}/{i}") if i == 0 else f"{adhost}/t/{a}/{i}"}">{inner} {i}</a></div>'
            for i in range(3))
        return f'<div class="trc_related_container">{items}</div>'
    # mgid-style chumbox
    items = "".join(
        f'<div class="mgline"><a href="{_ad_anchor(spec, k, f"{adhost}/m/{a}/{i}") if i == 0 else f"{adhost}/m/{a}/{i}"}">{inner} {i}</a>'
        f"</div>" for i in range(2))
    return f'<div class="mgbox">{items}</div>'


def _cookie_banner(spec: CorpusSpec, h: int, j: int) -> str:
    k = f"cookie|{h}|{j}"
    sel = stable_hash64(k, spec.seed) % 3
    body = "We use cookies. " + _words(k, spec.seed, 8)
    if sel == 0:
        return f'<div id="cookie-banner">{body}<button>Accept</button></div>'
    if sel == 1:
        return f'<div class="cc-window">{body}</div>'
    return f'<div class="gdpr-banner"><span>{body}</span></div>'


def gen_links(spec: CorpusSpec, h: int, j: int) -> list[str]:
    """Same-host out-links (crawl graph edges) + a few cross-host ones
    (dropped by the same-hostname admission filter, F4)."""
    count = spec.layout()[h][1]
    k = f"links|{h}|{j}"
    n_links = stable_hash64(k, spec.seed) % 7  # 0..6
    targets = []
    for i in range(n_links):
        jj = stable_hash64(f"{k}|{i}", spec.seed) % count
        targets.append(spec.page_url(h, jj))
    if stable_unit(k + "|x", spec.seed) < 0.3 and spec.n_hosts > 1:
        other = 1 + stable_hash64(k + "|xh", spec.seed) % (spec.n_hosts - 1)
        oj = stable_hash64(k + "|xj", spec.seed) % spec.layout()[other][1]
        targets.append(spec.page_url(other, oj))
    return targets


# Bump whenever generated page CONTENT changes (not just size params):
# consumers that cache a written corpus keyed by spec params (bench.py
# roots, oracle artifacts) must include this so a stale on-disk corpus
# from an older generator is never silently re-benched as the new one.
# v2: round 5 — gen_html embeds full-EasyList-only ad/cookie divs.
# v3: late round 5 — ~30% of hosts serve NO feed (host_has_feed), so
#     the RSS guess-path fallback and dangling header links are real.
CORPUS_CONTENT_VERSION = 3


def gen_html(spec: CorpusSpec, h: int, j: int) -> bytes:
    k = f"page|{h}|{j}"
    url = spec.page_url(h, j)
    title = _words(k + "|title", spec.seed, 5)
    head = [f"<title>{title}</title>"]
    if stable_unit(k + "|rss", spec.seed) < 0.25:
        head.append('<link rel="alternate" type="application/rss+xml" '
                    f'href="https://{spec.host_name(h)}/feed">')
    parts = [f"<!DOCTYPE html><html><head>{''.join(head)}</head><body>"]
    if stable_unit(k + "|ck", spec.seed) < 0.4:
        parts.append(_cookie_banner(spec, h, j))
    parts.append(f"<h1>{title}</h1>")
    parts.append(_paragraphs(spec, h, j))
    nav = "".join(
        f'<a href="{t}">{_words(t, spec.seed, 2)}</a> '
        for t in gen_links(spec, h, j))
    parts.append(f"<nav>{nav}</nav>")
    n_ads = stable_hash64(k + "|nads", spec.seed) % 4  # 0..3 (FIXTURES §1b)
    for a in range(n_ads):
        parts.append(_ad_block(spec, h, j, a))
    # Full-list-only markup: these ids exist in the vendored REAL
    # EasyList snapshots but NOT in the pinned subset, so the default
    # (full-list) detection surface is load-bearing in every oracle —
    # a regression to the subset changes n_ads/text and fails the
    # rows/hash compare, instead of passing vacuously.
    if stable_unit(k + "|fullad", spec.seed) < 0.15:
        adhost = f"https://ads.partner-{stable_hash64(k, spec.seed) % 9}.test"
        parts.append(f'<div id="AC_ad">'
                     f'<a href="{adhost}/fx/{h}/{j}">'
                     f"{_words(k + '|fulltxt', spec.seed, 4)}</a></div>")
    if stable_unit(k + "|fullck", spec.seed) < 0.1:
        parts.append('<div id="ACCETTA_COOKIES">Questo sito usa cookie.'
                     "</div>")
    if stable_unit(k + "|ent", spec.seed) < 0.2:  # entity/BOM adversarial
        parts.append("<p>caf&eacute;&nbsp;beats &amp; bytes &#8212; "
                     "&#x2603; snow</p>")
    parts.append("</body></html>")
    html = "\n".join(parts)
    if stable_unit(k + "|bom", spec.seed) < 0.05:
        return b"\xef\xbb\xbf" + html.encode("utf-8")
    return html.encode("utf-8")


def gen_warc_ts(spec: CorpusSpec, url: str) -> dt.datetime:
    return EPOCH + dt.timedelta(
        seconds=stable_hash64("ts|" + url, spec.seed) % (365 * 86400))


def gen_lang(spec: CorpusSpec, h: int) -> str:
    return _LANGS[stable_hash64(f"lang|{h}", spec.seed) % len(_LANGS)]


def gen_page_row(spec: CorpusSpec, h: int, j: int) -> dict:
    url = spec.page_url(h, j)
    html = gen_html(spec, h, j)
    return {
        "url": url,
        "warc_ts": gen_warc_ts(spec, url),
        "html": html,
        "text": extract_page(url, html).text,   # oracle text column
        "lang": gen_lang(spec, h),
    }


#: getRssArticle's guessRssFeed paths (get-rss-article.ts:60), tried in
#: order AFTER every header/anchor-discovered feed URL. Positions start
#: at GUESS_POS_BASE so the (pos, feed_url) first-hit window keeps the
#: reference's header-first precedence. Defined here (not analysis.py)
#: so the pure-Python oracle builder never imports pyspark.
GUESS_FEED_PATHS = ("/feed", "/feeds", "/rss")
GUESS_POS_BASE = 1_000_000


def feed_url(spec: CorpusSpec, h: int) -> str:
    return f"https://{spec.host_name(h)}/feed"


def host_has_feed(spec: CorpusSpec, h: int) -> bool:
    """~70% of hosts actually serve a feed at /feed. The rest exercise
    the reference's failure legs: a page's header link may DANGLE
    (getFromHeader parses nothing) and the /feed,/feeds,/rss guesses
    miss (guessRssFeed exhausts) — both real-web behaviors the
    all-hosts-have-feeds corpus could never produce."""
    return stable_unit(f"hasfeed|{h}", spec.seed) < 0.7


def gen_feed_xml(spec: CorpusSpec, h: int) -> bytes:
    """RSS 2.0 feed body per host (the /feed URL some page heads
    advertise, gen_html). Items are deterministic picks of the host's
    pages; item[0] is the first-article target (S7/W3,
    crawler/src/pages/get-rss-article.ts:40-53)."""
    count = spec.layout()[h][1]
    items = []
    for i in range(min(3, count)):
        j = stable_hash64(f"feeditem|{h}|{i}", spec.seed) % count
        u = spec.page_url(h, j)
        items.append(f"<item><title>{_words(f'fi|{h}|{i}', spec.seed, 3)}"
                     f"</title><link>{u}</link></item>")
    xml = ("<?xml version=\"1.0\" encoding=\"UTF-8\"?>"
           f"<rss version=\"2.0\"><channel>"
           f"<title>{spec.host_name(h)} feed</title>"
           f"{''.join(items)}</channel></rss>")
    return xml.encode("utf-8")


def feed_rows(spec: CorpusSpec):
    """Feed pseudo-pages appended to the pages corpus (the engine's
    'web'). Never admitted by link harvest (feeds are <link> elements,
    not anchors) — only the RSS operator joins them."""
    for h in range(spec.n_hosts):
        if not host_has_feed(spec, h):
            continue
        url = feed_url(spec, h)
        html = gen_feed_xml(spec, h)
        yield {
            "url": url,
            "warc_ts": gen_warc_ts(spec, url),
            "html": html,
            "text": extract_page(url, html).text,
            "lang": gen_lang(spec, h),
        }


def parse_feed_first(xml: bytes | str) -> str | None:
    """First item's link of an RSS feed body (feed.items[0],
    get-rss-article.ts:44-48). Tolerant regex parse — deterministic and
    shared by the Spark UDF and the sequential oracle."""
    import re as _re

    if isinstance(xml, bytes):
        xml = xml.decode("utf-8", errors="replace")
    m = _re.search(r"<item\b.*?<link>\s*(.*?)\s*</link>", xml,
                   _re.DOTALL | _re.IGNORECASE)
    return m.group(1) if m else None


def gen_robots_txt(spec: CorpusSpec, h: int) -> str | None:
    """RFC 9309-style body per host; ~20% of hosts have none (default
    budget applies). Mega-host always has a crawl delay (skew × politeness
    interaction is the interesting case)."""
    if h != 0 and stable_unit(f"robots|{h}", spec.seed) < 0.2:
        return None
    delay = 1 + stable_hash64(f"delay|{h}", spec.seed) % 4
    lines = ["User-agent: *", "Disallow: /private/"]
    if h == 0 or stable_unit(f"hasdelay|{h}", spec.seed) < 0.7:
        lines.append(f"Crawl-delay: {delay}")
    return "\n".join(lines) + "\n"


def gen_seeds(spec: CorpusSpec, n_seeds: int = 50,
              include_bad: bool = True) -> list[str]:
    """Crawl list (FIXTURES.md §2): subset of real page URLs + unknown
    URLs (error path) + malformed (validation path, crawler.ts:191-200)."""
    layout = spec.layout()
    seeds: list[str] = []
    for i in range(n_seeds):
        h = stable_hash64(f"seedh|{i}", spec.seed) % spec.n_hosts
        j = stable_hash64(f"seedj|{i}", spec.seed) % layout[h][1]
        u = spec.page_url(h, j)
        if u not in seeds:
            seeds.append(u)
    if include_bad:
        seeds.append(f"https://{spec.host_name(1)}/does-not-exist/404")
        seeds.append("not a url at all")
        seeds.append("ftp://host-0001.test/unsupported")
    return seeds


# ---------------------------------------------------------------------------
# Writers
# ---------------------------------------------------------------------------

def pages_rows(spec: CorpusSpec):
    for h, j in spec.iter_pages():
        yield gen_page_row(spec, h, j)


def write_corpus_parquet(spec: CorpusSpec, out_dir: str) -> dict[str, str]:
    """Small-scale writer (tests): plain pyarrow, no Spark needed."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(out_dir, exist_ok=True)
    rows = list(pages_rows(spec)) + list(feed_rows(spec))
    pages = pa.Table.from_pylist(rows, schema=pa.schema([
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us", tz="UTC")),
        ("html", pa.binary()),
        ("text", pa.string()),
        ("lang", pa.string()),
    ]))
    paths = {}
    paths["pages"] = os.path.join(out_dir, "pages.parquet")
    pq.write_table(pages, paths["pages"])
    seeds = gen_seeds(spec)
    paths["seeds"] = os.path.join(out_dir, "seeds.parquet")
    pq.write_table(pa.Table.from_pylist(
        [{"seq": i, "url": u} for i, u in enumerate(seeds)],
        schema=pa.schema([("seq", pa.int64()), ("url", pa.string())])),
        paths["seeds"])
    robots_rows = []
    for h in range(spec.n_hosts):
        body = gen_robots_txt(spec, h)
        if body is not None:
            robots_rows.append({"host": spec.host_name(h),
                                "robots_txt": body})
    paths["robots"] = os.path.join(out_dir, "robots.parquet")
    pq.write_table(pa.Table.from_pylist(
        robots_rows, schema=pa.schema([("host", pa.string()),
                                       ("robots_txt", pa.string())])),
        paths["robots"])
    return paths


def write_corpus_spark(spark, spec: CorpusSpec, out_dir: str,
                       partitions: int = 32) -> dict[str, str]:
    """Scale writer (bench): page generation + oracle extraction fan out
    over executors via mapInPandas; the driver never holds the corpus."""
    import pandas as pd
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    coords = [(h, j) for h, j in spec.iter_pages()]
    coord_df = spark.createDataFrame(coords, "h int, j int") \
        .repartition(partitions, F.col("h"), F.col("j"))
    params = {"n_pages": spec.n_pages, "n_hosts": spec.n_hosts,
              "seed": spec.seed, "mega_host_weight": spec.mega_host_weight,
              "private_frac": spec.private_frac,
              "content_scale": spec.content_scale}

    def gen(batches):
        local = CorpusSpec(**params)
        for pdf in batches:
            rows = [gen_page_row(local, int(h), int(j))
                    for h, j in zip(pdf["h"], pdf["j"])]
            yield pd.DataFrame(rows,
                               columns=["url", "warc_ts", "html", "text",
                                        "lang"])

    schema = T.StructType([
        T.StructField("url", T.StringType()),
        T.StructField("warc_ts", T.TimestampType()),
        T.StructField("html", T.BinaryType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
    ])
    pages_path = f"{out_dir}/pages.parquet"
    coord_df.mapInPandas(gen, schema=schema).write.mode("overwrite") \
        .parquet(pages_path)
    feed_df = spark.createDataFrame(
        [(r["url"], r["warc_ts"], r["html"], r["text"], r["lang"])
         for r in feed_rows(spec)], schema)
    feed_df.write.mode("append").parquet(pages_path)
    # seeds + robots are tiny → driver-side
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq
    os.makedirs(out_dir, exist_ok=True)
    seeds = gen_seeds(spec)
    pq.write_table(pa.Table.from_pylist(
        [{"seq": i, "url": u} for i, u in enumerate(seeds)],
        schema=pa.schema([("seq", pa.int64()), ("url", pa.string())])),
        f"{out_dir}/seeds.parquet")
    robots_rows = [
        {"host": spec.host_name(h), "robots_txt": gen_robots_txt(spec, h)}
        for h in range(spec.n_hosts) if gen_robots_txt(spec, h) is not None]
    pq.write_table(pa.Table.from_pylist(
        robots_rows, schema=pa.schema([("host", pa.string()),
                                       ("robots_txt", pa.string())])),
        f"{out_dir}/robots.parquet")
    return {"pages": pages_path, "seeds": f"{out_dir}/seeds.parquet",
            "robots": f"{out_dir}/robots.parquet"}
