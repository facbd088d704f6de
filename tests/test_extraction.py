"""Extraction semantics (U1-U10) + the byte-identity invariant
(SURVEY.md §5.2.1): the vectorized UDF over Spark must equal the pure
oracle bytewise for every row, including adversarial documents."""

from adscraper_spark.corpus import pages_rows
from adscraper_spark.extraction.core import extract_page
from adscraper_spark.extraction.udfs import extract_pages

ADVERSARIAL_DOCS = [
    # (name, url, html)
    ("nested-ads-topmost",
     "https://h.test/a",
     b'<body><div class="ad-container"><div id="AdBanner">inner</div></div>'
     b"</body>"),
    ("ad-inside-cookie-banner",
     "https://h.test/b",
     b'<body><div id="cookie-banner">c<div class="advert">ad</div></div>'
     b"<p>text stays</p></body>"),
    ("iframe-in-iframe",
     "https://h.test/c",
     b'<body><div class="advert"><iframe src="https://x.test/1">'
     b'<html><body><iframe src="https://x.test/2"><p>deep</p></iframe>'
     b"</body></html></iframe></div></body>"),
    ("chumbox-taboola",
     "https://h.test/d",
     b'<body><div class="trc_related_container">'
     b'<div class="trc_spotlight_item syndicatedItem"><a href="/x">1</a></div>'
     b'<div class="trc_spotlight_item syndicatedItem"><a href="/y">2</a></div>'
     b"</div></body>"),
    ("bom-and-entities",
     "https://h.test/e",
     b"\xef\xbb\xbf<body><p>a&nbsp;&amp;&#x41;&#66; b</p></body>"),
    ("rss-header",
     "https://h.test/f",
     b'<head><link rel="alternate" type="application/rss+xml" href="/feed">'
     b'<link rel="alternate" type="application/rss+xml" '
     b'href="/comments/feed"></head><body><a href="/rss-page">rss here</a>'
     b"</body>"),
    ("zero-links", "https://h.test/g", b"<body><p>no links</p></body>"),
    ("div-br-readability",
     "https://h.test/h",
     ("<body><div>" + "sentence one is long enough to matter " * 8
      + "<br><br>" + "more text " * 40 + "</div></body>").encode()),
    ("malformed-nesting",
     "https://h.test/i",
     b"<body><p>a<div>b</p></div><p>c</body>"),
    ("empty", "https://h.test/j", b""),
]


def test_cookie_banner_removed_from_text():
    res = extract_page(*ADVERSARIAL_DOCS[1][1:])
    assert res.text == "text stays"
    # the ad inside the removed banner is gone too (reference removes the
    # banner from the DOM before ad detection runs)
    assert res.ads == []


def test_topmost_ad_dedup():
    res = extract_page(*ADVERSARIAL_DOCS[0][1:])
    assert len(res.ads) == 1
    assert res.ads[0].selector == ".ad-container"
    assert 'id="AdBanner"' in res.ads[0].html


def test_iframe_tree():
    res = extract_page(*ADVERSARIAL_DOCS[2][1:])
    assert len(res.iframes) == 2
    top, inner = res.iframes
    assert top.parent_index == -1 and inner.parent_index == 0
    assert top.ad_index == 0 and inner.ad_index == 0
    assert inner.url == "https://x.test/2"
    assert inner.textcontent == "deep"


def test_chumbox_split():
    res = extract_page(*ADVERSARIAL_DOCS[3][1:])
    assert len(res.ads) == 1
    assert res.ads[0].platform == "taboola"
    assert len(res.ads[0].chumbox_parts) == 2
    # anchor hrefs resolved absolute (reference reads resolved a.href)
    assert res.ads[0].anchor_hrefs == [
        "https://h.test/x", "https://h.test/y"]


def test_rss_filters():
    res = extract_page(*ADVERSARIAL_DOCS[5][1:])
    # 'comments' feed excluded (get-rss-article.ts:27-29); anchor with
    # 'rss' in resolved URL included (get-rss-article.ts:31-33)
    assert res.rss_urls == ["https://h.test/feed", "https://h.test/rss-page"]


def test_entities_and_bom_text():
    res = extract_page(*ADVERSARIAL_DOCS[4][1:])
    assert res.text == "a &AB b"


def test_readability_div_br():
    res = extract_page(*ADVERSARIAL_DOCS[7][1:])
    assert res.readerable is True


def test_health_keyword_predicate():
    assert extract_page("https://h.test/covid-news", b"").health_related
    assert not extract_page("https://h.test/sports", b"").health_related


def test_empty_document():
    res = extract_page(*ADVERSARIAL_DOCS[9][1:])
    assert res.text == "" and res.ads == [] and res.links == []


def test_byte_identity_udf_vs_oracle(spark, corpus_spec):
    """THE invariant: UDF-through-Spark output == oracle, bytewise, for
    every corpus row AND every adversarial doc."""
    rows = [(r["url"], r["html"]) for r in pages_rows(corpus_spec)]
    rows += [(url, html) for _, url, html in ADVERSARIAL_DOCS]
    df = spark.createDataFrame(rows, "url string, html binary")
    got = {r["url"]: r for r in extract_pages(df).collect()}
    assert len(got) == len(dict(rows))
    for url, html in rows:
        oracle = extract_page(url, html)
        g = got[url]
        assert g["text"] == oracle.text, f"text diverged for {url}"
        assert g["links"] == oracle.links, f"links diverged for {url}"
        assert g["n_ads"] == len(oracle.ads)
        assert g["readerable"] == oracle.readerable
        assert [a["html"] for a in g["ads"]] == [a.html for a in oracle.ads]
        assert [(f["ad_index"], f["parent_index"], f["url"], f["textcontent"])
                for f in g["iframes"]] == [
            (f.ad_index, f.parent_index, f.url, f.textcontent)
            for f in oracle.iframes]
        assert g["rss_urls"] == oracle.rss_urls
